"""Patch-grid geometry: stride cropping with tail-snap, multi-scale grids.

Reimplements the semantics of ``online_cut_patches`` /
``multiscale_online_crop`` (``OEEM/classification/utils/pyutils.py:14-113``,
copied into ``split_validation.ipynb``): a regular stride grid over (H, W),
with a final row/column snapped to the image edge whenever the size does
not divide evenly — so every pixel is covered and patches never exceed the
image.  Pure geometry on host; the crops themselves are taken on device
(or by the data pipeline) from the returned boxes, which keeps shapes
static under ``jit``.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

Box = Tuple[int, int]  # (y, x) top-left; size is implicit


def _axis_positions(size: int, patch: int, stride: int) -> List[int]:
    if size <= patch:
        return [0]
    pos = list(range(0, size - patch + 1, stride))
    # tail-snap: cover the ragged remainder with an edge-aligned patch
    if (size - patch) % stride != 0:
        pos.append(size - patch)
    return pos


def cut_patch_boxes(h: int, w: int, patch: int, stride: int) -> List[Box]:
    """All (y, x) crop origins for a ``patch``² grid at ``stride``."""
    return [
        (y, x)
        for y in _axis_positions(h, patch, stride)
        for x in _axis_positions(w, patch, stride)
    ]


def multiscale_patch_boxes(
    h: int, w: int, patch: int, stride: int, scales: Sequence[float]
) -> List[Tuple[float, int, int, List[Box]]]:
    """Per scale: (scale, scaled_h, scaled_w, boxes on the scaled image).

    Scaled sizes use ``int(size * scale)`` truncation, matching
    ``multiscale_online_crop``'s ``cv2.resize`` size computation.
    """
    out = []
    for s in scales:
        sh, sw = int(h * s), int(w * s)
        out.append((s, sh, sw, cut_patch_boxes(sh, sw, patch, stride)))
    return out
