"""Overlap-add canvas stitching for multi-scale big-mask evaluation.

The reference stitches patch softmaxes into per-(image, scale) numpy
canvases on the host, normalizes by a hit-count canvas, bilinearly resizes
each scale canvas to native size, and averages across scales
(``mosaic_module.py:137-199``, ``segmentation_test.py:160-199``,
``generate_CAM.py:76-87``).  That host loop is a major bottleneck —
GPU→CPU sync per patch.

TPU-first version: patches of one slide are the "sequence" dimension
(SURVEY.md §5.7).  ``stitch_canvas`` runs fully on device under ``jit``
with static shapes: a ``lax.scan`` over patches doing
``dynamic_slice → add → dynamic_update_slice`` on both a value canvas and a
count canvas.  Slides are bucketed by padded canvas size by the caller
(``CanvasStitcher``) to avoid recompilation storms.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pistoseg_tpu.ops.resize import resize


@partial(jax.jit, static_argnames=("canvas_h", "canvas_w"))
def stitch_canvas(
    patches: jnp.ndarray,  # (N, P, P, C) patch probabilities
    ys: jnp.ndarray,       # (N,) int32 top coordinates
    xs: jnp.ndarray,       # (N,) int32 left coordinates
    valid: jnp.ndarray,    # (N,) bool — padding patches contribute nothing
    canvas_h: int,
    canvas_w: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Overlap-add on device.  Returns (value_canvas, count_canvas)."""
    n, p, _, c = patches.shape
    value = jnp.zeros((canvas_h, canvas_w, c), jnp.float32)
    count = jnp.zeros((canvas_h, canvas_w, 1), jnp.float32)

    def body(carry, inp):
        value, count = carry
        patch, y, x, ok = inp
        w = jnp.where(ok, 1.0, 0.0)
        vs = jax.lax.dynamic_slice(value, (y, x, 0), (p, p, c))
        value = jax.lax.dynamic_update_slice(value, vs + patch * w, (y, x, 0))
        cs = jax.lax.dynamic_slice(count, (y, x, 0), (p, p, 1))
        count = jax.lax.dynamic_update_slice(count, cs + w, (y, x, 0))
        return (value, count), None

    (value, count), _ = jax.lax.scan(
        body, (value, count), (patches.astype(jnp.float32), ys, xs, valid)
    )
    return value, count


class CanvasStitcher:
    """Accumulates per-patch probabilities into multi-scale big masks.

    Reproduces the reference's exact ordering (``mosaic_module.py:171-199``):
    per-scale average (sum / count) → bilinear resize (half-pixel, torch
    default) to native size → average over scales.  State lives on host as
    numpy (one canvas pair per (slide, scale)); the overlap-add itself runs
    on device in slide-sized chunks via :func:`stitch_canvas`.
    """

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self._value: Dict[str, np.ndarray] = {}
        self._count: Dict[str, np.ndarray] = {}
        self._native: Dict[str, Tuple[int, int]] = {}
        self._scales: Dict[str, set] = {}

    @staticmethod
    def _key(slide: str, scale: float) -> str:
        return f"{slide}_{scale}"

    def add(
        self,
        slide: str,
        scale: float,
        native_hw: Tuple[int, int],
        probs: np.ndarray,   # (P, P, C) or cropped (h, w, C)
        y: int,
        x: int,
    ) -> None:
        h0, w0 = native_hw
        sh, sw = int(h0 * scale), int(w0 * scale)
        k = self._key(slide, scale)
        if k not in self._value:
            self._value[k] = np.zeros((sh, sw, self.num_classes), np.float32)
            self._count[k] = np.zeros((sh, sw, 1), np.float32)
        ph, pw = probs.shape[:2]
        self._value[k][y : y + ph, x : x + pw] += probs
        self._count[k][y : y + ph, x : x + pw] += 1.0
        self._native[slide] = native_hw
        self._scales.setdefault(slide, set()).add(scale)

    def add_batch(
        self,
        slides: Sequence[str],
        scales: Sequence[float],
        native_hws: Sequence[Tuple[int, int]],
        probs: np.ndarray,   # (N, P, P, C)
        ys: Sequence[int],
        xs: Sequence[int],
        crop_hws: Sequence[Tuple[int, int]] | None = None,
    ) -> None:
        """Batch add; ``crop_hws`` trims padded patches back to their true
        extent before accumulation (reference crops ``[:orig_h, :orig_w]``)."""
        for i, slide in enumerate(slides):
            p = probs[i]
            if crop_hws is not None:
                ch, cw = crop_hws[i]
                p = p[:ch, :cw]
            self.add(slide, scales[i], native_hws[i], p, ys[i], xs[i])

    def slides(self) -> List[str]:
        return sorted(self._native.keys())

    def finalize(self, slide: str) -> np.ndarray:
        """Cross-scale averaged probability map at native size (H, W, C)."""
        h, w = self._native[slide]
        acc = np.zeros((h, w, self.num_classes), np.float32)
        scales = sorted(self._scales[slide])
        for s in scales:
            k = self._key(slide, s)
            canvas = self._value[k] / np.maximum(self._count[k], 1e-12)
            canvas = np.asarray(resize(jnp.asarray(canvas), (h, w), method="linear"))
            acc += canvas
        return acc / len(scales)

    def finalize_argmax(self, slide: str) -> np.ndarray:
        return np.argmax(self.finalize(slide), axis=-1).astype(np.uint8)

    def reset(self) -> None:
        self._value.clear()
        self._count.clear()
        self._native.clear()
        self._scales.clear()
