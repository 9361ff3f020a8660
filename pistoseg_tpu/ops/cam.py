"""CAM canvas math: multi-scale sliding-window class-activation ensembling.

Rebuilds the canvas accumulation of ``generate_validation_cam``
(``OEEM/classification/utils/generate_CAM.py:13-102``) and the training
CAM exporter (``prepare_seg_inputs.py:80-138``): per scale, forward every
crop, bilinear-resize the crop CAM to crop size, accumulate into
sum/count canvases, normalize (sum/count, then per-image min-max), resize
to native size, sum over scales, and finally (for the stage-4 contract)
bilinear-downsample to 32×32.

TPU-first (VERDICT r4 #7): the ENTIRE per-slide canvas pipeline — crop
CAM overlap-add (:func:`pistoseg_tpu.ops.stitch.stitch_canvas`), the
count-average, the per-class min-max normalize, the native-size resize
and the cross-scale ensemble — runs on device; the functions below take
and return device arrays, and callers fetch only the final artifact
(4 KB per patch instead of ~100 MB of crop-CAM round trips).

Bit-compatibility note: these are value-exact ports of the previous
host-numpy implementations — elementwise IEEE ops are identical between
numpy and XLA, min/max reductions are order-independent, and the
ensemble preserves the original left-to-right addition order — so the
full-chain artifact goldens (tests/goldens/) are unchanged.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pistoseg_tpu.ops.resize import resize
from pistoseg_tpu.ops.stitch import stitch_canvas


def accumulate_scale_cam(
    crop_cams: jnp.ndarray,   # (N, p, p, C) per-crop CAM already at crop size
    ys: jnp.ndarray,
    xs: jnp.ndarray,
    valid: jnp.ndarray,
    canvas_hw: Tuple[int, int],
) -> jnp.ndarray:
    """Overlap-add one scale's crops → averaged canvas (H, W, C), on device."""
    value, count = stitch_canvas(crop_cams, ys, xs, valid, *canvas_hw)
    return _canvas_average(value, count)


@jax.jit
def _canvas_average(value: jnp.ndarray, count: jnp.ndarray) -> jnp.ndarray:
    return value / jnp.maximum(count, 1e-12)


@jax.jit
def normalize_cam(canvas: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-class min-max normalization over the full canvas
    (reference ``generate_CAM.py`` canvas normalize), on device."""
    mn = canvas.min(axis=(0, 1), keepdims=True)
    mx = canvas.max(axis=(0, 1), keepdims=True)
    return (canvas - mn) / jnp.maximum(mx - mn, eps)


def ensemble_scales(
    scale_canvases: Sequence[jnp.ndarray],  # each (h_s, w_s, C), normalized
    native_hw: Tuple[int, int],
) -> jnp.ndarray:
    """Resize each scale canvas to native size and average, on device.

    The /len(scales) here IS the exporter's division
    (``prepare_seg_inputs.py:134``) — callers must not divide again.
    Additions run left-to-right from a zero canvas (the numpy ``+=``
    ordering) so results are bit-identical to the host version."""
    c = scale_canvases[0].shape[-1]
    acc = jnp.zeros(tuple(native_hw) + (c,), jnp.float32)
    for sc in scale_canvases:
        acc = _ens_add(acc, jnp.asarray(sc, jnp.float32), tuple(native_hw))
    return acc / len(scale_canvases)


@partial(jax.jit, static_argnames=("native_hw",))
def _ens_add(acc, canvas, native_hw):
    return acc + resize(canvas, native_hw, "linear")


def cam_to_artifact(cam_native: np.ndarray, size: int = 32) -> np.ndarray:
    """Downsample the ensembled CAM to the stage-4 [C, 32, 32] contract
    (``prepare_seg_inputs.py:137-138``)."""
    small = np.asarray(resize(jnp.asarray(cam_native, jnp.float32), (size, size), "linear"))
    return np.ascontiguousarray(small.transpose(2, 0, 1))


def join_crops_back(
    cropped_dir: str,
    origin_dir: str,
    side_length: int,
    stride: int,
    palette: Sequence[int],
) -> int:
    """Merge per-crop prediction ``.npy`` files back to full-image palette
    PNGs (GlaS utility, ``pyutils.py:150-197``): crops named
    ``{*}_{image}_{index}-*.npy`` in ``online_cut_patches`` order are
    overlap-added, count-normalized, rounded, and written as
    ``{image}.png``; the crop files are removed."""
    import os
    from pathlib import Path

    from PIL import Image

    from pistoseg_tpu.ops.palette import encode_palette_png
    from pistoseg_tpu.ops.patches import cut_patch_boxes

    cropped = Path(cropped_dir)
    by_image: dict = {}
    crop_files = [p for p in cropped.iterdir() if p.suffix == ".npy"]
    for p in crop_files:
        parts = p.name.split("_")
        image_id = parts[1]
        index = int(parts[2].split("-")[0])
        by_image.setdefault(image_id, {})[index] = p

    n_done = 0
    for origin in sorted(Path(origin_dir).iterdir()):
        image_id = origin.stem.split("_")[-1]
        if image_id not in by_image:
            continue
        with Image.open(origin) as im:
            w, h = im.size
        boxes = cut_patch_boxes(h, w, side_length, stride)
        value = np.zeros((h, w), np.float64)
        count = np.zeros((h, w), np.float64)
        for i, (y, x) in enumerate(boxes):
            crop = np.load(by_image[image_id][i], allow_pickle=True)
            value[y : y + side_length, x : x + side_length] += crop
            count[y : y + side_length, x : x + side_length] += 1
        merged = np.rint(value / np.maximum(count, 1)).astype(np.uint8)
        encode_palette_png(merged, palette, cropped / f"{origin.stem}.png")
        n_done += 1
    for p in crop_files:
        os.remove(p)
    return n_done


def cam_argmax_with_label_mask(
    cam: np.ndarray,            # (H, W, C) class scores
    label: Optional[np.ndarray] = None,  # (C,) image-level multilabel
) -> np.ndarray:
    """Label-constrained argmax (OEEM class elimination,
    ``generate_CAM.py`` label masking): classes absent from the image
    label cannot win."""
    if label is not None:
        cam = np.where(label[None, None, :] > 0, cam, -np.inf)
    return cam.argmax(-1).astype(np.uint8)
