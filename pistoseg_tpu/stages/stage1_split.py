"""Stage 1b: cut validation/test WSIs into positioned patch grids.

Rebuilds ``split_validation.ipynb`` (C18): stride-grid crop with
tail-snap over each big image/mask pair at one or more scales, writing
``{out}/img/{idx}_{scale}_{y}_{x}-{label}.png`` (+ matching ``mask/``)
where ``label`` is the per-patch multilabel of foreground classes present
in the gt mask — the filename metadata contract consumed by the stitched
evaluation (``mosaic_module.py:155-158``).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Sequence

import numpy as np
from PIL import Image

from pistoseg_tpu.core.config import Config
from pistoseg_tpu.data.labels import format_label
from pistoseg_tpu.ops.palette import encode_palette_png
from pistoseg_tpu.ops.patches import multiscale_patch_boxes
from pistoseg_tpu.ops.resize import resize_matrix
from pistoseg_tpu.stages.common import parse_cli


def _resize_img(img: np.ndarray, hw) -> np.ndarray:
    h, w = img.shape[:2]
    if (h, w) == tuple(hw):
        return img
    Rh = resize_matrix(h, hw[0], "pil")
    Rw = resize_matrix(w, hw[1], "pil")
    out = np.einsum("oh,hwc,pw->opc", Rh, img.astype(np.float32), Rw, optimize=True)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def _resize_mask_nearest(mask: np.ndarray, hw) -> np.ndarray:
    from pistoseg_tpu.ops.resize import _pil_nearest_indices

    iy = _pil_nearest_indices(mask.shape[0], hw[0])
    ix = _pil_nearest_indices(mask.shape[1], hw[1])
    return mask[np.ix_(iy, ix)]


def split_images(
    cfg: Config,
    input_root: str,         # directory with img/ and mask/
    out_dir: str,
    patch_size: int = 224,
    stride: int = 112,
    scales: Sequence[float] = (1.0,),
) -> Dict:
    profile = cfg.profile
    root = Path(input_root)
    out = Path(out_dir)
    (out / "img").mkdir(parents=True, exist_ok=True)
    (out / "mask").mkdir(parents=True, exist_ok=True)

    n_patches = 0
    for img_path in sorted((root / "img").glob("*.png")):
        idx = img_path.stem
        image = np.asarray(Image.open(img_path).convert("RGB"), np.uint8)
        mask = np.asarray(Image.open(root / "mask" / img_path.name), np.uint8)
        h, w = image.shape[:2]
        for scale, sh, sw, boxes in multiscale_patch_boxes(h, w, patch_size, stride, scales):
            img_s = _resize_img(image, (sh, sw)) if scale != 1.0 else image
            mask_s = _resize_mask_nearest(mask, (sh, sw)) if scale != 1.0 else mask
            for (y, x) in boxes:
                pi = img_s[y : y + patch_size, x : x + patch_size]
                pm = mask_s[y : y + patch_size, x : x + patch_size]
                label = [
                    1 if np.any(pm == c) else 0 for c in range(profile.num_classes)
                ]
                stem = f"{idx}_{scale}_{y}_{x}-{format_label(label, profile.label_grammar)}"
                Image.fromarray(pi).save(out / "img" / f"{stem}.png")
                encode_palette_png(pm, profile.palette, out / "mask" / f"{stem}.png")
                n_patches += 1
    return {"patches": n_patches, "out_dir": str(out)}


def main(argv=None):
    cfg, extras = parse_cli(argv)
    scales = tuple(
        float(s) for s in extras.get("scales", "1.0").split(",")
    )
    return split_images(
        cfg,
        input_root=extras["input_root"],
        out_dir=extras["out_dir"],
        patch_size=int(extras.get("patch_size", 224)),
        stride=int(extras.get("stride", 112)),
        scales=scales,
    )


if __name__ == "__main__":
    main()
