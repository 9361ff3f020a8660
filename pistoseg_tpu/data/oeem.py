"""Stage-0 (OEEM classification) datasets.

Rebuilds ``OEEM/classification/dataset.py:22-87`` (SURVEY.md C20):

* :class:`OriginPatchesDataset` — training patches + multilabel vector
  parsed from the filename.
* :class:`CropListDataset` — per-image multiscale crop lists with
  positions (reference ``TrainingSetCAM`` / ``OfflineDataset``), produced
  from the patch geometry in :mod:`pistoseg_tpu.ops.patches` so crops are
  static-shape device batches.
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import numpy as np

from pistoseg_tpu.core.config import DatasetProfile
from pistoseg_tpu.data.datasets import ArrayDataset, load_image, _resize_np
from pistoseg_tpu.data.labels import parse_label
from pistoseg_tpu.ops.patches import multiscale_patch_boxes


class OriginPatchesDataset(ArrayDataset):
    """Training patches for the multilabel classifier."""

    def __init__(self, train_dir: str | Path, profile: DatasetProfile):
        self.paths = sorted(Path(train_dir).glob("*.png"))
        if not self.paths:
            raise FileNotFoundError(f"no patches under {train_dir}")
        self.profile = profile

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        p = self.paths[i]
        return {
            "image": load_image(p),
            "label": np.asarray(parse_label(p, self.profile.label_grammar), np.float32),
            "name": p.name,
        }


def cache_validation_crops(
    image_dir: str | Path,
    out_dir: str | Path,
    profile: DatasetProfile,
    patch_size: int = 224,
    stride: int = 224,
) -> int:
    """One-time crop cache for validation images (reference
    ``crop_validation_images``, ``pyutils.py:115-147``): writes each crop
    as ``{stem}_{index}_{y}_{x}.png`` under ``out_dir``."""
    from PIL import Image

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    n = 0
    for p in sorted(Path(image_dir).glob("*.png")):
        image = load_image(p)
        h, w = image.shape[:2]
        from pistoseg_tpu.ops.patches import cut_patch_boxes

        for i, (y, x) in enumerate(cut_patch_boxes(h, w, patch_size, stride)):
            crop = image[y : y + patch_size, x : x + patch_size]
            Image.fromarray(crop).save(out / f"{p.stem}_{i}_{y}_{x}.png")
            n += 1
    return n


class CropListDataset(ArrayDataset):
    """Per-slide multiscale crops with positions for CAM generation.

    Each item = one slide: crops stacked (N, p, p, 3) float32 per scale,
    with (ys, xs) and scaled canvas sizes — the geometry contract of
    ``multiscale_online_crop`` (``pyutils.py:66-113``).
    """

    def __init__(
        self,
        image_dir: str | Path,
        profile: DatasetProfile,
        patch_size: int = 224,
        stride: int = 224,
        scales: Sequence[float] = (1.0,),
        glob: str = "*.png",
        materialize_crops: bool = True,
    ):
        self.paths = sorted(Path(image_dir).glob(glob))
        if not self.paths:
            raise FileNotFoundError(f"no images under {image_dir}")
        self.profile = profile
        self.patch_size = patch_size
        self.stride = stride
        self.scales = tuple(scales)
        # materialize_crops=False skips the host np.stack of overlapping
        # windows: items then carry only the padded scaled image per scale
        # ("scaled") and the window extraction happens ON DEVICE in
        # generate_cams_for_split (VERDICT r4 #7) — the upload per image
        # drops from ~(patch/stride)²× the pixels to 1× (stride 56/crop 224
        # overlaps every pixel ~16 times)
        self.materialize_crops = materialize_crops

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        p = self.paths[i]
        image = load_image(p)
        h, w = image.shape[:2]
        per_scale = []
        for scale, sh, sw, boxes in multiscale_patch_boxes(
            h, w, self.patch_size, self.stride, self.scales
        ):
            scaled = _resize_np(image, (sh, sw), "linear")
            # images smaller than the patch: pad bottom/right with reflect
            ph, pw = max(self.patch_size - sh, 0), max(self.patch_size - sw, 0)
            if ph or pw:
                scaled = np.pad(scaled, ((0, ph), (0, pw), (0, 0)), mode="reflect")
            s = self.patch_size
            entry = {
                "scale": scale,
                # == scaled.shape[:2] after the reflect pad above
                "canvas_hw": (max(sh, s), max(sw, s)),
                "scaled": scaled.astype(np.float32),
                "ys": np.asarray([b[0] for b in boxes], np.int32),
                "xs": np.asarray([b[1] for b in boxes], np.int32),
            }
            if self.materialize_crops:
                entry["crops"] = np.stack(
                    [scaled[y : y + s, x : x + s] for (y, x) in boxes]
                ).astype(np.float32)
            per_scale.append(entry)
        try:
            label = np.asarray(parse_label(p, self.profile.label_grammar), np.float32)
        except ValueError:
            label = None
        return {
            "name": p.name,
            "stem": p.stem,
            "native_hw": (h, w),
            "scales": per_scale,
            "label": label,
        }
