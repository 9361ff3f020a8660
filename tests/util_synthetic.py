"""Synthetic tiny-dataset builders for pipeline tests.

Generates the reference's on-disk layout (SURVEY.md Appendix B) with
procedurally drawn tissue blobs: single-label training patches with
filename labels, big validation/test images + palette masks, 32×32 CAM /
pseudo-logit artifacts.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image

from pistoseg_tpu.core.config import DATASET_PROFILES
from pistoseg_tpu.data.labels import format_label
from pistoseg_tpu.ops.palette import encode_palette_png

# tissue-ish colors per class (distinct, non-white so background stays clean)
_CLASS_COLORS = np.array(
    [[150, 60, 120], [60, 150, 90], [90, 90, 180], [170, 120, 50]], np.uint8
)


def _patch_for_class(rng, cls: int, size: int) -> np.ndarray:
    base = _CLASS_COLORS[cls][None, None, :].astype(np.int16)
    noise = rng.randint(-25, 25, size=(size, size, 3))
    return np.clip(base + noise, 0, 200).astype(np.uint8)


def make_training_patches(
    root: Path, dataset: str = "wsss4luad", n_per_class: int = 4, size: int = 64,
    seed: int = 0, multilabel_frac: float = 0.0,
):
    """Single-label (and optionally multilabel) training patches."""
    profile = DATASET_PROFILES[dataset]
    rng = np.random.RandomState(seed)
    root.mkdir(parents=True, exist_ok=True)
    paths = []
    for cls in range(profile.num_classes):
        for k in range(n_per_class):
            img = _patch_for_class(rng, cls, size)
            label = [0] * profile.num_classes
            label[cls] = 1
            name = f"p{cls}{k}-{format_label(label, profile.label_grammar)}.png" \
                if profile.label_grammar == "bracket-list" \
                else f"p{cls}{k}{format_label(label, profile.label_grammar)}.png"
            Image.fromarray(img).save(root / name)
            paths.append(root / name)
    return paths


def make_big_eval_set(
    root: Path, dataset: str = "wsss4luad", n_images: int = 2, size: int = 96,
    seed: int = 1,
):
    """Big images + palette masks under {root}/img, {root}/mask."""
    profile = DATASET_PROFILES[dataset]
    rng = np.random.RandomState(seed)
    (root / "img").mkdir(parents=True, exist_ok=True)
    (root / "mask").mkdir(parents=True, exist_ok=True)
    for i in range(n_images):
        mask = rng.randint(0, profile.num_classes, size=(size, size)).astype(np.uint8)
        # coarse blobs: upscale a small class grid
        small = rng.randint(0, profile.num_classes, size=(4, 4)).astype(np.uint8)
        mask = np.kron(small, np.ones((size // 4, size // 4), np.uint8))
        img = _CLASS_COLORS[mask].copy()
        # a white background corner for WSSS4LUAD
        if profile.has_background_channel:
            mask[:8, :8] = profile.bg_class
            img[:8, :8] = 255
        Image.fromarray(img).save(root / "img" / f"{i}.png")
        encode_palette_png(mask, profile.palette, root / "mask" / f"{i}.png")
    return root


def make_stage4_artifacts(
    patch_dir: Path, pmask_dir: Path, cam_dir: Path, dataset: str = "wsss4luad",
    seed: int = 2,
):
    """32×32 [C, 32, 32] .npy logits/CAMs for every patch in patch_dir."""
    profile = DATASET_PROFILES[dataset]
    rng = np.random.RandomState(seed)
    pmask_dir.mkdir(parents=True, exist_ok=True)
    cam_dir.mkdir(parents=True, exist_ok=True)
    for p in sorted(patch_dir.glob("*.png")):
        c = profile.num_classes
        np.save(pmask_dir / f"{p.stem}.npy", rng.rand(c, 32, 32).astype(np.float32))
        np.save(cam_dir / f"{p.stem}.npy", rng.rand(c, 32, 32).astype(np.float32))
