"""Host-side datasets (decode + static-shape collate; augment runs on device).

Rebuilds the capability of the reference's 6 dataset classes
(``dataset.py``, SURVEY.md C2) and the stage-4 RefineDataset
(``revise_pseudo_labels.py:35-70``), re-partitioned TPU-first: the host
only decodes PNGs, pads to static shapes, and parses metadata; all
geometric augmentation + normalization runs batched on device
(``ops/augment.py``) inside the training jit.

Artifact-contract notes: stage-3 32×32 logits are stored as ``.npy``
(reference used torch ``.pt``, ``infer_pseudo_masks.py:126-127``); a
``.pt`` reader is provided for interop when torch is importable.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np
from PIL import Image

from pistoseg_tpu.core.config import DatasetProfile
from pistoseg_tpu.data.labels import parse_label, parse_patch_name
from pistoseg_tpu.ops.background import extract_background
from pistoseg_tpu.ops.resize import resize_matrix


def load_image(path) -> np.ndarray:
    with Image.open(path) as im:
        return np.array(im.convert("RGB"), dtype=np.uint8)


def load_mask(path) -> np.ndarray:
    with Image.open(path) as im:
        return np.array(im, dtype=np.uint8)


def _resize_np(img: np.ndarray, out_hw: Tuple[int, int], method: str) -> np.ndarray:
    """Host resize via the same deterministic matrices as the device path."""
    h, w = img.shape[:2]
    if (h, w) == tuple(out_hw):
        return img.astype(np.float32)
    Rh = resize_matrix(h, out_hw[0], method)
    Rw = resize_matrix(w, out_hw[1], method)
    x = img.astype(np.float32)
    if x.ndim == 2:
        return Rh @ x @ Rw.T
    return np.einsum("oh,hwc,pw->opc", Rh, x, Rw, optimize=True)


def pad_to_size_reflect(img: np.ndarray, size: int) -> Tuple[np.ndarray, int, int]:
    """PadIfNeeded(border_mode=reflect, TOP_LEFT): image at origin, pad
    bottom/right (``dataset.py:277-279``).  Returns (padded, orig_h, orig_w)."""
    h, w = img.shape[:2]
    ph, pw = max(size - h, 0), max(size - w, 0)
    if ph == 0 and pw == 0:
        return img, h, w
    pad_width = [(0, ph), (0, pw)] + [(0, 0)] * (img.ndim - 2)
    return np.pad(img, pad_width, mode="reflect"), h, w


class ArrayDataset:
    """Minimal map-style dataset protocol: __len__ + __getitem__ → dict."""

    def __len__(self) -> int:  # pragma: no cover - abstract
        raise NotImplementedError

    def __getitem__(self, i: int) -> Dict:  # pragma: no cover - abstract
        raise NotImplementedError


class MosaicDataset(ArrayDataset):
    """Stage-2 training pairs from the synthesized mosaic set
    (reference ``MosaicDataset``, ``dataset.py:35-65``).  Returns raw uint8
    image + index mask; augmentation happens on device."""

    def __init__(self, mosaic_dir: str | Path):
        self.root = Path(mosaic_dir)
        self.images = sorted((self.root / "img").glob("*.png"))
        if not self.images:
            raise FileNotFoundError(f"no mosaics under {self.root}/img")

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        p = self.images[i]
        return {
            "image": load_image(p),
            "mask": load_mask(self.root / "mask" / p.name),
            "name": p.name,
        }


class PatchInferenceDataset(ArrayDataset):
    """Stage-3 inference over real training patches (reference
    ``TrainDataset``, ``dataset.py:67-109``): image resized to patch²,
    plus a tissue mask channel (0 = background, 127 = tissue) from the
    gray>200 extraction for WSSS4LUAD; all-tissue for BCSS."""

    def __init__(self, train_dir: str | Path, profile: DatasetProfile, patch_size: int = 224):
        self.paths = sorted(Path(train_dir).glob("*.png"))
        if not self.paths:
            raise FileNotFoundError(f"no patches under {train_dir}")
        self.profile = profile
        self.patch_size = patch_size

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        p = self.paths[i]
        image = load_image(p)
        h, w = image.shape[:2]
        if self.profile.has_background_channel:
            bg = extract_background(image)
            tissue = np.where(bg == 255, 0, 127).astype(np.uint8)
        else:
            tissue = np.full((h, w), 127, np.uint8)
        s = self.patch_size
        image_r = _resize_np(image, (s, s), "linear")
        tissue_r = _resize_np(tissue, (s, s), "nearest").astype(np.uint8)
        label = parse_label(p, self.profile.label_grammar)
        return {
            "image": image_r.astype(np.float32),
            "tissue": tissue_r,
            "label": np.asarray(label, np.float32),
            "name": p.name,
            "orig_hw": np.asarray([h, w], np.int32),
        }


class PseudoTrainDataset(ArrayDataset):
    """Stage-5 training on real images + refined masks (reference
    ``PseudoTrainDataset``, ``dataset.py:112-193``), with optional CutMix
    (host-side memcpy; geometry augs stay on device)."""

    def __init__(
        self,
        train_dir: str | Path,
        mask_dir: str | Path,
        profile: DatasetProfile,
        patch_size: int = 224,
        cutmix_prob: float = 0.0,
        seed: int = 42,
    ):
        self.train_dir = Path(train_dir)
        self.mask_dir = Path(mask_dir)
        self.masks = sorted(self.mask_dir.glob("*.png"))
        if not self.masks:
            raise FileNotFoundError(f"no masks under {mask_dir}")
        self.profile = profile
        self.patch_size = patch_size
        self.cutmix_prob = cutmix_prob
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.masks)

    def _load_pair(self, mask_path: Path):
        image = load_image(self.train_dir / mask_path.name)
        mask = load_mask(mask_path)
        label = np.asarray(parse_label(mask_path, self.profile.label_grammar), np.float32)
        return image, mask, label

    def __getitem__(self, i):
        image, mask, label = self._load_pair(self.masks[i])
        if self.cutmix_prob > 0 and self.rng.rand() < self.cutmix_prob:
            j = self.rng.randint(len(self.masks))
            mix_img, mix_mask, mix_label = self._load_pair(self.masks[j])
            lam = self.rng.beta(1.0, 1.0)
            H = min(image.shape[0], mix_img.shape[0])
            W = min(image.shape[1], mix_img.shape[1])
            y1, y2, x1, x2 = _cutmix_bbox(self.rng, W, H, lam)
            image[y1:y2, x1:x2] = mix_img[y1:y2, x1:x2]
            mask[y1:y2, x1:x2] = mix_mask[y1:y2, x1:x2]
            label = lam * label + (1 - lam) * mix_label
        s = self.patch_size
        image = _resize_np(image, (s, s), "linear").astype(np.float32)
        mask = _resize_np(mask.astype(np.float32), (s, s), "nearest").astype(np.uint8)
        return {"image": image, "mask": mask, "label": label, "name": self.masks[i].name}


def _cutmix_bbox(rng: np.random.RandomState, W: int, H: int, lam: float):
    """CutMix box (reference ``_get_cutmix_bbox``, ``dataset.py:177-190``)."""
    cut_rat = np.sqrt(1.0 - lam)
    cut_w, cut_h = int(W * cut_rat), int(H * cut_rat)
    cx = rng.randint(H)
    cy = rng.randint(W)
    y1 = np.clip(cx - cut_h // 2, 0, H)
    y2 = np.clip(cx + cut_h // 2, 0, H)
    x1 = np.clip(cy - cut_w // 2, 0, W)
    x2 = np.clip(cy + cut_w // 2, 0, W)
    return y1, y2, x1, x2


class CutMixDataset(ArrayDataset):
    """Alternative single-label CutMix synthesis (reference
    ``CutMixDataset``, ``dataset.py:196-270``): single-label patches get a
    constant mask (+ background), mixed with a patch of a different class."""

    def __init__(
        self,
        train_dir: str | Path,
        profile: DatasetProfile,
        patch_size: int = 224,
        cutmix_prob: float = 0.8,
        seed: int = 42,
    ):
        self.profile = profile
        self.patch_size = patch_size
        self.cutmix_prob = cutmix_prob
        self.rng = np.random.RandomState(seed)
        self.by_class: Dict[int, List[Path]] = {}
        self.paths: List[Path] = []
        for p in sorted(Path(train_dir).glob("*.png")):
            label = parse_label(p, profile.label_grammar)
            if sum(label) == 1:
                cls = label.index(1)
                self.by_class.setdefault(cls, []).append(p)
                self.paths.append(p)
        if not self.paths:
            raise FileNotFoundError(f"no single-label patches under {train_dir}")

    def __len__(self):
        return len(self.paths)

    def _load(self, p: Path):
        s = self.patch_size
        image = np.array(
            Image.open(p).convert("RGB").resize((s, s), Image.BICUBIC), np.uint8
        )
        label = parse_label(p, self.profile.label_grammar)
        mask = np.full((s, s), label.index(1), np.uint8)
        if self.profile.has_background_channel:
            bg = extract_background(image)
            mask[bg == 255] = self.profile.bg_class
        return image, mask, np.asarray(label, np.float32)

    def __getitem__(self, i):
        image, mask, label = self._load(self.paths[i])
        if self.rng.rand() < self.cutmix_prob:
            cls = int(np.argmax(label))
            others = [p for c, ps in self.by_class.items() if c != cls for p in ps]
            if others:
                mix_img, mix_mask, mix_label = self._load(others[self.rng.randint(len(others))])
                lam = self.rng.beta(1.0, 1.0)
                s = self.patch_size
                y1, y2, x1, x2 = _cutmix_bbox(self.rng, s, s, lam)
                image[y1:y2, x1:x2] = mix_img[y1:y2, x1:x2]
                mask[y1:y2, x1:x2] = mix_mask[y1:y2, x1:x2]
                lam = 1 - ((y2 - y1) * (x2 - x1) / (s * s))
                label = label * lam + mix_label * (1 - lam)
        return {"image": image.astype(np.float32), "mask": mask, "label": label,
                "name": self.paths[i].name}


class OneLabelDataset(CutMixDataset):
    """Single-label patches as (image, constant-class mask) pairs without
    mixing — the reference's ``OneLabelDataset`` alternative synthesis
    (``create_dataset.ipynb`` cell 10).  Equivalent to
    :class:`CutMixDataset` with the mix disabled."""

    def __init__(self, train_dir, profile, patch_size: int = 224, seed: int = 42):
        super().__init__(train_dir, profile, patch_size, cutmix_prob=0.0, seed=seed)


class EvalPatchDataset(ArrayDataset):
    """Validation/test patches with gt masks (reference
    ``ValidationDataset``/``TestDataset``, ``dataset.py:272-325``):
    pad-to-patch-size (reflect, top-left), keep original size + position
    metadata parsed from the filename."""

    def __init__(self, data_dir: str | Path, patch_size: int = 224):
        self.root = Path(data_dir)
        self.images = sorted((self.root / "img").glob("*.png"))
        if not self.images:
            raise FileNotFoundError(f"no eval patches under {self.root}/img")
        self.patch_size = patch_size

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        p = self.images[i]
        image = load_image(p)
        mask = load_mask(self.root / "mask" / p.name)
        image, h, w = pad_to_size_reflect(image, self.patch_size)
        mask, _, _ = pad_to_size_reflect(mask, self.patch_size)
        item = {
            "image": image.astype(np.float32),
            "mask": mask,
            "name": p.name,
            "orig_hw": np.asarray([h, w], np.int32),
        }
        try:
            idx, scale, y, x = parse_patch_name(p.name)
            item.update(slide=idx, scale=scale, pos=np.asarray([y, x], np.int32))
        except ValueError:
            pass
        return item


class RefineDataset(ArrayDataset):
    """Stage-4 training triplets (reference ``RefineDataset``,
    ``revise_pseudo_labels.py:35-70``): image resized to ``size``²,
    32×32 pseudo-mask logits, 32×32 CAM, and the filename label."""

    def __init__(
        self,
        train_dir: str | Path,
        pmask_dir: str | Path,
        cam_dir: str | Path,
        profile: DatasetProfile,
        size: int = 224,
    ):
        self.train_dir = Path(train_dir)
        self.pmask_dir = Path(pmask_dir)
        self.cam_dir = Path(cam_dir)
        self.profile = profile
        self.size = size
        self.paths = sorted(self.train_dir.glob("*.png"))
        if not self.paths:
            raise FileNotFoundError(f"no training patches under {train_dir}")

    def __len__(self):
        return len(self.paths)

    @staticmethod
    def _load_logits(base: Path, stem: str) -> np.ndarray:
        npy = base / f"{stem}.npy"
        if npy.exists():
            arr = np.load(npy)
        else:
            import torch  # interop with reference-produced .pt artifacts

            arr = torch.load(base / f"{stem}.pt", map_location="cpu").numpy()
        # stored [C, 32, 32] (reference contract) → NHWC
        return np.ascontiguousarray(arr.transpose(1, 2, 0)).astype(np.float32)

    def __getitem__(self, i):
        p = self.paths[i]
        stem = p.stem
        image = _resize_np(load_image(p), (self.size, self.size), "linear")
        pmask = self._load_logits(self.pmask_dir, stem)
        cam = self._load_logits(self.cam_dir, stem)
        label = np.asarray(parse_label(p, self.profile.label_grammar), np.float32)
        return {
            "image": image.astype(np.float32),
            "pmask": pmask,
            "cam": cam,
            "label": label,
            "name": p.name,
        }
