"""Stage-1 mosaic dataset synthesis (offline, host-side).

Rebuilds ``create_dataset.ipynb`` / ``create_dataset_bcss.ipynb`` cell 9
(``CropAndConcatDataset``): per output index, deterministically seeded
(seed + seed·i), synthesize four grid images of ``patch_num``² randomly
cropped single-label tiles (tile rejected while ≥80% of the crop is
background), then compose a quadrant mosaic at a random even split
h, w ∈ [0.2, 0.8]·H with Flip/ShiftScaleRotate/RandomCrop (p=0.8) per
quadrant.  Masks carry the tile's class index; background pixels (from
the precomputed background masks) are the dataset's bg class.

This is an offline data-prep stage — numpy + cv2 on host, parallelized
over worker processes with disjoint index ranges
(reference cell 14 ``multiprocessing.Process`` fan-out).
"""

from __future__ import annotations

import multiprocessing as mp
from pathlib import Path
from typing import List, Optional, Tuple

import cv2
import numpy as np
from PIL import Image

from pistoseg_tpu.core.config import DatasetProfile
from pistoseg_tpu.data.labels import parse_label
from pistoseg_tpu.ops.background import extract_background
from pistoseg_tpu.ops.palette import encode_palette_png


def single_label_sets(train_dir: str | Path, profile: DatasetProfile) -> List[List[Path]]:
    """Per-class lists of patches whose filename label is one-hot
    (reference ``create_data``, ``dataset.py:21-33``)."""
    sets: List[List[Path]] = [[] for _ in range(profile.num_classes)]
    for p in sorted(Path(train_dir).glob("*.png")):
        label = parse_label(p, profile.label_grammar)
        if sum(label) == 1:
            sets[label.index(1)].append(p)
    return sets


def write_background_masks(train_dir: str | Path, out_dir: str | Path) -> int:
    """One-time background-mask extraction for all training patches
    (reference ``create_dataset.ipynb`` cell 6)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    n = 0
    for p in sorted(Path(train_dir).glob("*.png")):
        img = np.asarray(Image.open(p).convert("RGB"), np.uint8)
        bg = extract_background(img)
        Image.fromarray(bg).save(out / p.name)
        n += 1
    return n


def _random_crop(rng, image, mask, h, w):
    H, W = image.shape[:2]
    if H < h or W < w:  # PadIfNeeded(reflect-101 center) semantics
        ph, pw = max(h - H, 0), max(w - W, 0)
        top, left = ph // 2, pw // 2
        image = np.pad(image, ((top, ph - top), (left, pw - left), (0, 0)), mode="reflect")
        mask = np.pad(mask, ((top, ph - top), (left, pw - left)), mode="reflect")
        H, W = image.shape[:2]
    y = rng.randint(0, H - h + 1)
    x = rng.randint(0, W - w + 1)
    return image[y : y + h, x : x + w], mask[y : y + h, x : x + w]


def _random_flip(rng, image, mask, p=0.5):
    if rng.rand() < p:
        code = rng.choice([-1, 0, 1])  # both, vertical, horizontal
        image = cv2.flip(image, int(code))
        mask = cv2.flip(mask, int(code))
    return image, mask


def _shift_scale_rotate(rng, image, mask, p, shift=0.0625, scale=0.2, rot=45):
    if rng.rand() >= p:
        return image, mask
    H, W = image.shape[:2]
    angle = rng.uniform(-rot, rot)
    s = 1.0 + rng.uniform(-scale, scale)
    dx = rng.uniform(-shift, shift) * W
    dy = rng.uniform(-shift, shift) * H
    M = cv2.getRotationMatrix2D((W / 2, H / 2), angle, s)
    M[0, 2] += dx
    M[1, 2] += dy
    image = cv2.warpAffine(image, M, (W, H), flags=cv2.INTER_LINEAR,
                           borderMode=cv2.BORDER_REFLECT_101)
    mask = cv2.warpAffine(mask, M, (W, H), flags=cv2.INTER_NEAREST,
                          borderMode=cv2.BORDER_REFLECT_101)
    return image, mask


class MosaicSynthesizer:
    def __init__(
        self,
        train_dir: str | Path,
        profile: DatasetProfile,
        background_dir: Optional[str | Path] = None,
        patch_num: Optional[int] = None,
        tile_size: Optional[int] = None,
        bg_reject_frac: float = 0.8,
        aug_prob: float = 0.8,
        seed: int = 2022,
    ):
        self.profile = profile
        self.patch_num = patch_num or profile.mosaic_grid[0]
        self.tile_size = tile_size or profile.mosaic_grid[1]
        self.bg_reject_frac = bg_reject_frac
        self.aug_prob = aug_prob
        self.seed = seed
        self.train_dir = Path(train_dir)
        self.background_dir = Path(background_dir) if background_dir else None
        self.class_sets = single_label_sets(train_dir, profile)
        self.all_single = [p for s in self.class_sets for p in s]
        if not self.all_single:
            raise FileNotFoundError(f"no single-label patches under {train_dir}")
        # decoded-tile memo: every mosaic re-reads ~4·patch_num² random
        # tiles, so an uncached run PNG-decodes each training patch
        # hundreds of times (measured ~1.5 s/mosaic at the production 7×7
        # grid — 8h+ for the 20k budget).  The whole WSSS4LUAD train split
        # decodes to ~2.5 GB; cache it once per worker process.
        self._tile_cache: dict = {}

    @property
    def image_size(self) -> int:
        return self.patch_num * self.tile_size

    def _load_tile(self, path: Path) -> Tuple[np.ndarray, np.ndarray]:
        cached = self._tile_cache.get(path)
        if cached is not None:
            return cached
        img = np.asarray(Image.open(path).convert("RGB"), np.uint8)
        cls = parse_label(path, self.profile.label_grammar).index(1)
        mask = np.full(img.shape[:2], cls, np.uint8)
        if self.background_dir is not None:
            bg = np.asarray(Image.open(self.background_dir / path.name), np.uint8)
            mask[bg > 0] = self.profile.bg_class
        self._tile_cache[path] = (img, mask)
        return img, mask

    def _grid_image(self, rng) -> Tuple[np.ndarray, np.ndarray]:
        S, T = self.image_size, self.tile_size
        image = np.zeros((S, S, 3), np.uint8)
        mask = np.zeros((S, S), np.uint8)
        for i in range(self.patch_num):
            for j in range(self.patch_num):
                for _attempt in range(100):
                    p = self.all_single[rng.randint(len(self.all_single))]
                    timg, tmask = self._load_tile(p)
                    timg, tmask = _random_crop(rng, timg, tmask, T, T)
                    if (tmask == self.profile.bg_class).sum() < T * T * self.bg_reject_frac:
                        break
                image[i * T : (i + 1) * T, j * T : (j + 1) * T] = timg
                mask[i * T : (i + 1) * T, j * T : (j + 1) * T] = tmask
        return image, mask

    def _quadrant(self, rng, image, mask, h, w):
        image, mask = _random_flip(rng, image, mask, p=self.aug_prob)
        image, mask = _shift_scale_rotate(rng, image, mask, p=self.aug_prob)
        return _random_crop(rng, image, mask, h, w)

    def synthesize_one(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        """Deterministic per-index sample (reference seeds
        ``2022 + 2022*i`` per item, cell 9)."""
        rng = np.random.RandomState((self.seed + self.seed * index) % (2**32))
        S = self.image_size
        grids = [self._grid_image(rng) for _ in range(4)]
        h = int(S * (rng.rand() * 0.6 + 0.2))
        w = int(S * (rng.rand() * 0.6 + 0.2))
        h += h % 2
        w += w % 2
        image = np.zeros((S, S, 3), np.uint8)
        mask = np.zeros((S, S), np.uint8)
        specs = [(slice(0, h), slice(0, w), h, w),
                 (slice(0, h), slice(w, S), h, S - w),
                 (slice(h, S), slice(0, w), S - h, w),
                 (slice(h, S), slice(w, S), S - h, S - w)]
        for (ih, iw, qh, qw), (gimg, gmask) in zip(specs, grids):
            qimg, qmask = self._quadrant(rng, gimg, gmask, qh, qw)
            image[ih, iw] = qimg
            mask[ih, iw] = qmask
        return image, mask

    def write_range(self, out_dir: str | Path, start: int, stop: int) -> None:
        out = Path(out_dir)
        (out / "img").mkdir(parents=True, exist_ok=True)
        (out / "mask").mkdir(parents=True, exist_ok=True)
        for i in range(start, stop):
            image, mask = self.synthesize_one(i)
            Image.fromarray(image).save(out / "img" / f"{i}.png")
            encode_palette_png(mask, self.profile.palette, out / "mask" / f"{i}.png")

    def write_dataset(self, out_dir: str | Path, num_images: int, num_workers: int = 8) -> None:
        """Sharded parallel write with disjoint index ranges (cell 14)."""
        # more workers than cores only multiplies cost on this path: each
        # SPAWNED worker re-imports the package and rebuilds its own
        # decoded-tile cache (~10k PNG decodes), so oversubscription pays
        # the duplicate caches with zero added parallelism (single-core
        # full-budget host, round 5)
        num_workers = max(1, min(num_workers, mp.cpu_count()))
        if num_workers <= 1:
            self.write_range(out_dir, 0, num_images)
            return
        # spawn (not fork): parent processes typically have jax/XLA state,
        # and forking after backend init can deadlock
        ctx = mp.get_context("spawn")
        chunk = (num_images + num_workers - 1) // num_workers
        procs = []
        for k in range(num_workers):
            a, b = k * chunk, min((k + 1) * chunk, num_images)
            if a >= b:
                break
            p = ctx.Process(target=self.write_range, args=(out_dir, a, b))
            p.start()
            procs.append(p)
        for p in procs:
            p.join()
            if p.exitcode != 0:
                raise RuntimeError(f"mosaic writer exited with {p.exitcode}")
