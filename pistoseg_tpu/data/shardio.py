"""ctypes bindings + cache builder for the native shard IO library.

``native/shardio.cpp`` implements pre-decoded, mmap'd uint8 array shards
with a pthread gather — the TPU-native replacement for per-epoch PNG
decoding through DataLoader workers (SURVEY.md §7.3-7).  The library is
compiled on first use with g++ (cached next to the source).

Typical use::

    build_image_mask_cache(MosaicDataset(dir), "cache/mosaic")   # once
    ds = ShardPairDataset("cache/mosaic")                        # hot loop
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Sequence, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SRC = _NATIVE_DIR / "shardio.cpp"
_SO = _NATIVE_DIR / "libshardio.so"

_lib = None


def _build() -> Path:
    _SO.parent.mkdir(parents=True, exist_ok=True)
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        str(_SRC), "-o", str(_SO),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        _build()
    lib = ctypes.CDLL(str(_SO))
    lib.shard_create.restype = ctypes.c_void_p
    lib.shard_create.argtypes = [ctypes.c_char_p] + [ctypes.c_uint32] * 5
    lib.shard_open.restype = ctypes.c_void_p
    lib.shard_open.argtypes = [ctypes.c_char_p]
    lib.shard_n_records.restype = ctypes.c_int32
    lib.shard_n_records.argtypes = [ctypes.c_void_p]
    lib.shard_dims.restype = None
    lib.shard_dims.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint32)]
    lib.shard_record_bytes.restype = ctypes.c_int64
    lib.shard_record_bytes.argtypes = [ctypes.c_void_p]
    lib.shard_write.restype = ctypes.c_int32
    lib.shard_write.argtypes = [ctypes.c_void_p, ctypes.c_uint32,
                                ctypes.POINTER(ctypes.c_uint8)]
    lib.shard_gather.restype = ctypes.c_int32
    lib.shard_gather.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
    ]
    lib.shard_close.restype = None
    lib.shard_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def _u8ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


class ShardWriter:
    def __init__(self, path: str | Path, n_records: int, shape: Sequence[int]):
        if len(shape) > 4:
            raise ValueError("record rank must be ≤ 4")
        dims = tuple(shape) + (1,) * (4 - len(shape))
        self.shape = tuple(shape)
        self.lib = load_library()
        self.handle = self.lib.shard_create(
            str(path).encode(), n_records, *dims
        )
        if not self.handle:
            raise OSError(f"shard_create failed for {path}")

    def write(self, idx: int, record: np.ndarray) -> None:
        rec = np.ascontiguousarray(record, dtype=np.uint8)
        if rec.shape != self.shape:
            raise ValueError(f"record shape {rec.shape} != {self.shape}")
        if self.lib.shard_write(self.handle, idx, _u8ptr(rec)) != 0:
            raise IndexError(f"shard_write failed at {idx}")

    def close(self) -> None:
        if self.handle:
            self.lib.shard_close(self.handle)
            self.handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class ShardReader:
    def __init__(self, path: str | Path, gather_threads: int = 8):
        self.lib = load_library()
        self.handle = self.lib.shard_open(str(path).encode())
        if not self.handle:
            raise OSError(f"shard_open failed for {path}")
        dims = (ctypes.c_uint32 * 4)()
        self.lib.shard_dims(self.handle, dims)
        self.dims = tuple(int(d) for d in dims)
        self.n = int(self.lib.shard_n_records(self.handle))
        self.record_bytes = int(self.lib.shard_record_bytes(self.handle))
        self.gather_threads = gather_threads

    @property
    def record_shape(self) -> Tuple[int, ...]:
        shape = [d for d in self.dims]
        while len(shape) > 1 and shape[-1] == 1:
            shape.pop()
        return tuple(shape)

    def __len__(self):
        return self.n

    def gather(self, indices: Sequence[int]) -> np.ndarray:
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        out = np.empty((len(idx),) + self.record_shape, np.uint8)
        rc = self.lib.shard_gather(
            self.handle,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx),
            _u8ptr(out),
            self.gather_threads,
        )
        if rc != 0:
            raise IndexError("shard_gather failed (index out of range?)")
        return out

    def close(self) -> None:
        if self.handle:
            self.lib.shard_close(self.handle)
            self.handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def build_image_mask_cache(dataset, out_prefix: str | Path,
                           keys: Tuple[str, str] = ("image", "mask")) -> None:
    """Pre-decode a dataset of uint8 image/mask dicts into two shards."""
    out_prefix = Path(out_prefix)
    out_prefix.parent.mkdir(parents=True, exist_ok=True)
    first = dataset[0]
    n = len(dataset)
    with ShardWriter(f"{out_prefix}.{keys[0]}.shard", n, first[keys[0]].shape) as wi, \
         ShardWriter(f"{out_prefix}.{keys[1]}.shard", n, first[keys[1]].shape) as wm:
        for i in range(n):
            item = dataset[i]
            wi.write(i, item[keys[0]])
            wm.write(i, item[keys[1]])


def build_image_label_cache(dataset, out_prefix: str | Path,
                            image_key: str = "image",
                            label_key: str = "label") -> None:
    """Pre-decode an image+label-vector dataset (stage 0: uint8 patches +
    filename multilabels) into one uint8 shard + a ``.labels.npy``."""
    out_prefix = Path(out_prefix)
    out_prefix.parent.mkdir(parents=True, exist_ok=True)
    first = dataset[0]
    n = len(dataset)
    labels = np.zeros((n,) + np.asarray(first[label_key]).shape, np.float32)
    with ShardWriter(f"{out_prefix}.{image_key}.shard", n,
                     first[image_key].shape) as wi:
        for i in range(n):
            item = dataset[i]
            wi.write(i, item[image_key])
            labels[i] = item[label_key]
    np.save(f"{out_prefix}.labels.npy", labels)


class ShardImageLabelDataset:
    """Image+label dataset over a prebuilt shard cache (stage-0 hot loop);
    batch-native like :class:`ShardPairDataset`."""

    def __init__(self, prefix: str | Path, image_key: str = "image",
                 gather_threads: int = 8):
        self.images = ShardReader(f"{prefix}.{image_key}.shard", gather_threads)
        self.labels = np.load(f"{prefix}.labels.npy")
        assert len(self.images) == len(self.labels)
        self.image_key = image_key

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        batch = self.gather_batch([i])
        return {self.image_key: batch[self.image_key][0],
                "label": batch["label"][0], "name": str(i)}

    def gather_batch(self, indices: Sequence[int]):
        return {self.image_key: self.images.gather(indices),
                "label": self.labels[np.asarray(indices)]}

    def close(self):
        self.images.close()


class ShardPairDataset:
    """Image/mask dataset over a prebuilt shard cache; batch-native:
    ``gather_batch`` returns contiguous arrays ready for device_put."""

    def __init__(self, prefix: str | Path, keys: Tuple[str, str] = ("image", "mask"),
                 gather_threads: int = 8):
        self.images = ShardReader(f"{prefix}.{keys[0]}.shard", gather_threads)
        self.masks = ShardReader(f"{prefix}.{keys[1]}.shard", gather_threads)
        assert len(self.images) == len(self.masks)
        self.keys = keys

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        batch = self.gather_batch([i])
        return {self.keys[0]: batch[self.keys[0]][0],
                self.keys[1]: batch[self.keys[1]][0], "name": str(i)}

    def gather_batch(self, indices: Sequence[int]):
        return {
            self.keys[0]: self.images.gather(indices),
            self.keys[1]: self.masks.gather(indices),
        }

    def close(self):
        self.images.close()
        self.masks.close()
