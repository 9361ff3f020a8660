"""Dependency-free TensorBoard event-file writer.

The reference logs scalars and image panels to TensorBoard via Lightning's
``TensorBoardLogger`` (``mosaic_train.py:104-117``,
``mosaic_module.py:271-277``).  This image has no tensorflow/tensorboard
wheels, so this module hand-encodes the two formats TensorBoard actually
reads — both tiny and stable:

* the **TFRecord** framing (length, masked-crc32c(length), payload,
  masked-crc32c(payload)), and
* the **Event/Summary protobuf wire format** (scalars as
  ``Summary.Value.simple_value``, images as ``Summary.Image`` holding an
  encoded PNG).

Files written here load in stock TensorBoard (`tensorboard --logdir`).
Scalars-only readers (e.g. ``tensorboard.backend.event_processing``) see
the same tags Lightning would have produced.
"""

from __future__ import annotations

import io
import os
import socket
import struct
import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np

# ---------------------------------------------------------------------------
# crc32c (Castagnoli, reflected poly 0x82F63B78) — the TFRecord checksum
# ---------------------------------------------------------------------------

_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ (0x82F63B78 * (_c & 1))
    _CRC_TABLE.append(_c)


def _crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# minimal protobuf wire encoding
# ---------------------------------------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _f_double(field: int, v: float) -> bytes:
    return _key(field, 1) + struct.pack("<d", v)


def _f_float(field: int, v: float) -> bytes:
    return _key(field, 5) + struct.pack("<f", v)


def _f_varint(field: int, v: int) -> bytes:
    return _key(field, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)


def _f_bytes(field: int, v: bytes) -> bytes:
    return _key(field, 2) + _varint(len(v)) + v


def _f_str(field: int, v: str) -> bytes:
    return _f_bytes(field, v.encode("utf-8"))


def _event(step: int, summary: Optional[bytes] = None,
           file_version: Optional[str] = None,
           wall_time: Optional[float] = None) -> bytes:
    msg = _f_double(1, wall_time if wall_time is not None else time.time())
    msg += _f_varint(2, step)
    if file_version is not None:
        msg += _f_str(3, file_version)
    if summary is not None:
        msg += _f_bytes(5, summary)
    return msg


def _scalar_value(tag: str, value: float) -> bytes:
    return _f_bytes(1, _f_str(1, tag) + _f_float(2, float(value)))


def _image_value(tag: str, png: bytes, h: int, w: int) -> bytes:
    image = (_f_varint(1, h) + _f_varint(2, w) + _f_varint(3, 3)
             + _f_bytes(4, png))
    return _f_bytes(1, _f_str(1, tag) + _f_bytes(4, image))


def _encode_png(arr: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.asarray(arr, np.uint8)).save(buf, format="PNG")
    return buf.getvalue()


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


class SummaryWriter:
    """Minimal ``torch.utils.tensorboard.SummaryWriter`` stand-in."""

    def __init__(self, log_dir: str | Path):
        self.dir = Path(log_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        host = socket.gethostname()
        name = f"events.out.tfevents.{int(time.time())}.{host}.{os.getpid()}"
        self._f = (self.dir / name).open("ab")
        self._record(_event(0, file_version="brain.Event:2"))

    def _record(self, payload: bytes) -> None:
        header = struct.pack("<Q", len(payload))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(payload)
        self._f.write(struct.pack("<I", _masked_crc(payload)))
        self._f.flush()

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self._record(_event(step, summary=_scalar_value(tag, value)))

    def add_scalars(self, metrics: Dict[str, float], step: int,
                    prefix: str = "") -> None:
        for k, v in metrics.items():
            try:
                fv = float(v)
            except (TypeError, ValueError):
                continue
            self.add_scalar(f"{prefix}{k}", fv, step)

    def add_image(self, tag: str, image_hwc: np.ndarray, step: int) -> None:
        """image_hwc: (H, W, 3) uint8 (or float in [0, 1])."""
        arr = np.asarray(image_hwc)
        if arr.dtype != np.uint8:
            arr = np.clip(arr * 255.0, 0, 255).astype(np.uint8)
        h, w = arr.shape[:2]
        self._record(_event(step, summary=_image_value(tag, _encode_png(arr), h, w)))

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
