"""Confusion-matrix segmentation metrics (mIoU / fwIoU / per-tissue IoU).

Reimplements ``mIoUMask`` (``loss.py:8-67``): pixels with ``gt >= num_class``
are masked out — this is how background (class 3) is excluded for
WSSS4LUAD when the matrix is 3×3 (``loss.py:18``); NaN per-class IoUs
become 0 before averaging; fwIoU weights by ground-truth frequency.

TPU-first: the reference accumulates a float64 numpy matrix on host every
step (GPU→CPU sync, SURVEY.md §7.4).  Here :func:`confusion_matrix` is a
one-hot matmul that runs under ``jit`` on device; with batch-sharded
inputs, jit's sharding propagation turns the sum into an all-reduce over
the 'data' axis.  The host-side :class:`MIoUAccumulator` only ever adds
(num_class² ) scalars per step.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("num_class",))
def confusion_matrix(
    pred: jnp.ndarray, gt: jnp.ndarray, num_class: int
) -> jnp.ndarray:
    """(num_class, num_class) float32 matrix; rows = gt, cols = pred.

    Pixels with gt outside [0, num_class) are excluded (reference mask
    semantics, ``loss.py:18-21``).
    """
    pred = pred.reshape(-1).astype(jnp.int32)
    gt = gt.reshape(-1).astype(jnp.int32)
    valid = (gt >= 0) & (gt < num_class)
    # one-hot matmul: rides the MXU instead of a scatter
    gt_oh = jax.nn.one_hot(jnp.where(valid, gt, 0), num_class, dtype=jnp.float32)
    pred_oh = jax.nn.one_hot(
        jnp.clip(pred, 0, num_class - 1), num_class, dtype=jnp.float32
    )
    gt_oh = gt_oh * valid[:, None].astype(jnp.float32)
    # exact counts: don't let TPU matmul default to bf16
    return jnp.matmul(gt_oh.T, pred_oh, precision=jax.lax.Precision.HIGHEST)


def iou_from_confusion(cm: np.ndarray) -> Tuple[np.ndarray, float, float]:
    """(per_class_iou, mIoU, fwIoU) with the reference's NaN→0 rule."""
    cm = np.asarray(cm, dtype=np.float64)
    diag = np.diag(cm)
    denom = cm.sum(axis=1) + cm.sum(axis=0) - diag
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = diag / denom
    iou = np.where(np.isnan(iou), 0.0, iou)
    miou = float(iou.mean())
    total = cm.sum()
    if total > 0:
        freq = cm.sum(axis=1) / total
        fwiou = float((freq[freq > 0] * iou[freq > 0]).sum())
    else:
        fwiou = 0.0
    return iou, miou, fwiou


def overall_valid_score(
    pred_dir: str, gt_dir: str, num_classes: int
) -> float:
    """mIoU between per-image ``.npy`` predictions and gt palette PNGs
    (OEEM ``get_overall_valid_score``, ``metric.py:26-86``) — without the
    reference's racy multiprocess shared-Array accumulation: the confusion
    matrices are computed on device and summed on host."""
    from pathlib import Path

    from pistoseg_tpu.ops.palette import decode_palette_png

    acc = MIoUAccumulator(num_classes)
    for p in sorted(Path(pred_dir).glob("*.npy")):
        pred = np.load(p, allow_pickle=True)
        gt = decode_palette_png(Path(gt_dir) / f"{p.stem}.png")
        acc.add(pred.astype(np.int32), gt)
    return acc.miou()


def f1_score(pred: np.ndarray, gt: np.ndarray, num_classes: int) -> np.ndarray:
    """Per-class F1 over pixels (OEEM ``metric.py:8-23`` capability)."""
    pred = np.asarray(pred).reshape(-1)
    gt = np.asarray(gt).reshape(-1)
    out = np.zeros(num_classes)
    for c in range(num_classes):
        tp = np.sum((pred == c) & (gt == c))
        fp = np.sum((pred == c) & (gt != c))
        fn = np.sum((pred != c) & (gt == c))
        denom = 2 * tp + fp + fn
        out[c] = (2 * tp / denom) if denom > 0 else 0.0
    return out


class MIoUAccumulator:
    """Host-side accumulator mirroring ``mIoUMask``'s public surface."""

    def __init__(self, num_classes: int, ignore_class: Optional[int] = None):
        # mirror mIoUMask.__init__: ignore_class widens the matrix by 1
        self.num_class = num_classes + (1 if ignore_class is not None else 0)
        self.ignore_class = ignore_class
        self.cm = np.zeros((self.num_class, self.num_class), np.float64)

    def add(self, pred, gt) -> None:
        pred = np.asarray(pred)
        gt = np.asarray(gt)
        if self.ignore_class is not None:
            keep = gt != self.ignore_class
            pred, gt = pred[keep], gt[keep]
        self.cm += np.asarray(
            confusion_matrix(jnp.asarray(pred), jnp.asarray(gt), self.num_class)
        )

    def add_confusion(self, cm) -> None:
        self.cm += np.asarray(cm, dtype=np.float64)

    def tissue_iou(self) -> np.ndarray:
        return iou_from_confusion(self.cm)[0]

    def miou(self) -> float:
        return iou_from_confusion(self.cm)[1]

    def fwiou(self) -> float:
        return iou_from_confusion(self.cm)[2]

    def reset(self) -> None:
        self.cm[:] = 0.0
