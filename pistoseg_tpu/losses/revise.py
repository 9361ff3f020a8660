"""Stage-4 (RFM revise) loss stack.

Reimplements the loss math of ``revise_pseudo_labels.py:114-135,238-282``
in NHWC (channel 0 = background):

* ``loss_cls`` = multilabel soft margin on GAP(cam) foreground channels
  + adaptive-min-pooling loss on ``cam_rv·label`` foreground channels;
* ``loss_rfm`` = mean L1 between label-masked foreground ``pmask_rv`` and
  ``pcam_rv``;
* ``loss_ecr`` = SEAM-style equivariant-cross regularization (the paper's
  feature-consistency constraint): mean of the top-20% |max_onehot(x) − y_rv|
  entries, symmetric in (pmask, pcam).

Parity notes: the reference's top-k count is ``int(4 * h * w * 0.2)`` with a
*hard-coded* 4 regardless of dataset channel count
(``revise_pseudo_labels.py:278-279``) — preserved here; the max_onehot
inputs are detached (stop_gradient).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def multilabel_soft_margin_loss(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """``F.multilabel_soft_margin_loss``: mean over batch of the per-class
    mean of −[y·log σ(x) + (1−y)·log σ(−x)]."""
    logits = logits.astype(jnp.float32)
    target = target.astype(jnp.float32)
    loss = target * jax.nn.log_sigmoid(logits) + (1.0 - target) * jax.nn.log_sigmoid(-logits)
    return -jnp.mean(jnp.mean(loss, axis=-1))


def adaptive_min_pooling_loss(x: jnp.ndarray) -> jnp.ndarray:
    """``adaptive_min_pooling_loss`` (``revise_pseudo_labels.py:114-122``).

    x: (N, H, W, C) foreground maps.  Max over classes, then the mean of the
    ReLU'd h·w/4 *smallest* spatial values.
    """
    n, h, w, _ = x.shape
    k = (h * w) // 4
    m = jnp.max(x, axis=-1).reshape(n, -1)          # (N, H*W)
    smallest = -jax.lax.top_k(-m, k)[0]             # bottom-k
    return jnp.sum(jax.nn.relu(smallest)) / (k * n)


def max_norm(p: jnp.ndarray, e: float = 1e-5) -> jnp.ndarray:
    """Per-(sample, channel) spatial min-max normalization
    (``revise_pseudo_labels.py:132-138``)."""
    mx = jnp.max(p, axis=(1, 2), keepdims=True)
    mn = jnp.min(p, axis=(1, 2), keepdims=True)
    return (p - mn) / (mx - mn + e)


def max_onehot(x: jnp.ndarray) -> jnp.ndarray:
    """Zero foreground entries that are not the per-pixel foreground max
    (``revise_pseudo_labels.py:124-129``); background channel 0 untouched."""
    fg = x[..., 1:]
    fg_max = jnp.max(fg, axis=-1, keepdims=True)
    fg = jnp.where(fg == fg_max, fg, 0.0)
    return jnp.concatenate([x[..., :1], fg], axis=-1)


def _topk_mean(x: jnp.ndarray, k: int) -> jnp.ndarray:
    n = x.shape[0]
    flat = x.reshape(n, -1)
    return jnp.mean(jax.lax.top_k(flat, k)[0])


def ecr_loss(
    pmask_up: jnp.ndarray,   # (N, H, W, C) normed/label-masked input pmask, upsampled
    pcam_up: jnp.ndarray,    # (N, H, W, C) same for pcam
    pmask_rv: jnp.ndarray,   # (N, H, W, C) refined pmask from the RFM
    pcam_rv: jnp.ndarray,    # (N, H, W, C) refined pcam from the RFM
    topk_frac: float = 0.2,
) -> jnp.ndarray:
    n, h, w, _ = pmask_up.shape
    # reference hard-codes factor 4 (not C): int(4*h*w*0.2)
    k = int(4 * h * w * topk_frac)
    t1 = jnp.abs(max_onehot(jax.lax.stop_gradient(pmask_up)) - pcam_rv)
    t2 = jnp.abs(max_onehot(jax.lax.stop_gradient(pcam_up)) - pmask_rv)
    return _topk_mean(t1, k) + _topk_mean(t2, k)


def rfm_l1_loss(pmask_rv: jnp.ndarray, pcam_rv: jnp.ndarray) -> jnp.ndarray:
    """Mean |pmask_rv − pcam_rv| over foreground channels
    (``revise_pseudo_labels.py:263-265``); inputs already label-masked."""
    return jnp.mean(jnp.abs(pmask_rv[..., 1:] - pcam_rv[..., 1:]))


def revise_losses(
    cam: jnp.ndarray,        # (N, H, W, C) upsampled CAM logits
    cam_rv: jnp.ndarray,     # (N, H, W, C) refined CAM
    pmask_rv: jnp.ndarray,   # (N, H, W, C) refined pseudo-mask
    pcam_rv: jnp.ndarray,    # (N, H, W, C) refined pseudo-CAM
    pmask_up: jnp.ndarray,   # (N, H, W, C) normed input pmask upsampled (for ECR)
    pcam_up: jnp.ndarray,    # (N, H, W, C) normed input pcam upsampled (for ECR)
    label: jnp.ndarray,      # (N, C) image-level label incl. bg_score=1 at 0
    topk_frac: float = 0.2,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    lbl = label[:, None, None, :].astype(jnp.float32)
    # classification head: GAP over the upsampled CAM (reference GAPs the
    # (H, W) map after interpolation, revise_pseudo_labels.py:252-256)
    label_cam = jnp.mean(cam, axis=(1, 2))              # (N, C)
    loss_rvmin = adaptive_min_pooling_loss((cam_rv * lbl)[..., 1:])
    loss_cls = multilabel_soft_margin_loss(label_cam[:, 1:], label[:, 1:]) + loss_rvmin

    pmask_rv_m = pmask_rv * lbl
    pcam_rv_m = pcam_rv * lbl
    loss_rfm = rfm_l1_loss(pmask_rv_m, pcam_rv_m)

    loss_ecr = ecr_loss(pmask_up, pcam_up, pmask_rv_m, pcam_rv_m, topk_frac)

    total = loss_cls + loss_rfm + loss_ecr
    return total, {
        "loss_cls": loss_cls,
        "loss_rfm": loss_rfm,
        "loss_ecr": loss_ecr,
        "loss": total,
    }
