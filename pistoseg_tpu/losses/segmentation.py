"""Supervised segmentation losses (stages 2 and 5).

* :func:`dice_loss` — multiclass soft Dice matching
  ``segmentation_models_pytorch`` semantics as used by the reference
  (``mosaic_module.py:65-68``: ``smp.losses.DiceLoss(mode='multiclass',
  ignore_index=num_classes)``, from_logits, smooth=0, eps=1e-7, per-class
  scores aggregated over batch+space, classes absent from the target
  contribute 0).
* :func:`cross_entropy_loss` — ``nn.CrossEntropyLoss(ignore_index=…)``
  semantics for stage 5 (``segmentation_module.py:63-66``).

All functions take NHWC logits and (N, H, W) integer targets, compute in
float32 regardless of activation dtype, and are pure (jit/grad-safe).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def dice_loss(
    logits: jnp.ndarray,       # (N, H, W, C)
    target: jnp.ndarray,       # (N, H, W) int
    ignore_index: Optional[int] = None,
    smooth: float = 0.0,
    eps: float = 1e-7,
) -> jnp.ndarray:
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    target = target.astype(jnp.int32)
    if ignore_index is not None:
        valid = (target != ignore_index).astype(jnp.float32)[..., None]
        tgt = jnp.where(target == ignore_index, 0, target)
    else:
        valid = jnp.ones(target.shape + (1,), jnp.float32)
        tgt = target
    onehot = jax.nn.one_hot(tgt, num_classes, dtype=jnp.float32) * valid
    probs = probs * valid
    # aggregate over batch + space per class (smp dims=(0, 2))
    axes = (0, 1, 2)
    intersection = jnp.sum(probs * onehot, axis=axes)
    cardinality = jnp.sum(probs + onehot, axis=axes)
    score = (2.0 * intersection + smooth) / jnp.maximum(cardinality + smooth, eps)
    loss = 1.0 - score
    seen = (jnp.sum(onehot, axis=axes) > 0).astype(jnp.float32)
    return jnp.mean(loss * seen)


def cross_entropy_loss(
    logits: jnp.ndarray,       # (N, H, W, C)
    target: jnp.ndarray,       # (N, H, W) int
    ignore_index: Optional[int] = None,
) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    target = target.astype(jnp.int32)
    num_classes = logits.shape[-1]
    if ignore_index is not None:
        valid = (target != ignore_index).astype(jnp.float32)
        tgt = jnp.where(target == ignore_index, 0, target)
    else:
        valid = jnp.ones(target.shape, jnp.float32)
        tgt = target
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(valid), 1.0)
    return jnp.sum(nll * valid) / denom
