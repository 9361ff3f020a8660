"""d4 test-time augmentation as a batched on-device transform group.

The reference wraps models in ``tta.SegmentationTTAWrapper(d4, 'mean')``
(``infer_pseudo_masks.py:96``, ``mosaic_train.py:198``): 8 dihedral
symmetries (4 rotations × optional horizontal flip), forward each, invert
the transform on the logits, average.

TPU-first: the 8 views are stacked into the batch dimension (one big
forward instead of 8 small ones — keeps the MXU busy), then inverse
transforms are applied with pure ``jnp.rot90``/``flip`` (layout ops XLA
fuses), and the mean reduces over the view axis.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

# The d4 group as (k_rot90, flip) pairs; inverse of (k, f) is applied as
# un-flip then rot90(-k).
D4 = tuple((k, f) for f in (False, True) for k in range(4))


def _apply(x: jnp.ndarray, k: int, flip: bool) -> jnp.ndarray:
    """x: (N, H, W, C) — rotate CCW k times then optionally flip W."""
    y = jnp.rot90(x, k=k, axes=(1, 2))
    if flip:
        y = jnp.flip(y, axis=2)
    return y


def _invert(x: jnp.ndarray, k: int, flip: bool) -> jnp.ndarray:
    y = jnp.flip(x, axis=2) if flip else x
    return jnp.rot90(y, k=-k, axes=(1, 2))


def d4_forward(
    model_fn: Callable[[jnp.ndarray], jnp.ndarray],
    images: jnp.ndarray,  # (N, H, W, C), H == W
) -> jnp.ndarray:
    """Mean of model logits over the 8 d4 views.  Output (N, H, W, C')."""
    n = images.shape[0]
    views = jnp.concatenate([_apply(images, k, f) for k, f in D4], axis=0)
    logits = model_fn(views)
    parts = jnp.split(logits, len(D4), axis=0)
    undone = [_invert(p, k, f) for p, (k, f) in zip(parts, D4)]
    return jnp.mean(jnp.stack(undone, axis=0), axis=0)[:n]
