"""PRNG key plumbing.

The reference relies on global seeding (``pl.seed_everything(42)``,
``seed_all`` in ``revise_pseudo_labels.py:140-146``) and still documents
residual nondeterminism (``README.md:67-68``).  Here every random decision
is keyed explicitly: a single root seed fans out through ``fold_in_str``
into named, collision-free streams, so any stage / epoch / sample is
independently reproducible.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import jax
import jax.numpy as jnp


def root_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def fold_in_str(key: jax.Array, name: str) -> jax.Array:
    """Deterministically derive a named substream from ``key``."""
    digest = hashlib.sha256(name.encode("utf-8")).digest()
    word = int.from_bytes(digest[:4], "little")
    return jax.random.fold_in(key, jnp.uint32(word))


def key_chain(key: jax.Array) -> Iterator[jax.Array]:
    """Infinite stream of fresh subkeys (host-side convenience)."""
    while True:
        key, sub = jax.random.split(key)
        yield sub


def stage_key(seed: int, stage: str, epoch: int = 0, step: int = 0) -> jax.Array:
    """Canonical key for (stage, epoch, step) — used by data augmentation
    so a sample's augmentation depends only on (seed, stage, epoch, index)."""
    k = fold_in_str(root_key(seed), stage)
    k = jax.random.fold_in(k, jnp.uint32(epoch))
    return jax.random.fold_in(k, jnp.uint32(step))
