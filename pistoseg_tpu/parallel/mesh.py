"""Device-mesh construction and sharding helpers.

The reference has no distributed backend at all (SURVEY.md §2.4/§5.8): its
only multi-device path is single-process ``torch.nn.DataParallel``
(``revise_pseudo_labels.py:186``).  The TPU-native replacement is one
``jax.sharding.Mesh`` over the ICI slice with batch-dim data parallelism:
parameters replicated, batches sharded on axis ``'data'``, gradients and
confusion matrices combined by XLA all-reduce inserted by ``jit`` from the
sharding annotations.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(
    axes: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over all (or the given) devices.

    ``shape`` entries of -1 absorb the remaining device count (like a
    reshape); default is a 1-D 'data' mesh over every visible device.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = [-1] + [1] * (len(axes) - 1)
    shape = list(shape)
    fixed = math.prod(s for s in shape if s != -1)
    for i, s in enumerate(shape):
        if s == -1:
            shape[i] = n // fixed
    total = math.prod(shape)
    if total > n:
        raise ValueError(f"mesh shape {shape} needs {total} devices, have {n}")
    # an explicit smaller shape selects a device-prefix submesh
    dev_array = np.asarray(devices[:total]).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for a batch-leading array: dim 0 split over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def mesh_batch_loader(dataset, batch_size: int, mesh: Mesh, **kwargs):
    """:class:`~pistoseg_tpu.data.loader.BatchLoader` whose EVERY batch
    divides the mesh: batch size padded to a multiple of ``mesh.size`` and
    tail padding forced on.  The mesh-sharded inference stages previously
    relied implicitly on the loader's ``pad_last=True`` default (ADVICE
    r4) — a caller passing ``drop_last=True``/``pad_last=False`` would hit
    an opaque XLA sharding error on the tail batch instead of this check.
    """
    from pistoseg_tpu.data.loader import BatchLoader

    if kwargs.get("drop_last") or kwargs.get("pad_last") is False:
        raise ValueError(
            "mesh-sharded loaders require pad_last=True and drop_last=False: "
            "every batch (including the tail) must divide mesh.size")
    kwargs["pad_last"] = True
    kwargs["drop_last"] = False
    return BatchLoader(dataset, pad_to_multiple(batch_size, mesh.size), **kwargs)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put a host batch (pytree of arrays) sharded on dim 0.

    Batch dim must divide evenly over the axis size; callers pad with
    ``pad_to_multiple`` and mask in the loss/metric instead of dropping.
    """
    sharding = batch_sharding(mesh, axis)

    def _put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(_put, batch)
