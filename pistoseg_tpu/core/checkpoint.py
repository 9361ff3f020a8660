"""Orbax checkpoint IO with explicit metadata and best/last policies.

The reference persists Lightning ``.ckpt`` files named
``{epoch:02d}-{metric:.4f}.ckpt`` + ``last.ckpt`` and *discovers* the best
checkpoint by substring search for ``'epoch='``
(``mosaic_train.py:121-130``, ``infer_pseudo_masks.py:166-171``) — a
stringly-typed contract.  Here checkpoints carry structured metadata
(step, epoch, metric, config) and are addressed as ``best``/``last``
explicitly (SURVEY.md §5.4).
"""

from __future__ import annotations

import json
import os
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


def _to_savable(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def _device_snapshot(x):
    """A new device buffer with the same contents — safe against the train
    step's donation of the original (a donated input is deleted at the next
    dispatch; snapshotting on device is an async HBM copy, so the caller
    never blocks on a device→host fetch)."""
    if isinstance(x, jax.Array):
        y = jnp.copy(x)
        # jnp.copy stays on device with the input's sharding; if a future
        # jax ever reshards exotic layouts through the host, fall back to
        # the safe synchronous fetch rather than write a resharded tree
        if getattr(y, "sharding", None) == getattr(x, "sharding", None):
            return y
        return np.asarray(x)
    return x


class CheckpointManager:
    """best/last checkpoints under ``root/`` with a metadata sidecar.

    Writes are ASYNCHRONOUS by default: ``save`` snapshots the tree on
    device (donation-safe ``jnp.copy``) and hands serialization + disk IO
    to a single FIFO worker thread, so the accelerator keeps training while
    the host writes (a full-state checkpoint measured ~50 s/epoch of pure
    blocked-device time in the round-5 full-budget stage-0 run).  Ordering
    between slots is preserved (one worker, FIFO); memory is bounded by
    ``max_pending`` in-flight snapshots.  All read paths (``restore``,
    ``metadata``, ``exists``) and ``flush`` drain pending writes first —
    callers hashing the checkpoint tree (stage manifests) must ``flush()``
    (the stage trainers do, right after ``fit``).  Set
    ``PISTOSEG_SYNC_CKPT=1`` to force synchronous writes (A/B, debugging).
    """

    def __init__(self, root: str | Path, *, async_writes: Optional[bool] = None,
                 max_pending: int = 2):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()
        if async_writes is None:
            async_writes = os.environ.get("PISTOSEG_SYNC_CKPT", "") != "1"
        self._async = async_writes
        self._max_pending = max(1, max_pending)
        self._pool: Optional[ThreadPoolExecutor] = None
        self._pending: deque = deque()

    def _slot(self, name: str) -> Path:
        return self.root / name

    # -- async write machinery ---------------------------------------------

    def _write(self, name: str, host_tree: Any, meta: dict) -> None:
        """Runs on the worker thread (or inline when sync): the orbax save
        + metadata sidecar.  ``host_tree`` leaves may still be jax Arrays
        (device snapshots) — ``_to_savable``'s np.asarray does the
        device→host fetch HERE, overlapped with the main thread's compute."""
        self._ckptr.save(self._slot(name).absolute(), _to_savable(host_tree),
                         force=True)
        (self.root / f"{name}.meta.json").write_text(json.dumps(meta, indent=2))

    def flush(self) -> None:
        """Block until every pending write is on disk; re-raise the first
        worker failure (a lost checkpoint must not be silent)."""
        while self._pending:
            self._pending.popleft().result()

    def save(
        self,
        name: str,
        tree: Any,
        *,
        epoch: int = -1,
        step: int = -1,
        metric: float = float("nan"),
        extra: Optional[dict] = None,
    ) -> None:
        meta = {"epoch": epoch, "step": step, "metric": metric}
        if extra:
            meta.update(extra)
        if not self._async:
            self._write(name, tree, meta)
            return
        snap = jax.tree_util.tree_map(_device_snapshot, tree)
        if self._pool is None:
            self._pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="ckpt-writer")
        # bounded in-flight snapshots: wait for the oldest write (also
        # surfaces its exception) before holding more device memory
        while len(self._pending) >= self._max_pending:
            self._pending.popleft().result()
        self._pending.append(self._pool.submit(self._write, name, snap, meta))

    def restore(self, name: str, target: Optional[Any] = None) -> Any:
        self.flush()
        path = self._slot(name)
        if target is not None:
            return self._ckptr.restore(path.absolute(), item=_to_savable(target))
        return self._ckptr.restore(path.absolute())

    def metadata(self, name: str) -> dict:
        self.flush()
        p = self.root / f"{name}.meta.json"
        return json.loads(p.read_text()) if p.exists() else {}

    def exists(self, name: str) -> bool:
        self.flush()
        return self._slot(name).exists()

    def save_best_last(self, tree, epoch: int, metric: float, is_best: bool,
                       step: int = -1, extra: Optional[dict] = None) -> None:
        self.save("last", tree, epoch=epoch, step=step, metric=metric, extra=extra)
        if is_best:
            self.save("best", tree, epoch=epoch, step=step, metric=metric, extra=extra)

    # -- full-state resume (params + batch_stats + optimizer + step) -------

    def save_train_state(self, state, epoch: int, metric: float = float("nan"),
                         extra: Optional[dict] = None,
                         step_in_epoch: int = -1) -> None:
        """Persist the complete TrainState for exact resume — something the
        reference never supports (SURVEY.md §5.4).

        ``step_in_epoch ≥ 0`` marks a MID-epoch snapshot: ``epoch`` is the
        epoch in progress and ``step_in_epoch`` is the number of its
        batches already consumed (the next run skips exactly that many —
        batch order is a pure function of (seed, epoch))."""
        tree = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        meta = dict(extra or {}, step_in_epoch=step_in_epoch)
        self.save("train_state", tree, epoch=epoch, step=int(state.step),
                  metric=metric, extra=meta)

    def restore_train_state(self, state):
        """Returns (state, start_epoch, start_step_in_epoch): resume at
        ``start_epoch``, skipping its first ``start_step_in_epoch`` batches
        (0 after a clean end-of-epoch snapshot)."""
        target = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        tree = self.restore("train_state", target)
        meta = self.metadata("train_state")
        state = state.replace(
            params=tree["params"],
            batch_stats=tree["batch_stats"],
            opt_state=tree["opt_state"],
            step=jax.numpy.asarray(tree["step"]),
        )
        epoch = int(meta.get("epoch", -1))
        step_in_epoch = int(meta.get("step_in_epoch", -1))
        if step_in_epoch >= 0:
            return state, epoch, step_in_epoch
        return state, epoch + 1, 0
