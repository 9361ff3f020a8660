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
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_savable(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


class CheckpointManager:
    """best/last checkpoints under ``root/`` with a metadata sidecar."""

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    def _slot(self, name: str) -> Path:
        return self.root / name

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
        path = self._slot(name)
        self._ckptr.save(path.absolute(), _to_savable(tree), force=True)
        meta = {"epoch": epoch, "step": step, "metric": metric}
        if extra:
            meta.update(extra)
        (self.root / f"{name}.meta.json").write_text(json.dumps(meta, indent=2))

    def restore(self, name: str, target: Optional[Any] = None) -> Any:
        path = self._slot(name)
        if target is not None:
            return self._ckptr.restore(path.absolute(), item=_to_savable(target))
        return self._ckptr.restore(path.absolute())

    def metadata(self, name: str) -> dict:
        p = self.root / f"{name}.meta.json"
        return json.loads(p.read_text()) if p.exists() else {}

    def exists(self, name: str) -> bool:
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
