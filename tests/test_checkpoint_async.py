"""Async checkpoint writer: correctness of the round-5 device-snapshot +
worker-thread write path (``core/checkpoint.py``).

The full-budget stage-0 run measured ~50 s/epoch of device-blocking
checkpoint IO (1.1 GB of ``last`` + ``train_state`` written synchronously
every epoch); writes now snapshot on device and serialize on a FIFO worker.
These tests lock the contract that makes that safe:

* round-trip value equality + metadata, async vs sync byte behavior,
* FIFO ordering into the same slot (the trainer writes last → train_state
  → best back-to-back each epoch),
* the snapshot is a NEW buffer (donation safety: the train step donates
  the state the snapshot was taken from),
* read-your-writes: ``exists``/``metadata``/``restore`` flush first,
* a worker failure is re-raised, not swallowed (a lost checkpoint must
  fail the run).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pistoseg_tpu.core.checkpoint import CheckpointManager


def _tree(seed: int):
    k = jax.random.PRNGKey(seed)
    return {
        "w": jax.random.normal(k, (32, 16), jnp.float32),
        "b": jnp.arange(16, dtype=jnp.float32) * seed,
        "step": jnp.asarray(seed),
    }


def test_async_roundtrip_and_metadata(tmp_path):
    mgr = CheckpointManager(tmp_path, async_writes=True)
    tree = _tree(3)
    mgr.save("last", tree, epoch=7, metric=0.5, extra={"stage": "t"})
    got = mgr.restore("last")  # flushes first
    for k in tree:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(tree[k]))
    meta = mgr.metadata("last")
    assert meta["epoch"] == 7 and meta["metric"] == 0.5 and meta["stage"] == "t"


def test_async_matches_sync_bytes(tmp_path):
    tree = _tree(11)
    a = CheckpointManager(tmp_path / "a", async_writes=True)
    s = CheckpointManager(tmp_path / "s", async_writes=False)
    a.save("best", tree, epoch=1)
    s.save("best", tree, epoch=1)
    a.flush()
    ga, gs = a.restore("best"), s.restore("best")
    for k in tree:
        np.testing.assert_array_equal(np.asarray(ga[k]), np.asarray(gs[k]))


def test_fifo_ordering_same_slot(tmp_path):
    mgr = CheckpointManager(tmp_path, async_writes=True, max_pending=2)
    for i in range(5):
        mgr.save("last", _tree(i), epoch=i)
    got = mgr.restore("last")
    np.testing.assert_array_equal(np.asarray(got["step"]), 4)
    assert mgr.metadata("last")["epoch"] == 4


def test_snapshot_is_new_buffer(tmp_path):
    """Donation safety: the enqueued tree must not alias the live state —
    the next train step donates (and thereby deletes) the original."""
    from pistoseg_tpu.core.checkpoint import _device_snapshot

    x = jnp.ones((128, 128), jnp.float32)
    y = _device_snapshot(x)
    assert isinstance(y, jax.Array)
    assert y.sharding == x.sharding
    assert y.unsafe_buffer_pointer() != x.unsafe_buffer_pointer()
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_worker_failure_surfaces(tmp_path, monkeypatch):
    mgr = CheckpointManager(tmp_path, async_writes=True)

    def boom(*a, **kw):
        raise OSError("disk gone")

    monkeypatch.setattr(mgr._ckptr, "save", boom)
    mgr.save("last", _tree(1), epoch=0)
    with pytest.raises(OSError, match="disk gone"):
        mgr.flush()


def test_read_your_writes_without_explicit_flush(tmp_path):
    mgr = CheckpointManager(tmp_path, async_writes=True)
    mgr.save("train_state", _tree(9), epoch=2)
    assert mgr.exists("train_state")          # flushes internally
    assert mgr.metadata("train_state")["epoch"] == 2


def test_sync_env_override(tmp_path, monkeypatch):
    monkeypatch.setenv("PISTOSEG_SYNC_CKPT", "1")
    mgr = CheckpointManager(tmp_path)
    assert mgr._async is False
    mgr.save("last", _tree(2), epoch=0)
    assert not mgr._pending
    got = mgr.restore("last")
    np.testing.assert_array_equal(np.asarray(got["step"]), 2)
