"""Tests for the native shard IO library (builds with g++ on first use)."""

import numpy as np
import pytest

from pistoseg_tpu.data.shardio import (
    ShardPairDataset,
    ShardReader,
    ShardWriter,
    build_image_mask_cache,
    load_library,
)


def test_build_and_roundtrip(tmp_path):
    load_library()
    rng = np.random.RandomState(0)
    path = tmp_path / "x.shard"
    data = rng.randint(0, 256, (5, 8, 8, 3), np.uint8)
    with ShardWriter(path, 5, (8, 8, 3)) as w:
        for i in range(5):
            w.write(i, data[i])
    with ShardReader(path) as r:
        assert len(r) == 5
        assert r.record_shape == (8, 8, 3)
        got = r.gather([3, 0, 4])
        np.testing.assert_array_equal(got[0], data[3])
        np.testing.assert_array_equal(got[1], data[0])
        np.testing.assert_array_equal(got[2], data[4])
        # multithreaded big gather
        idx = rng.randint(0, 5, size=257)
        got = r.gather(idx)
        np.testing.assert_array_equal(got, data[idx])


def test_gather_out_of_range(tmp_path):
    path = tmp_path / "y.shard"
    with ShardWriter(path, 2, (4,)) as w:
        w.write(0, np.zeros(4, np.uint8))
        w.write(1, np.ones(4, np.uint8))
    with ShardReader(path) as r:
        with pytest.raises(IndexError):
            r.gather([0, 7])


def test_open_garbage_fails(tmp_path):
    p = tmp_path / "bad.shard"
    p.write_bytes(b"not a shard")
    with pytest.raises(OSError):
        ShardReader(p)


def test_image_mask_cache(tmp_path):
    rng = np.random.RandomState(1)

    class FakeDS:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            r = np.random.RandomState(i)
            return {"image": r.randint(0, 255, (16, 16, 3), np.uint8),
                    "mask": r.randint(0, 4, (16, 16), np.uint8)}

    prefix = tmp_path / "cache"
    build_image_mask_cache(FakeDS(), prefix)
    ds = ShardPairDataset(prefix)
    assert len(ds) == 3
    item = ds[1]
    ref = FakeDS()[1]
    np.testing.assert_array_equal(item["image"], ref["image"])
    np.testing.assert_array_equal(item["mask"], ref["mask"])
    batch = ds.gather_batch([0, 2])
    assert batch["image"].shape == (2, 16, 16, 3)
    ds.close()
