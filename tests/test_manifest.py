"""Tests for artifact manifests."""

from pistoseg_tpu.core.manifest import (
    hash_tree,
    stage_is_current,
    write_manifest,
    read_manifest,
)


def test_manifest_roundtrip_and_staleness(tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.txt").write_text("hello")
    out = tmp_path / "out"

    inputs = {"train": hash_tree(src)}
    cfg = {"lr": 0.1}
    write_manifest(out, "stage2", inputs, cfg, outputs={"masks": 3})
    assert read_manifest(out)["outputs"]["masks"] == 3
    assert stage_is_current(out, "stage2", inputs, cfg)

    # different config -> stale
    assert not stage_is_current(out, "stage2", inputs, {"lr": 0.2})
    # changed input content -> stale
    (src / "a.txt").write_text("changed")
    assert not stage_is_current(out, "stage2", {"train": hash_tree(src)}, cfg)
    # wrong stage name -> stale
    assert not stage_is_current(out, "stage5", inputs, cfg)


def test_hash_tree_order_independent(tmp_path):
    d = tmp_path / "d"
    d.mkdir()
    (d / "b.bin").write_bytes(b"22")
    (d / "a.bin").write_bytes(b"11")
    h1 = hash_tree(d)
    # rewrite same contents
    (d / "a.bin").write_bytes(b"11")
    assert hash_tree(d) == h1
