"""Tests for artifact manifests."""

import pytest

from pistoseg_tpu.core.manifest import (
    StaleArtifactError,
    check_upstream,
    hash_tree,
    skip_if_current,
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


def test_check_upstream_refuses_incomplete_stage(tmp_path):
    """Crashed-producer semantics: outputs without a manifest are refused
    (the manifest is written only after the stage completes)."""
    produced = tmp_path / "stage3_out"
    (produced / "logits_32x32").mkdir(parents=True)
    (produced / "logits_32x32" / "x.npy").write_bytes(b"partial")

    with pytest.raises(StaleArtifactError, match="did not complete"):
        check_upstream(produced / "logits_32x32", "stage3", what="pmask_dir")
    # trusted external artifacts pass with a warning
    assert check_upstream(produced / "logits_32x32", "stage3", trust=True) is None

    # completed producer: manifest at the output ROOT, consumer points at a
    # subdirectory — lookup walks up
    write_manifest(produced, "stage3", {"in": "h"}, {}, outputs={"patches": 1})
    doc = check_upstream(produced / "logits_32x32", "stage3")
    assert doc["outputs"]["patches"] == 1

    # wrong producing stage is an error even when a manifest exists
    with pytest.raises(StaleArtifactError, match="wrong directory"):
        check_upstream(produced / "logits_32x32", "stage0_export")


def test_skip_if_current_producer_idempotence(tmp_path, capsys):
    out = tmp_path / "out"
    inputs = {"train": "abc"}
    cfg = {"lr": 0.1}
    assert not skip_if_current(out, "stage3", inputs, cfg)   # first run: work
    write_manifest(out, "stage3", inputs, cfg, outputs={"patches": 7})
    assert skip_if_current(out, "stage3", inputs, cfg)       # re-run: skip
    assert "skipping" in capsys.readouterr().out
    # input drift invalidates the skip
    assert not skip_if_current(out, "stage3", {"train": "zzz"}, cfg)
