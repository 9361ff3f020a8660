"""Mesh-sharded inference stages == single-device (VERDICT r3 #4).

The reference data-parallelizes its export stages over GPUs
(``prepare_seg_inputs.py:78``, ``infer_revise_masks.py:110``); here every
inference/export stage (3, 4b, 5-test, 0b) shards the batch dim over the
'data' mesh axis with replicated weights.  Batch sharding never splits a
within-sample contraction, so per-sample numerics are independent of the
device count *in math terms* — but XLA tiles/vectorizes reductions
differently for local batch 8 vs 1, which reassociates bf16 sums (measured
max |Δ| ≈ 1.2e-3 on stage-3 logits).  These tests run each stage on a
1-device and the full 8-device mesh with the SAME global batch shape and
assert integer/palette-PNG artifacts are byte-identical (argmax absorbs
the reassociation noise) and float ``.npy`` artifacts agree to a few bf16
ULPs (atol 1e-2).
"""

import hashlib
from pathlib import Path

import numpy as np
import pytest

from pistoseg_tpu.core.config import Config

from util_synthetic import (
    make_big_eval_set,
    make_stage4_artifacts,
    make_training_patches,
)

# multidev sub-lane: run just these with `pytest -m multidev --override-ini=addopts=`
pytestmark = [pytest.mark.heavy, pytest.mark.multidev]


def _tree_digest(root: Path) -> dict:
    """name -> sha256 of every artifact file (.npy/.png) under root.
    Manifests/meta (absolute paths, timestamps) and TB event files
    (timestamped names) are run-specific, not artifacts."""
    out = {}
    for p in sorted(root.rglob("*")):
        if p.is_file() and p.suffix in (".npy", ".png"):
            out[str(p.relative_to(root))] = hashlib.sha256(p.read_bytes()).hexdigest()
    return out


def _assert_trees_identical(a: Path, b: Path, float_atol: float = 1e-2,
                            png_flip_frac: float = 0.005):
    """Artifacts must agree across device counts: float .npy to a few bf16
    ULPs; palette PNGs (argmax outputs) up to a tiny near-tie pixel-flip
    budget — with barely-trained test weights the class probs are
    near-uniform, so ULP noise legitimately flips O(0.1%) of argmax pixels
    (measured 7-11/9216 on the stitched canvases)."""
    from pistoseg_tpu.ops.palette import decode_palette_png

    da, db = _tree_digest(a), _tree_digest(b)
    assert set(da) == set(db), (set(da) ^ set(db))
    for k in sorted(da):
        if da[k] == db[k]:
            continue
        if k.endswith(".npy"):
            x, y = np.load(a / k), np.load(b / k)
            assert np.issubdtype(x.dtype, np.floating), f"integer npy differs: {k}"
            np.testing.assert_allclose(x, y, atol=float_atol, rtol=0, err_msg=k)
        else:
            assert k.endswith(".png"), f"unexpected artifact differs: {k}"
            x, y = decode_palette_png(a / k), decode_palette_png(b / k)
            frac = (x != y).mean()
            assert frac <= png_flip_frac, f"{k}: {frac:.2%} pixels differ"


def _cfg(mesh_shape):
    cfg = Config()
    cfg.mesh.shape = mesh_shape
    cfg.mosaic.patch_size = 32
    cfg.mosaic.batch_size = 4
    cfg.mosaic.epochs = 1
    cfg.mosaic.tta = False
    cfg.seg.patch_size = 64
    cfg.seg.tta = False
    # same global batch on both meshes (already a multiple of 8) so the only
    # difference between runs is the sharding
    cfg.infer.batch_size = 8
    cfg.infer.tta = False
    cfg.revise.infer_size = 32
    cfg.cam.crop_size = 32
    return cfg


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    """Tiny synthetic dataset + one stage-2 checkpoint shared by the tests."""
    from pistoseg_tpu.data.mosaic import MosaicSynthesizer
    from pistoseg_tpu.core.config import DATASET_PROFILES
    from pistoseg_tpu.stages.stage1_split import split_images
    from pistoseg_tpu.stages.stage2_mosaic import train_stage2

    root = tmp_path_factory.mktemp("mdinfer")
    train = root / "train"
    make_training_patches(train, "wsss4luad", n_per_class=3, size=64)
    big = make_big_eval_set(root / "valid", "wsss4luad", n_images=2, size=96)

    profile = DATASET_PROFILES["wsss4luad"]
    synth = MosaicSynthesizer(train, profile, patch_num=2, tile_size=16)
    mosaic_dir = root / "mosaic"
    synth.write_range(mosaic_dir, 0, 8)

    patches = root / "val_patches"
    split_images(Config(), big, patches, patch_size=64, stride=32, scales=(1.0,))

    cfg = _cfg((1,))
    log_dir = root / "s2"
    train_stage2(cfg, str(mosaic_dir), val_data=None, log_dir=str(log_dir),
                 max_steps_per_epoch=2)
    return {"root": root, "train": train, "big": big, "patches": patches,
            "ckpt": log_dir / "checkpoints"}


def test_stage3_sharded_artifacts_identical(setup, tmp_path):
    from pistoseg_tpu.stages.stage3_infer_pmask import infer_stage3

    outs = {}
    for shape in ((1,), (8,)):
        out = tmp_path / f"pseudo_{shape[0]}"
        r = infer_stage3(_cfg(shape), str(setup["train"]), str(setup["ckpt"]),
                         str(out), limit=6)
        assert r["patches"] == 6
        outs[shape] = out
    _assert_trees_identical(outs[(1,)], outs[(8,)])
    # artifact contract intact under sharding
    arr = np.load(sorted((outs[(8,)] / "logits_32x32").glob("*.npy"))[0])
    assert arr.shape == (3, 32, 32)


def test_stage5_test_sharded_artifacts_identical(setup, tmp_path):
    from pistoseg_tpu.stages.stage5_test import test_stage5

    res = {}
    for shape in ((1,), (8,)):
        out = tmp_path / f"out_{shape[0]}"
        m = test_stage5(_cfg(shape), str(setup["patches"]), str(setup["ckpt"]),
                        save_dir=str(out), big_root=str(setup["big"]))
        res[shape] = (out, m)
    _assert_trees_identical(res[(1,)][0], res[(8,)][0])
    m1, m8 = res[(1,)][1], res[(8,)][1]
    # metrics come from argmax predictions; bf16 reassociation noise can in
    # principle flip a near-tied pixel, so allow a hair of slack
    for k in ("patch_miou", "patch_fwiou", "mask_miou"):
        assert m1[k] == pytest.approx(m8[k], abs=1e-3), k


def test_stage4b_and_stage0b_sharded_artifacts_identical(setup, tmp_path):
    """ResNet38d-family stages: one tiny stage-4 train + stage-0 train, then
    1-dev vs 8-dev inference/export compared (single test: the backbone
    compile dominates, share it)."""
    from pistoseg_tpu.stages.stage0_cam import train_stage0
    from pistoseg_tpu.stages.stage0_export_cam import export_cams
    from pistoseg_tpu.stages.stage4_revise import train_stage4
    from pistoseg_tpu.stages.stage4b_infer_revise import infer_stage4b

    train = setup["train"]
    pm, cm = tmp_path / "pmask", tmp_path / "cam"
    make_stage4_artifacts(train, pm, cm)

    cfg = _cfg((1,))
    cfg.revise.batch_size = 2
    cfg.revise.epochs = 1
    cfg.revise.train_size = 32
    r4 = train_stage4(cfg, str(train), str(pm), str(cm),
                      log_dir=str(tmp_path / "s4"), max_steps_per_epoch=1,
                      trust_inputs=True)
    s4_ckpt = r4["checkpoint_dir"]

    outs = {}
    for shape in ((1,), (8,)):
        out = tmp_path / f"refine_{shape[0]}"
        r = infer_stage4b(_cfg(shape), str(train), str(pm), str(cm), s4_ckpt,
                          out_dir=str(out), limit=6, trust_inputs=True)
        assert r["patches"] == 6
        outs[shape] = out
    _assert_trees_identical(outs[(1,)], outs[(8,)])

    cfg.cam.batch_size = 2
    cfg.cam.epochs = 1
    r0 = train_stage0(cfg, str(train), log_dir=str(tmp_path / "s0"),
                      max_steps_per_epoch=1)
    s0_ckpt = r0["checkpoint_dir"]
    cams = {}
    for shape in ((1,), (8,)):
        out = tmp_path / f"CAM_{shape[0]}"
        r = export_cams(_cfg(shape), str(train), s0_ckpt, str(out), limit=2)
        assert r["cams"] == 2
        cams[shape] = out
    for p in sorted(cams[(1,)].glob("*.npy")):
        a = np.load(p)
        b = np.load(cams[(8,)] / p.name)
        # CAM canvases accumulate on the default device either way; the
        # sharded crop forward carries a few bf16 ULPs of reassociation
        # noise across local batch shapes (normalized CAMs are in [0,1])
        np.testing.assert_allclose(a, b, atol=1e-2, rtol=0, err_msg=p.name)
