"""Full five-stage pipeline driver for the golden regression harness.

Drives the reference's complete staging (``/root/reference/run.sh:42-64``:
classification train → CAM export → mosaic synthesis/split → mosaic
segmentation train → pseudo-mask inference → RFM revise train → revised-mask
inference → precise segmentation train → test) as ONE chain on a tiny
synthetic dataset, where every stage consumes the PREVIOUS stage's real
on-disk outputs with completion manifests enforced end-to-end
(``trust_inputs`` stays False throughout — the lineage machinery in
``stage4_revise.py``/``stage4b_infer_revise.py``/``stage5_train.py`` runs
for real).

Shared between ``tests/test_full_chain.py`` (heavy lane, 8-virtual-CPU
harness) and ``scripts/run_chain_tpu.py`` (the same chain on the real chip).
"""

from __future__ import annotations

import hashlib
from pathlib import Path

from pistoseg_tpu.core.config import Config

from util_synthetic import make_big_eval_set, make_training_patches


def chain_cfg(mesh_shape=(1,), dataset: str = "wsss4luad") -> Config:
    """Tiny-shape config used by every stage of the chain (one config tree
    end-to-end, like the reference's single run.sh environment)."""
    cfg = Config()
    cfg.dataset = dataset
    cfg.mesh.shape = tuple(mesh_shape)
    # stage 0: classifier (crop 32 over 64-pixel patches)
    cfg.cam.batch_size = 4
    cfg.cam.epochs = 1
    cfg.cam.crop_size = 32
    # stage 1: synthesis (8 mosaics, in-process so PRNG stays seed-pinned)
    cfg.synth.num_images = 8
    cfg.synth.num_workers = 1
    # stage 2: mosaic segmentation at the mosaic's native 32 px
    cfg.mosaic.patch_size = 32
    cfg.mosaic.batch_size = 4
    cfg.mosaic.epochs = 1
    cfg.mosaic.tta = False
    # stage 4: RFM revise
    cfg.revise.batch_size = 2
    cfg.revise.epochs = 1
    cfg.revise.train_size = 32
    cfg.revise.infer_size = 32
    # stage 5: precise segmentation at the training patches' native 64 px
    cfg.seg.patch_size = 64
    cfg.seg.batch_size = 4
    cfg.seg.epochs = 1
    cfg.seg.tta = False
    if dataset == "bcss":
        # tiny-variant: b0 keeps the BCSS chain's compile cost down; the
        # BCSS-specific surfaces under test are the digit grammar, the
        # no-background path and the per-patch stage-5-test branch
        cfg.seg.encoder = "efficientnet-b0"
    # all inference stages
    cfg.infer.batch_size = 4
    cfg.infer.tta = False
    return cfg


def run_full_chain(root: str | Path, mesh_shape=(1,), steps: int = 2,
                   dataset: str = "wsss4luad") -> dict:
    """Run stage0 → 0b → 1 → 2 → 3 → 4 → 4b → 5 → 5-test; return every
    stage's result dict plus the artifact paths for contract checks."""
    from pistoseg_tpu.stages.stage0_cam import train_stage0
    from pistoseg_tpu.stages.stage0_export_cam import export_cams
    from pistoseg_tpu.stages.stage1_split import split_images
    from pistoseg_tpu.stages.stage1_synthesize import synthesize
    from pistoseg_tpu.stages.stage2_mosaic import train_stage2
    from pistoseg_tpu.stages.stage3_infer_pmask import infer_stage3
    from pistoseg_tpu.stages.stage4_revise import train_stage4
    from pistoseg_tpu.stages.stage4b_infer_revise import infer_stage4b
    from pistoseg_tpu.stages.stage5_test import test_stage5
    from pistoseg_tpu.stages.stage5_train import train_stage5

    cfg = chain_cfg(mesh_shape, dataset)
    root = Path(root)

    # --- synthetic dataset (the chain's only hand-made inputs) -------------
    train = root / "train"
    make_training_patches(train, dataset, n_per_class=3, size=64)
    big_val = make_big_eval_set(root / "valid", dataset, n_images=2,
                                size=96, seed=1)
    big_test = make_big_eval_set(root / "test", dataset, n_images=2,
                                 size=96, seed=3)

    # --- stage 0: OEEM classifier (run.sh:44 → OEEM train.py) --------------
    r0 = train_stage0(cfg, str(train), log_dir=str(root / "logs/s0"),
                      max_steps_per_epoch=steps)

    # --- stage 0b: CAM export (run.sh:52 → prepare_seg_inputs.py) ----------
    cam_dir = root / "CAM"
    r0b = export_cams(cfg, str(train), r0["checkpoint_dir"], str(cam_dir))

    # --- stage 1: mosaic synthesis + val/test splits (run.sh:42,8) ---------
    mosaic = root / "mosaic"
    r1 = synthesize(cfg, str(train), str(mosaic))
    val_patches = root / "val_patches"
    split_images(cfg, str(big_val), str(val_patches), patch_size=32, stride=16)
    test_patches = root / "test_patches"
    split_images(cfg, str(big_test), str(test_patches), patch_size=64, stride=32)

    # --- stage 2: mosaic segmentation train (run.sh:15-17) -----------------
    s2_log = root / "logs/s2"
    r2 = train_stage2(cfg, str(mosaic), val_data=str(val_patches),
                      val_big_root=str(big_val), log_dir=str(s2_log),
                      max_steps_per_epoch=steps)
    s2_ckpt = s2_log / "checkpoints"

    # --- stage 3: pseudo-mask inference (run.sh:19) -------------------------
    pseudo = root / "pseudo"
    r3 = infer_stage3(cfg, str(train), str(s2_ckpt), str(pseudo))

    # --- stage 4: RFM revise train (run.sh:21) — manifests ENFORCED --------
    r4 = train_stage4(cfg, str(train), str(pseudo / "logits_32x32"),
                      str(cam_dir), log_dir=str(root / "logs/s4"),
                      max_steps_per_epoch=steps)

    # --- stage 4b: revised-mask inference (run.sh:23) ----------------------
    refine = root / "refine"
    r4b = infer_stage4b(cfg, str(train), str(pseudo / "logits_32x32"),
                        str(cam_dir), r4["checkpoint_dir"],
                        out_dir=str(refine))

    # --- stage 5: precise segmentation train (run.sh:31) -------------------
    r5 = train_stage5(cfg, str(train), str(refine / "cam"),
                      log_dir=str(root / "logs/s5"),
                      max_steps_per_epoch=steps)

    # --- stage 5-test (run.sh:33-38) ----------------------------------------
    metrics = test_stage5(cfg, str(test_patches), r5["checkpoint_dir"],
                          save_dir=str(root / "test_out"),
                          big_root=str(big_test))

    return {
        "cfg": cfg, "root": root,
        "train": train, "big_val": big_val, "big_test": big_test,
        "cam_dir": cam_dir, "mosaic": mosaic,
        "val_patches": val_patches, "test_patches": test_patches,
        "s2_ckpt": s2_ckpt, "pseudo": pseudo, "refine": refine,
        "test_out": root / "test_out",
        "r0": r0, "r0b": r0b, "r1": r1, "r2": r2, "r3": r3,
        "r4": r4, "r4b": r4b, "r5": r5, "metrics": metrics,
    }


def artifact_digests(chain: dict) -> dict:
    """sha256 per emitted artifact file (.npy/.png only — manifests and
    checkpoint metadata embed nothing we want to pin), keyed by a stable
    stage-relative name.  Pins every intermediate bit-exactly."""
    out = {}
    for label, base in (
        ("cam", chain["cam_dir"]),
        ("pseudo", chain["pseudo"]),
        ("refine", chain["refine"]),
        ("test_out", chain["test_out"]),
    ):
        base = Path(base)
        for p in sorted(base.rglob("*")):
            if p.is_file() and p.suffix in (".npy", ".png"):
                key = f"{label}/{p.relative_to(base)}"
                out[key] = hashlib.sha256(p.read_bytes()).hexdigest()
    return out


def golden_payload(chain: dict) -> dict:
    """The seed-pinned values the regression test locks (metrics to 1e-6,
    artifacts bit-exact)."""
    m = chain["metrics"]
    metrics = {
        "stage2_best_mask_miou": float(chain["r2"]["best_metric"]),
        "stage5_patch_miou": float(m["patch_miou"]),
        "stage5_patch_fwiou": float(m["patch_fwiou"]),
    }
    if "mask_miou" in m:   # BCSS's per-patch branch has no stitched mask
        metrics["stage5_mask_miou"] = float(m["mask_miou"])
    return {
        "metrics": metrics,
        "counts": {
            "stage0b_cams": chain["r0b"]["cams"],
            "stage3_patches": chain["r3"]["patches"],
            "stage4b_patches": chain["r4b"]["patches"],
        },
        "digests": artifact_digests(chain),
    }
