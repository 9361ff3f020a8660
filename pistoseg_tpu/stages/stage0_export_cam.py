"""Stage 0b: export 32×32 training CAMs for stage 4.

TPU-native rebuild of ``OEEM/classification/prepare_seg_inputs.py``: for
every training patch, multiscale sliding-window CAM ensemble at the
dataset's scales/stride (``configuration_*.yml``), per-scale canvas
normalize → native-size resize → sum over scales → /len(scales) →
bilinear downsample to 32×32 → save ``[C, 32, 32]`` ``.npy``
(``prepare_seg_inputs.py:93-138``).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np

from pistoseg_tpu.core.checkpoint import CheckpointManager
from pistoseg_tpu.core.config import Config
from pistoseg_tpu.data.oeem import CropListDataset
from pistoseg_tpu.models.wide_resnet import WideResNetClassifier
from pistoseg_tpu.ops.cam import cam_to_artifact
from pistoseg_tpu.stages.common import parse_cli, stage_mesh
from pistoseg_tpu.stages.stage0_cam import generate_cams_for_split


def export_cams(
    cfg: Config,
    train_data: str,
    ckpt_dir: str,
    out_dir: str,
    limit: Optional[int] = None,
    chunk: Optional[tuple] = None,
) -> Dict:
    """Export training CAMs.

    ``chunk=(start, stop)`` exports only ``paths[start:stop]`` of the full
    (unlimited) export, skipping stems whose ``.npy`` already exists —
    the unit the full-budget harness runs in its own subprocess so the
    tunneled TPU client's per-upload host-staging leak (measured ~100% of
    uploaded bytes retained, round-5 probe) dies with the worker instead
    of accumulating across all 10k images.  The skip-if-current check
    runs on the first chunk; the chunk that reaches the end writes the
    manifest for the WHOLE artifact tree.  ``chunk=None`` is the original
    single-call behavior (tests, small runs).
    """
    profile = cfg.profile
    model = WideResNetClassifier(num_classes=profile.num_classes)
    ckpt = CheckpointManager(ckpt_dir)
    name = "best" if ckpt.exists("best") else "last"

    from pistoseg_tpu.core.manifest import hash_tree, skip_if_current, write_manifest

    out = Path(out_dir)
    manifest_inputs = {
        "train_data": hash_tree(train_data, "*.png", limit=256),
        "checkpoint": hash_tree(Path(ckpt_dir) / f"{name}.meta.json"),
        "limit": str(None if chunk is not None else limit),
    }
    if (chunk is None or chunk[0] == 0) and skip_if_current(
            out, "stage0_export", manifest_inputs, cfg.to_dict()):
        return {"cams": -1, "out_dir": str(out), "checkpoint": name,
                "skipped": True}

    tree = ckpt.restore(name)
    variables = {"params": tree["params"], "batch_stats": tree["batch_stats"]}

    # materialize_crops=False: windows are extracted ON DEVICE from the
    # once-uploaded scaled image (generate_cams_for_split, VERDICT r4 #7)
    crop_ds = CropListDataset(
        train_data, profile, cfg.cam.crop_size, profile.cam_stride,
        profile.cam_scales, materialize_crops=False,
    )
    finalize = True
    if chunk is not None:
        start, stop = chunk
        finalize = stop >= len(crop_ds.paths)
        chunk_paths = crop_ds.paths[start:stop]

        # chunk resume: a previous worker's completed artifacts are kept —
        # but only after a load check, since a killed worker can leave a
        # truncated .npy behind
        def _done(stem: str) -> bool:
            fp = out / f"{stem}.npy"
            try:
                a = np.load(fp)
                return (a.shape[0] == profile.num_classes
                        and bool(np.isfinite(a).all()))
            except Exception:
                return False

        crop_ds.paths = [p for p in chunk_paths if not _done(Path(p).stem)]
    elif limit is not None:
        crop_ds.paths = crop_ds.paths[:limit]

    out.mkdir(parents=True, exist_ok=True)
    n = 0

    # Fetch with a lag instead of per image: the per-image blocking
    # np.asarray drains the ENTIRE async dispatch pipeline every image,
    # which on a high-latency relay serializes each image's ~30-dispatch
    # upload→extract→forward→canvas ladder (measured 0.48 img/s vs the
    # chip's ~8 img/s device rate on the 2026-08-21 tunnel).  Resizing to
    # the [32,32] artifact ON DEVICE first (the same `resize` jit
    # cam_to_artifact runs) and holding a small deque of un-fetched
    # (C-last 32² f32) results lets image i's download overlap image
    # i+1..i+DEPTH's dispatches.  Fetch ORDER is the only change — the
    # math and therefore the artifact bytes are identical.
    from collections import deque

    import jax.numpy as jnp

    from pistoseg_tpu.ops.resize import resize

    pending: deque = deque()

    def _drain_one():
        nonlocal n
        stem_i, small_dev = pending.popleft()
        small = np.asarray(small_dev)
        np.save(out / f"{stem_i}.npy",
                np.ascontiguousarray(small.transpose(2, 0, 1)))
        n += 1

    # crop forwards run data-parallel over the mesh (the reference
    # DataParallels this export, ``prepare_seg_inputs.py:78``)
    for stem, _hw, cam, _label in generate_cams_for_split(
        model, variables, crop_ds, profile.num_classes, profile=profile,
        mesh=stage_mesh(cfg),
    ):
        # ensemble_scales already divides by len(scales) — the stored
        # artifact equals the prepare_seg_inputs.py:134 sum/len contract
        pending.append(
            (stem, resize(jnp.asarray(cam, jnp.float32), (32, 32), "linear")))
        if len(pending) > 4:
            _drain_one()
    while pending:
        _drain_one()

    if chunk is not None:
        n = len(list(out.glob("*.npy")))  # manifest counts the whole tree
    if finalize:
        write_manifest(
            out, "stage0_export",
            inputs=manifest_inputs,
            config=cfg.to_dict(),
            outputs={"cams": n},
        )
    return {"cams": n, "out_dir": str(out), "checkpoint": name,
            "finalized": finalize}


def main(argv=None):
    cfg, extras = parse_cli(argv)
    return export_cams(
        cfg,
        train_data=extras["train_data"],
        ckpt_dir=extras["ckpt_dir"],
        out_dir=extras.get("out_dir", "data/CAM/train"),
        limit=int(extras["limit"]) if "limit" in extras else None,
    )


if __name__ == "__main__":
    main()
