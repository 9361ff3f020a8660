"""Stage-5 test: final evaluation + mask emission.

TPU-native rebuild of ``segmentation_test.py``: load the stage-5 best
checkpoint (its stored config merged under CLI overrides,
``segmentation_test.py:95-99``); forward all test patches (optional d4
TTA); patch-level mIoU; for WSSS4LUAD the multi-scale overlap stitch to
big masks with the known-background override (``mask_pred[gt == 3] = 3``,
``:206-208``) and palette PNG emission; for BCSS per-patch argmax +
direct save + patch-level metrics (``:228-250``).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pistoseg_tpu.core.checkpoint import CheckpointManager
from pistoseg_tpu.core.config import Config
from pistoseg_tpu.core.logging import MetricsLogger, console_metric_block
from pistoseg_tpu.data.datasets import EvalPatchDataset
from pistoseg_tpu.data.labels import parse_patch_name
from pistoseg_tpu.metrics.miou import MIoUAccumulator
from pistoseg_tpu.models.factory import create_segmentation_model
from pistoseg_tpu.ops.augment import imagenet_normalize
from pistoseg_tpu.ops.palette import decode_palette_png, encode_palette_png
from pistoseg_tpu.ops.stitch import CanvasStitcher
from pistoseg_tpu.ops.tta import d4_forward
from pistoseg_tpu.stages.common import native_size_map, parse_cli


def test_stage5(
    cfg: Config,
    test_data: str,
    ckpt_dir: str,
    save_dir: Optional[str] = None,
    big_root: Optional[str] = None,
) -> Dict:
    profile = cfg.profile
    sc = cfg.seg
    num_classes = profile.num_classes

    ckpt = CheckpointManager(Path(ckpt_dir))
    name = "best" if ckpt.exists("best") else "last"
    meta = ckpt.metadata(name)
    stored = meta.get("config", {})
    # reference merge order: checkpoint hparams are loaded, then CLI args
    # overwrite them (segmentation_test.py:95-99) — so the active config
    # wins; the stored section is informational/fallback only.  The saved
    # stage name tells us which config section produced the weights.
    stage = stored.get("mosaic") if meta.get("stage") == "stage2" else stored.get("seg")
    model_name = sc.model
    encoder = sc.encoder
    user_set = getattr(cfg, "cli_overridden", frozenset())
    if stage and "seg.model" not in user_set:
        # not user-specified: adopt the producing stage's architecture
        # (explicitly requesting the default on the CLI now sticks)
        model_name = stage.get("model", model_name)
    if stage and "seg.encoder" not in user_set:
        encoder = stage.get("encoder", encoder)

    act_dtype = jnp.bfloat16 if sc.precision == "bf16" else jnp.float32
    model = create_segmentation_model(model_name, encoder, num_classes,
                                      sc.decoder_attention, dtype=act_dtype)
    tree = ckpt.restore(name)
    variables = {"params": tree["params"], "batch_stats": tree["batch_stats"]}
    from pistoseg_tpu.stages.common import make_infer_forward

    # data-parallel over the mesh (VERDICT r3 #4): replicated weights,
    # batch sharded; artifacts are device-count-invariant (locked by
    # tests/test_multidevice_infer.py)
    from pistoseg_tpu.parallel.mesh import (
        batch_sharding, mesh_batch_loader, replicated)
    from pistoseg_tpu.stages.common import stage_mesh

    mesh = stage_mesh(cfg)
    repl, data = replicated(mesh), batch_sharding(mesh)
    fwd, prep = make_infer_forward(model, variables)
    if sc.tta:
        run_fwd = lambda v, p, imgs: jax.nn.softmax(d4_forward(  # noqa: E731
            lambda b: fwd(v, p, b), imagenet_normalize(imgs)), axis=-1)
    else:
        run_fwd = lambda v, p, imgs: jax.nn.softmax(fwd(  # noqa: E731
            v, p, imagenet_normalize(imgs)), axis=-1)
    forward_full = jax.jit(run_fwd, in_shardings=(repl, repl, data),
                           out_shardings=data)
    variables = jax.device_put(variables, repl)
    prep = jax.device_put(prep, repl)

    big_root = big_root or str(Path(test_data).parent)
    natives = native_size_map(big_root)

    loader = mesh_batch_loader(EvalPatchDataset(test_data, sc.patch_size),
                               cfg.infer.batch_size, mesh)
    patch_acc = MIoUAccumulator(num_classes)
    stitcher = CanvasStitcher(num_classes)
    bcss_outputs = []

    for batch in loader.epoch(0):
        probs = np.asarray(forward_full(
            variables, prep, jax.device_put(batch["image"], data)))
        pred = probs.argmax(-1).astype(np.uint8)
        for j, ok in enumerate(batch["valid"]):
            if not ok:
                continue
            oh, ow = (int(v) for v in batch["orig_hw"][j])
            # reference accumulates the FULL padded patch (test_iou(output,
            # mask_batch) BEFORE any crop, segmentation_test.py:139) — the
            # reflect-padded gt rows are real class values and count; this
            # matches stitched_validation so both repo paths agree.
            patch_acc.add(pred[j], batch["mask"][j])
            if profile.name == "wsss4luad":
                try:
                    slide, scale, y, xpos = parse_patch_name(batch["name"][j])
                except ValueError:
                    continue
                if slide in natives:
                    stitcher.add(slide, scale, natives[slide], probs[j], y, xpos,
                                 crop_hw=(oh, ow))
            else:
                bcss_outputs.append((batch["name"][j], pred[j][:oh, :ow]))

    out_metrics: Dict[str, float] = {
        "patch_miou": patch_acc.miou(),
        "patch_fwiou": patch_acc.fwiou(),
    }
    for i, v in enumerate(patch_acc.tissue_iou()):
        out_metrics[f"patch_iou_{profile.class_names[i]}"] = float(v)

    save = Path(save_dir) if save_dir else Path(ckpt_dir).parent / "test"
    (save / "mask").mkdir(parents=True, exist_ok=True)

    if profile.name == "wsss4luad" and stitcher.slides():
        big_acc = MIoUAccumulator(num_classes)
        for slide in stitcher.slides():
            merged = stitcher.finalize(slide)
            gt = decode_palette_png(Path(big_root) / "mask" / f"{slide}.png")
            big_acc.add(merged.argmax(-1), gt)
            pred_big = merged.argmax(-1).astype(np.uint8)
            pred_big[gt == profile.bg_class] = profile.bg_class  # known background
            encode_palette_png(pred_big, profile.palette, save / "mask" / f"{slide}.png")
        out_metrics["mask_miou"] = big_acc.miou()
        out_metrics["mask_fwiou"] = big_acc.fwiou()
        for i, v in enumerate(big_acc.tissue_iou()):
            out_metrics[f"mask_iou_{profile.class_names[i]}"] = float(v)
    else:
        for name_, mask_pred in bcss_outputs:
            encode_palette_png(mask_pred, profile.palette, save / "mask" / name_)

    console_metric_block("Stage-5 test", out_metrics)
    MetricsLogger(save, "stage5_test").log(out_metrics)
    return out_metrics


def main(argv=None):
    cfg, extras = parse_cli(argv)
    return test_stage5(
        cfg,
        test_data=extras["test_data"],
        ckpt_dir=extras["ckpt_dir"],
        save_dir=extras.get("save_dir"),
        big_root=extras.get("big_root"),
    )


if __name__ == "__main__":
    main()
