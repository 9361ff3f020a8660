"""Stage 5: precise segmentation training on refined pseudo-masks.

TPU-native rebuild of ``segmentation_train.py`` +
``models/segmentation_module.py``: same scaffold as stage 2 but
UNet++/EfficientNet-b3, CrossEntropy(ignore_index=bg for WSSS4LUAD) on
real training images with ``refine/cam`` masks (``run.sh:31``), optional
CutMix (``segmentation_train.py:42-43``), identical stitched validation
and best/last checkpointing.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax.numpy as jnp

from pistoseg_tpu.core.checkpoint import CheckpointManager
from pistoseg_tpu.core.config import Config
from pistoseg_tpu.core.logging import MetricsLogger, console_metric_block
from pistoseg_tpu.core.prng import fold_in_str, root_key
from pistoseg_tpu.data.datasets import EvalPatchDataset, PseudoTrainDataset
from pistoseg_tpu.data.loader import BatchLoader
from pistoseg_tpu.models.factory import create_segmentation_model
from pistoseg_tpu.ops.augment import AugmentConfig
from pistoseg_tpu.stages.common import (
    apply_pretrained,
    parse_cli,
    stage_mesh,
    stitched_validation,
)
from pistoseg_tpu.stages.stage2_mosaic import build_loss_fn
from pistoseg_tpu.train.loop import Trainer, make_train_step
from pistoseg_tpu.train.optim import adamw_exponential
from pistoseg_tpu.train.state import create_train_state


def train_stage5(
    cfg: Config,
    train_data: str,
    mask_dir: str,
    val_data: Optional[str] = None,
    val_big_root: Optional[str] = None,
    log_dir: str = "logs/stage5",
    max_steps_per_epoch: Optional[int] = None,
    shard_cache: Optional[str] = None,
    resume: bool = False,
    pretrained: Optional[str] = None,
    trust_inputs: bool = False,
) -> Dict:
    profile = cfg.profile
    sc = cfg.seg
    mesh = stage_mesh(cfg)
    num_classes = profile.num_classes

    # mask_dir is refine/{cam,pmask,pcam} from stage 4b — refuse stale runs
    from pistoseg_tpu.core.manifest import check_upstream

    check_upstream(mask_dir, "stage4b", what="mask_dir", trust=trust_inputs)

    act_dtype = jnp.bfloat16 if sc.precision == "bf16" else jnp.float32
    model = create_segmentation_model(sc.model, sc.encoder, num_classes,
                                      sc.decoder_attention, dtype=act_dtype)
    train_ds = PseudoTrainDataset(
        train_data, mask_dir, profile, sc.patch_size,
        cutmix_prob=sc.cutmix_prob if sc.cutmix else 0.0, seed=cfg.seed,
    )
    if shard_cache is not None:
        # pre-decoded native shard cache for the hot loop (mirror of the
        # stage-2 path): at the reference's 15-epoch budget the per-epoch
        # double PNG decode (image + refined mask) otherwise outruns the
        # device step on a small host.  Cached images are uint8-rounded
        # (the dataset resizes to patch² in f32; ≤0.5/255 quantization
        # pre-normalization — below the augmentation noise floor); the
        # raw loader stays the bit-exact reference path.
        if sc.cutmix:
            raise ValueError("shard_cache is incompatible with cutmix "
                             "(host-side pair mixing cannot be pre-decoded)")
        from pistoseg_tpu.core.manifest import (
            hash_tree, stage_is_current, write_manifest)
        from pistoseg_tpu.data.loader import ShardBatchLoader
        from pistoseg_tpu.data.shardio import (
            ShardPairDataset, build_image_mask_cache)

        class _Quantized:
            def __init__(self, ds):
                self.ds = ds

            def __len__(self):
                return len(self.ds)

            def __getitem__(self, i):
                import numpy as np
                it = self.ds[i]
                return {"image": np.clip(np.rint(it["image"]), 0, 255
                                         ).astype(np.uint8),
                        "mask": it["mask"]}

        cache_dir = Path(shard_cache)
        inputs = {"train_data": hash_tree(train_data, "*.png", limit=64),
                  "mask_dir": hash_tree(mask_dir, "*.png", limit=64),
                  "patch_size": str(sc.patch_size)}
        if not stage_is_current(cache_dir, "stage5_shard_cache", inputs, {}):
            build_image_mask_cache(_Quantized(train_ds), cache_dir / "refine")
            write_manifest(cache_dir, "stage5_shard_cache", inputs, {},
                           outputs={"records": len(train_ds)},
                           hash_outputs=False)
        loader = ShardBatchLoader(
            ShardPairDataset(cache_dir / "refine"), sc.batch_size,
            shuffle=True, seed=cfg.seed,
        )
    else:
        loader = BatchLoader(train_ds, sc.batch_size, shuffle=True, seed=cfg.seed)
    steps_per_epoch = len(loader) if max_steps_per_epoch is None else min(len(loader), max_steps_per_epoch)

    tx = adamw_exponential(sc.lr, sc.weight_decay, sc.lr_decay, steps_per_epoch)
    rng = fold_in_str(root_key(cfg.seed), "stage5")
    sample = jnp.zeros((sc.batch_size, sc.patch_size, sc.patch_size, 3),
                       jnp.bfloat16 if sc.precision == "bf16" else jnp.float32)
    state = create_train_state(model, rng, sample, tx)
    if pretrained:
        # ImageNet EfficientNet encoder init (smp default, mosaic_module.py:79-86)
        state = apply_pretrained(state, pretrained, encoder_name=sc.encoder)

    aug_cfg = AugmentConfig(out_size=sc.patch_size, rrc_scale=(0.9, 1.0))
    train_step = make_train_step(build_loss_fn(model, profile, sc, aug_cfg), mesh)

    ckpt = CheckpointManager(Path(log_dir) / "checkpoints")
    logger = MetricsLogger(log_dir, "stage5")
    from pistoseg_tpu.core.logging import snapshot_code
    snapshot_code(log_dir)
    cfg.save(Path(log_dir) / "config.json")
    def apply_eval(v, x):
        return model.apply(v, x, train=False)

    def validate(state, epoch):
        if val_data is None:
            return 0.0
        val_loader = BatchLoader(EvalPatchDataset(val_data, sc.patch_size), cfg.infer.batch_size)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        def panel(img, gt, pred):
            from pistoseg_tpu.core.visualize import validation_panel
            logger.log_image(
                "val_panel", validation_panel(profile.palette, img, gt, pred),
                step=epoch,
            )

        metrics = stitched_validation(
            apply_eval, variables, val_loader, num_classes, val_big_root,
            patch_size=sc.patch_size, panel_cb=panel, model=model,
        )
        console_metric_block(f"Stage-5 validation (epoch {epoch})", metrics)
        logger.log(dict(metrics, epoch=epoch))
        return metrics.get("mask_miou", metrics["patch_miou"])

    def checkpoint(state, epoch, metric, is_best):
        tree = {"params": state.params, "batch_stats": state.batch_stats}
        ckpt.save_best_last(tree, epoch, metric, is_best,
                            extra={"stage": "stage5", "config": cfg.to_dict()})
        ckpt.save_train_state(state, epoch, metric)

    def train_iter(epoch):
        for i, batch in enumerate(loader.epoch(epoch)):
            if max_steps_per_epoch is not None and i >= max_steps_per_epoch:
                break
            yield {k: batch[k] for k in ("image", "mask", "valid")}

    start_epoch, start_step = 0, 0
    if resume and ckpt.exists("train_state"):
        state, start_epoch, start_step = ckpt.restore_train_state(state)

    trainer = Trainer(
        train_step, sc.epochs, train_iter, mesh=mesh,
        validate_fn=validate if val_data else None,
        checkpoint_fn=checkpoint, log_fn=lambda m: logger.log(m),
        rng=fold_in_str(root_key(cfg.seed), "stage5/train"),
        start_epoch=start_epoch,
        start_step=start_step,
        items_per_batch=sc.batch_size,
        step_checkpoint_every=sc.checkpoint_every_steps,
        step_checkpoint_fn=lambda s, e, i: ckpt.save_train_state(
            s, e, step_in_epoch=i),
    )
    if resume and ckpt.exists("best"):
        bm = ckpt.metadata("best")
        trainer.best_metric = bm.get("metric", -float("inf"))
        trainer.best_epoch = bm.get("epoch", -1)
    trainer.fit(state)
    ckpt.flush()   # all checkpoint bytes on disk before manifests hash them
    return {"best_metric": trainer.best_metric, "best_epoch": trainer.best_epoch,
            "checkpoint_dir": str(ckpt.root)}


def main(argv=None):
    cfg, extras = parse_cli(argv)
    return train_stage5(
        cfg,
        train_data=extras["train_data"],
        mask_dir=extras["mask_dir"],
        val_data=extras.get("val_data"),
        val_big_root=extras.get("val_big_root"),
        log_dir=extras.get("log_dir", "logs/stage5"),
        max_steps_per_epoch=(
            int(extras["max_steps_per_epoch"]) if "max_steps_per_epoch" in extras else None
        ),
        shard_cache=extras.get("shard_cache"),
        resume=extras.get("resume", "false").lower() in ("1", "true", "yes"),
        pretrained=extras.get("pretrained"),
        trust_inputs=extras.get("trust_inputs", "false").lower() in ("1", "true", "yes"),
    )


if __name__ == "__main__":
    main()
