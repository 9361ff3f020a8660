"""Stage 2: preliminary segmentation training on synthetic mosaics.

TPU-native rebuild of ``mosaic_train.py`` + ``models/mosaic_module.py``:
UNet++/EfficientNet-b0(scse) trained with multiclass Dice
(ignore_index = bg for WSSS4LUAD) under a data-parallel jit over the mesh;
augmentation (RRC/flips/SSR/optical-distortion/normalize) runs on device
inside the training step; validation is the multi-scale overlap-stitched
big-mask mIoU; best checkpoint selected by ``mask_miou`` (the reference's
``validation_miou_mask_epoch`` monitor, ``mosaic_train.py:121-130``) with
save_last; post-fit the best checkpoint is re-validated with d4 TTA
(``mosaic_train.py:194-206``).

Usage::

    python -m pistoseg_tpu.stages.stage2_mosaic \
        --dataset=wsss4luad --mosaic_data=data/wsss4luad/mosaic \
        --val_data=data/wsss4luad/validation/patches --log_dir=logs/stage2
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from pistoseg_tpu.core.checkpoint import CheckpointManager
from pistoseg_tpu.core.config import Config
from pistoseg_tpu.core.logging import MetricsLogger, console_metric_block
from pistoseg_tpu.core.prng import fold_in_str, root_key
from pistoseg_tpu.data.datasets import EvalPatchDataset, MosaicDataset
from pistoseg_tpu.data.loader import BatchLoader
from pistoseg_tpu.losses.segmentation import cross_entropy_loss, dice_loss
from pistoseg_tpu.models.factory import create_segmentation_model
from pistoseg_tpu.ops.augment import AugmentConfig, augment_batch
from pistoseg_tpu.stages.common import (
    apply_pretrained,
    parse_cli,
    stage_mesh,
    stitched_validation,
)
from pistoseg_tpu.train.loop import Trainer, make_train_step
from pistoseg_tpu.train.optim import adamw_exponential
from pistoseg_tpu.train.state import create_train_state


def build_loss_fn(model, profile, stage_cfg, aug_cfg: AugmentConfig):
    ignore = profile.loss_ignore_index
    use_dice = stage_cfg.loss == "dice"
    act_dtype = jnp.bfloat16 if stage_cfg.precision == "bf16" else jnp.float32

    # fp32 training keeps the warp einsums in f32 so the augmented batch is
    # deterministic across device counts (see AugmentConfig.warp_dtype)
    if stage_cfg.precision != "bf16":
        aug_cfg = aug_cfg._replace(warp_dtype="f32")

    # space-to-depth training forward for the UNet++ decoder's low-channel
    # columns (VERDICT r3 #3): exact math (parity-locked in
    # tests/test_unetpp_fast.py), ~4× the MXU output lanes through forward
    # AND backward on the 224² column
    use_s2d_train = (getattr(stage_cfg, "s2d_train", False)
                     and getattr(model, "s2d_threshold", 0) > 0)
    if use_s2d_train:
        from pistoseg_tpu.models.unetpp_fast import fast_train_apply

    def loss_fn(params, batch_stats, batch, rng):
        aug_key, path_key, drop_key = jax.random.split(rng, 3)
        images, masks = augment_batch(aug_key, batch["image"], batch["mask"], aug_cfg)
        images = images.astype(act_dtype)
        rngs = {"droppath": path_key, "dropout": drop_key}
        if use_s2d_train:
            out, new_bs = fast_train_apply(model, params, batch_stats,
                                           images, rngs=rngs)
        else:
            out, upd = model.apply(
                {"params": params, "batch_stats": batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
                rngs=rngs,
            )
            new_bs = upd["batch_stats"]
        out = out.astype(jnp.float32)
        # padded tail samples contribute nothing
        vmask = batch["valid"][:, None, None]
        masks = jnp.where(vmask, masks, ignore if ignore is not None else 255)
        eff_ignore = ignore if ignore is not None else 255
        if use_dice:
            loss = dice_loss(out, masks, ignore_index=eff_ignore)
        else:
            loss = cross_entropy_loss(out, masks, ignore_index=eff_ignore)
        return loss, ({}, new_bs)

    return loss_fn


def train_stage2(
    cfg: Config,
    mosaic_data: str,
    val_data: Optional[str] = None,
    val_big_root: Optional[str] = None,
    log_dir: str = "logs/stage2",
    max_steps_per_epoch: Optional[int] = None,
    shard_cache: Optional[str] = None,
    resume: bool = False,
    pretrained: Optional[str] = None,
) -> Dict:
    profile = cfg.profile
    sc = cfg.mosaic
    mesh = stage_mesh(cfg)
    num_classes = profile.num_classes

    act_dtype = jnp.bfloat16 if sc.precision == "bf16" else jnp.float32
    model = create_segmentation_model(sc.model, sc.encoder, num_classes,
                                      sc.decoder_attention, dtype=act_dtype)
    train_ds = MosaicDataset(mosaic_data)
    if shard_cache is not None:
        # pre-decoded native shard cache for the hot loop (built once,
        # keyed by a content manifest of the mosaic directory)
        from pistoseg_tpu.core.manifest import hash_tree, stage_is_current, write_manifest
        from pistoseg_tpu.data.loader import ShardBatchLoader
        from pistoseg_tpu.data.shardio import ShardPairDataset, build_image_mask_cache

        cache_dir = Path(shard_cache)
        inputs = {"mosaic": hash_tree(mosaic_data, "img/*.png", limit=64)}
        if not stage_is_current(cache_dir, "shard_cache", inputs, {}):
            build_image_mask_cache(train_ds, cache_dir / "mosaic")
            # hash_outputs=False: shard files are large (GBs on real data)
            # and the cache is keyed by its input manifest alone
            write_manifest(cache_dir, "shard_cache", inputs, {},
                           outputs={"records": len(train_ds)},
                           hash_outputs=False)
        loader = ShardBatchLoader(
            ShardPairDataset(cache_dir / "mosaic"), sc.batch_size,
            shuffle=True, seed=cfg.seed,
        )
    else:
        loader = BatchLoader(train_ds, sc.batch_size, shuffle=True, seed=cfg.seed)
    steps_per_epoch = len(loader) if max_steps_per_epoch is None else min(len(loader), max_steps_per_epoch)

    tx = adamw_exponential(sc.lr, sc.weight_decay, sc.lr_decay, steps_per_epoch)
    rng = fold_in_str(root_key(cfg.seed), "stage2")
    sample = jnp.zeros((sc.batch_size, sc.patch_size, sc.patch_size, 3),
                       jnp.bfloat16 if sc.precision == "bf16" else jnp.float32)
    state = create_train_state(model, rng, sample, tx)
    if pretrained:
        # ImageNet EfficientNet encoder init (smp encoder_weights='imagenet'
        # default, mosaic_module.py:79-86); decoder/head stay fresh
        state = apply_pretrained(state, pretrained, encoder_name=sc.encoder)

    aug_cfg = AugmentConfig(out_size=sc.patch_size, rrc_scale=(0.9, 1.0))
    train_step = make_train_step(build_loss_fn(model, profile, sc, aug_cfg), mesh)

    ckpt = CheckpointManager(Path(log_dir) / "checkpoints")
    logger = MetricsLogger(log_dir, "stage2")
    # experiment provenance (reference mosaic_train.py:85-117)
    from pistoseg_tpu.core.logging import snapshot_code
    snapshot_code(log_dir)
    cfg.save(Path(log_dir) / "config.json")

    def apply_eval(v, x):
        return model.apply(v, x, train=False)

    def validate(state, epoch):
        if val_data is None:
            return 0.0
        val_loader = BatchLoader(
            EvalPatchDataset(val_data, sc.patch_size), cfg.infer.batch_size
        )
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        def panel(img, gt, pred):
            from pistoseg_tpu.core.visualize import validation_panel
            logger.log_image(
                "val_panel", validation_panel(profile.palette, img, gt, pred),
                step=epoch,
            )

        metrics = stitched_validation(
            apply_eval, variables, val_loader, num_classes, val_big_root,
            tta=False, patch_size=sc.patch_size, panel_cb=panel, model=model,
        )
        console_metric_block(f"Stage-2 validation (epoch {epoch})", metrics)
        logger.log(dict(metrics, epoch=epoch))
        return metrics.get("mask_miou", metrics["patch_miou"])

    def checkpoint(state, epoch, metric, is_best):
        tree = {"params": state.params, "batch_stats": state.batch_stats}
        ckpt.save_best_last(tree, epoch, metric, is_best,
                            extra={"stage": "stage2", "config": cfg.to_dict()})
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
        checkpoint_fn=checkpoint,
        log_fn=lambda m: logger.log(m),
        rng=fold_in_str(root_key(cfg.seed), "stage2/train"),
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
    state = trainer.fit(state)
    ckpt.flush()   # all checkpoint bytes on disk before manifests hash them

    result = {"best_metric": trainer.best_metric, "best_epoch": trainer.best_epoch}
    # post-fit: best checkpoint + d4 TTA re-validation (mosaic_train.py:194-206)
    if val_data is not None and sc.tta and ckpt.exists("best"):
        tree = ckpt.restore("best", {"params": state.params, "batch_stats": state.batch_stats})
        best_state = state.replace(params=tree["params"], batch_stats=tree["batch_stats"])
        val_loader = BatchLoader(EvalPatchDataset(val_data, sc.patch_size), cfg.infer.batch_size)
        best_vars = {"params": best_state.params, "batch_stats": best_state.batch_stats}
        metrics = stitched_validation(
            apply_eval, best_vars, val_loader, num_classes, val_big_root,
            tta=True, patch_size=sc.patch_size, model=model,
        )
        console_metric_block("Stage-2 best + d4 TTA", metrics)
        logger.log(dict(metrics, tta=True))
        result["tta_metrics"] = metrics
    return result


def main(argv=None):
    cfg, extras = parse_cli(argv)
    return train_stage2(
        cfg,
        mosaic_data=extras["mosaic_data"],
        val_data=extras.get("val_data"),
        val_big_root=extras.get("val_big_root"),
        log_dir=extras.get("log_dir", "logs/stage2"),
        max_steps_per_epoch=(
            int(extras["max_steps_per_epoch"]) if "max_steps_per_epoch" in extras else None
        ),
        shard_cache=extras.get("shard_cache"),
        resume=extras.get("resume", "false").lower() in ("1", "true", "yes"),
        pretrained=extras.get("pretrained"),
    )


if __name__ == "__main__":
    main()
