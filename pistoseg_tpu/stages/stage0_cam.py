"""Stage 0: OEEM multilabel classifier training.

TPU-native rebuild of ``OEEM/classification/train.py``: wideResNet
(ResNet38d trunk, b7 dilation 2, 5632-ch concat head) trained with
BCE-with-logits on filename multilabels; RandomResizedCrop(0.7–1)+flips
augmentation (on device); PolySGD(0.01, wd 1e-4); every ``test_every``
epochs a validation CAM pass computes mIoU over a labeled val split and
the best checkpoint is kept (``train.py:111-161``).
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
from pistoseg_tpu.core.prng import fold_in_str, root_key
from pistoseg_tpu.data.loader import BatchLoader
from pistoseg_tpu.data.oeem import CropListDataset, OriginPatchesDataset
from pistoseg_tpu.metrics.miou import MIoUAccumulator
from pistoseg_tpu.models.wide_resnet import WideResNetClassifier
from pistoseg_tpu.ops.augment import AugmentConfig, augment_batch
from pistoseg_tpu.ops.cam import (
    accumulate_scale_cam,
    cam_argmax_with_label_mask,
    ensemble_scales,
    normalize_cam,
)
from pistoseg_tpu.ops.palette import decode_palette_png
from pistoseg_tpu.ops.resize import resize
from pistoseg_tpu.stages.common import apply_pretrained, parse_cli, stage_mesh
from pistoseg_tpu.train.loop import Trainer, make_train_step
from pistoseg_tpu.train.optim import (
    WIDERESNET_MULTIPLIERS,
    poly_sgd_grouped,
    wideresnet_group_fn,
)
from pistoseg_tpu.train.state import create_train_state


def bce_with_logits(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    logits = logits.astype(jnp.float32)
    loss = jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(loss)


def build_loss_fn(model, aug_cfg: AugmentConfig):
    def loss_fn(params, batch_stats, batch, rng):
        images, _ = augment_batch(rng, batch["image"], None, aug_cfg)
        out, upd = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=True, mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        valid = jnp.asarray(batch["valid"]).astype(jnp.float32)[:, None]
        logits = out["logits"] * valid  # padded samples contribute target 0 vs logit 0
        target = jnp.asarray(batch["label"]) * valid
        loss = bce_with_logits(logits, target)
        return loss, ({}, upd["batch_stats"])

    return loss_fn


def generate_cams_for_split(
    model, variables, crop_ds: CropListDataset, num_classes: int,
    batch_cap: int = 32, use_label_mask: bool = True, profile=None,
    mesh=None,
):
    """Yield (stem, native_hw, ensembled CAM (H, W, C) DEVICE array, label)
    per image.

    Canvas math follows ``generate_CAM.py:13-102``: per scale → crop
    forward → bilinear to crop size → overlap-add → normalize → resize to
    native → sum over scales.  TPU-first (VERDICT r4 #7): the whole
    per-image pipeline runs on device — the padded scaled image is
    uploaded ONCE per scale (when ``crop_ds`` was built with
    ``materialize_crops=False``), windows are extracted on device, and
    the windows of ALL scales are batched into shared ``batch_cap`` crop
    forwards (the per-scale chunking it replaces padded every scale's
    ragged tail separately: 2.1× the forwards at the production 5-scale
    stride-56 geometry — 192 padded slots for 90 real windows vs 96 here).
    Crop forwards, overlap-add, normalize and the cross-scale ensemble
    never leave the chip; callers fetch only what they consume (the 32²
    artifact in stage 0b).  The previous design round-tripped every crop
    CAM through the host (~3× the crop pixels per image through the
    tunneled relay).  With ``mesh``, the crop forward runs data-parallel
    (window batch sharded on 'data'; the reference DataParallels this
    export, ``prepare_seg_inputs.py:78``).

    Value-exactness vs the host version (chain goldens unchanged): window
    extraction is pure slicing, the forward batch shape is the same
    ``batch_cap`` as before (eval-mode BN → per-sample independence, so
    batch composition cannot change a window's CAM), and the canvas ops
    are IEEE-identical ports (see ops/cam.py).
    """
    from pistoseg_tpu.ops.augment import normalize as _norm

    mean = profile.norm_mean if profile is not None else (0.485, 0.456, 0.406)
    std = profile.norm_std if profile is not None else (0.229, 0.224, 0.225)
    patch = crop_ds.patch_size
    # normalize fused into the forward + bilinear-to-crop-size fused after;
    # window chunks padded to batch_cap so exactly ONE forward shape ever
    # compiles (ragged tails would otherwise trigger a recompilation storm,
    # SURVEY.md §7.3-5)
    # variables passed as an ARGUMENT: closing over them would embed the
    # full parameter tree as constants in the compiled program (the remote
    # compile service rejects >100MB request bodies)
    forward_fn = lambda v, x: resize(  # noqa: E731
        model.apply(v, _norm(x, mean, std), train=False)["cam"],
        (patch, patch), method="linear")

    def extract_fn(img, ys, xs):
        # device window extraction from the once-uploaded scaled image
        def one(y, x):
            return jax.lax.dynamic_slice(img, (y, x, 0),
                                         (patch, patch, img.shape[-1]))

        return jax.vmap(one)(ys, xs)

    extract = jax.jit(extract_fn)
    if mesh is not None:
        from pistoseg_tpu.parallel.mesh import (
            batch_sharding, pad_to_multiple, replicated)

        repl, data = replicated(mesh), batch_sharding(mesh)
        batch_cap = pad_to_multiple(batch_cap, mesh.size)
        forward = jax.jit(forward_fn, in_shardings=(repl, data),
                          out_shardings=data)
        variables = jax.device_put(variables, repl)
        put = lambda x: jax.device_put(x, data)  # noqa: E731
        put_repl = lambda x: jax.device_put(x, repl)  # noqa: E731
    else:
        forward = jax.jit(forward_fn)
        put = jnp.asarray
        put_repl = jnp.asarray

    for i in range(len(crop_ds)):
        item = crop_ds[i]
        # 1) windows of every scale, on device, in scale-major order
        windows, counts = [], []
        for sc in item["scales"]:
            if "crops" in sc:           # host-materialized (tests/legacy)
                windows.append(put_repl(sc["crops"]))
            else:
                img_dev = put_repl(sc["scaled"])
                windows.append(extract(img_dev, put_repl(sc["ys"]),
                                       put_repl(sc["xs"])))
                # free the upload eagerly: the tunneled backend leaks
                # per-transfer host staging buffers if left to GC
                img_dev.delete()
            counts.append(len(sc["ys"]))
        total = sum(counts)
        wd = windows[0] if len(windows) == 1 else jnp.concatenate(windows, 0)
        pad_n = (-total) % batch_cap
        if pad_n:                        # pad by repeating the last window
            wd = jnp.concatenate([wd, jnp.repeat(wd[-1:], pad_n, 0)], 0)
        # 2) shared crop forwards across scales; pad outputs dropped
        cams = jnp.concatenate(
            [forward(variables, wd[k : k + batch_cap])
             for k in range(0, total + pad_n, batch_cap)], 0)[:total]
        del wd, windows
        # 3) per-scale canvas: overlap-add → average → min-max normalize
        scale_canvases = []
        off = 0
        for sc, n_windows in zip(item["scales"], counts):
            canvas = accumulate_scale_cam(
                cams[off : off + n_windows], put(sc["ys"]), put(sc["xs"]),
                put(np.ones(n_windows, bool)), sc["canvas_hw"],
            )
            scale_canvases.append(normalize_cam(canvas))
            off += n_windows
        # 4) cross-scale ensemble at native size (still on device)
        ens = ensemble_scales(scale_canvases, item["native_hw"])
        del scale_canvases, cams, canvas
        yield item["stem"], item["native_hw"], ens, item["label"]
        # the caller consumed (or fetched) ens during the yield; free the
        # device buffer before loading the next image
        if not ens.is_deleted():
            ens.delete()


def validate_cams(model, variables, val_images: str, val_masks: str,
                  profile, cam_cfg) -> float:
    """Reference val loop: CAM argmax vs gt mask mIoU (``metric.py:26-86``)."""
    crop_ds = CropListDataset(
        val_images, profile, cam_cfg.crop_size, cam_cfg.crop_size, (1.0,),
        materialize_crops=False,
    )
    acc = MIoUAccumulator(profile.num_classes)
    for stem, _hw, cam, label in generate_cams_for_split(
        model, variables, crop_ds, profile.num_classes, profile=profile
    ):
        pred = cam_argmax_with_label_mask(cam, label)
        gt = decode_palette_png(Path(val_masks) / f"{stem}.png")
        acc.add(pred, gt)
    return acc.miou()


def train_stage0(
    cfg: Config,
    train_data: str,
    val_images: Optional[str] = None,
    val_masks: Optional[str] = None,
    log_dir: str = "logs/stage0",
    max_steps_per_epoch: Optional[int] = None,
    shard_cache: Optional[str] = None,
    pretrained: Optional[str] = None,
    resume: bool = False,
) -> Dict:
    profile = cfg.profile
    cc = cfg.cam
    mesh = stage_mesh(cfg)

    model = WideResNetClassifier(num_classes=profile.num_classes)
    ds = OriginPatchesDataset(train_data, profile)
    if shard_cache is not None:
        # pre-decoded native shard cache (mirror of the stage-2 path): at
        # the reference's 20-epoch budget the per-epoch PNG decode of every
        # training patch otherwise rides a single host core at ≈ the device
        # step rate.  Requires uniformly-sized patches (the shard records
        # are fixed-shape); lossless — raw uint8 pixels, labels from the
        # filenames.
        from pistoseg_tpu.core.manifest import (
            hash_tree, stage_is_current, write_manifest)
        from pistoseg_tpu.data.loader import ShardBatchLoader
        from pistoseg_tpu.data.shardio import (
            ShardImageLabelDataset, build_image_label_cache)

        cache_dir = Path(shard_cache)
        inputs = {"train_data": hash_tree(train_data, "*.png", limit=64)}
        if not stage_is_current(cache_dir, "stage0_shard_cache", inputs, {}):
            build_image_label_cache(ds, cache_dir / "patches")
            write_manifest(cache_dir, "stage0_shard_cache", inputs, {},
                           outputs={"records": len(ds)},
                           hash_outputs=False)
        loader = ShardBatchLoader(
            ShardImageLabelDataset(cache_dir / "patches"), cc.batch_size,
            shuffle=True, seed=cfg.seed,
        )
    else:
        loader = BatchLoader(ds, cc.batch_size, shuffle=True, seed=cfg.seed)
    steps_per_epoch = len(loader) if max_steps_per_epoch is None else min(len(loader), max_steps_per_epoch)
    max_step = steps_per_epoch * cc.epochs

    # one PolyOptimizer group over trainable params; conv1a + all BN frozen
    # (wideResNet.train() marks them requires_grad=False, train.py:101)
    tx = poly_sgd_grouped(
        cc.lr, max_step, wideresnet_group_fn, WIDERESNET_MULTIPLIERS,
        power=cc.poly_power, momentum=cc.momentum, weight_decay=cc.weight_decay,
    )
    rng = fold_in_str(root_key(cfg.seed), "stage0")
    state = create_train_state(
        model, rng, jnp.zeros((1, cc.crop_size, cc.crop_size, 3)), tx
    )
    if pretrained:
        # ImageNet ResNet38d init (OEEM/classification/train.py:92-96)
        state = apply_pretrained(state, pretrained, subtree="trunk")

    aug_cfg = AugmentConfig(out_size=cc.crop_size, rrc_scale=cc.rrc_scale,
                            ssr_p=0.0, distort_p=0.0,
                            norm_mean=profile.norm_mean, norm_std=profile.norm_std)
    train_step = make_train_step(build_loss_fn(model, aug_cfg), mesh)

    ckpt = CheckpointManager(Path(log_dir) / "checkpoints")
    logger = MetricsLogger(log_dir, "stage0")
    from pistoseg_tpu.core.logging import snapshot_code
    snapshot_code(log_dir)
    cfg.save(Path(log_dir) / "config.json")

    def train_iter(epoch):
        for i, batch in enumerate(loader.epoch(epoch)):
            if max_steps_per_epoch is not None and i >= max_steps_per_epoch:
                break
            yield {k: batch[k] for k in ("image", "label", "valid")}

    def validate(state, epoch):
        if val_images is None or (epoch + 1) % cc.test_every != 0:
            # None → Trainer saves 'last' only; 'best' is gated exclusively
            # on real CAM-mIoU values (reference validates every test_every
            # epochs, train.py:131-161)
            return None
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        miou = validate_cams(model, variables, val_images, val_masks, profile, cc)
        console_metric_block(f"Stage-0 val CAM (epoch {epoch})", {"cam_miou": miou})
        return miou

    def checkpoint(state, epoch, metric, is_best):
        tree = {"params": state.params, "batch_stats": state.batch_stats}
        ckpt.save_best_last(tree, epoch, metric, is_best,
                            extra={"stage": "stage0", "config": cfg.to_dict()})
        # full-state snapshot for crash resume (VERDICT r2 missing #6)
        ckpt.save_train_state(state, epoch, metric)

    start_epoch, start_step = 0, 0
    if resume and ckpt.exists("train_state"):
        state, start_epoch, start_step = ckpt.restore_train_state(state)

    trainer = Trainer(
        train_step, cc.epochs, train_iter, mesh=mesh,
        validate_fn=validate if val_images else None,
        checkpoint_fn=checkpoint, log_fn=lambda m: logger.log(m),
        rng=fold_in_str(root_key(cfg.seed), "stage0/train"),
        start_epoch=start_epoch,
        start_step=start_step,
        items_per_batch=cc.batch_size,
        step_checkpoint_every=cc.checkpoint_every_steps,
        step_checkpoint_fn=lambda s, e, i: ckpt.save_train_state(
            s, e, step_in_epoch=i),
    )
    if resume and ckpt.exists("best"):
        bm = ckpt.metadata("best")
        trainer.best_metric = bm.get("metric", -float("inf"))
        trainer.best_epoch = bm.get("epoch", -1)
    trainer.fit(state)
    ckpt.flush()   # all checkpoint bytes on disk before manifests hash them
    return {"best_metric": trainer.best_metric, "checkpoint_dir": str(ckpt.root)}


def main(argv=None):
    cfg, extras = parse_cli(argv)
    return train_stage0(
        cfg,
        train_data=extras["train_data"],
        val_images=extras.get("val_images"),
        val_masks=extras.get("val_masks"),
        log_dir=extras.get("log_dir", "logs/stage0"),
        max_steps_per_epoch=(
            int(extras["max_steps_per_epoch"]) if "max_steps_per_epoch" in extras else None
        ),
        shard_cache=extras.get("shard_cache"),
        pretrained=extras.get("pretrained"),
        resume=extras.get("resume", "false").lower() in ("1", "true", "yes"),
    )


if __name__ == "__main__":
    main()
