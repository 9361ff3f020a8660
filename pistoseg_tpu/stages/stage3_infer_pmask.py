"""Stage 3: pseudo-mask inference over the real training patches.

TPU-native rebuild of ``infer_pseudo_masks.py``: load the stage-2 best
checkpoint, run d4-TTA forwards over every training patch, and emit the
three artifacts per patch:

* ``logits_32x32/{stem}.npy`` — bilinear-downsampled logits ``[C, 32, 32]``
  (reference saved torch ``.pt``, ``infer_pseudo_masks.py:126-127``);
* ``mask/{name}.png`` — label-masked argmax palette PNG at native size
  (impossible classes' logits forced to −1e10, background (tissue==0)
  forced to the bg class, ``get_mask_pred_and_entropy``
  ``infer_pseudo_masks.py:69-87``);
* ``entropy/{stem}.npy`` — softmax entropy map (inspection artifact).

TPU-first: the whole per-patch post-processing (d4 mean → label mask →
softmax → entropy → argmax → 32² logits) is one fused jitted function
over the batch; only PNG/npy writes stay on host.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from functools import partial
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pistoseg_tpu.core.checkpoint import CheckpointManager
from pistoseg_tpu.core.config import Config
from pistoseg_tpu.data.datasets import PatchInferenceDataset
from pistoseg_tpu.models.factory import create_segmentation_model
from pistoseg_tpu.ops.augment import imagenet_normalize
from pistoseg_tpu.ops.palette import encode_palette_png
from pistoseg_tpu.ops.resize import resize, resize_palette_pil
from pistoseg_tpu.ops.tta import d4_forward
from pistoseg_tpu.parallel.mesh import batch_sharding, mesh_batch_loader, replicated
from pistoseg_tpu.stages.common import parse_cli


def emit_outputs(
    logits: jnp.ndarray,     # (N, P, P, C) TTA-averaged logits
    labels: jnp.ndarray,     # (N, C) image-level multilabel
    tissue: jnp.ndarray,     # (N, P, P) uint8: 0 = background, 127 = tissue
    logits_size: int = 32,
    bg_class: int = 3,
):
    """Fused post-processing (reference ``get_mask_pred_and_entropy``).

    Plain function: ``infer_stage3`` jits it with batch-dim shardings so
    it runs data-parallel over the mesh alongside ``forward_full``."""
    small = resize(logits, (logits_size, logits_size), method="linear")
    # label masking: logits of classes absent from the image label → −1e10
    masked = jnp.where(labels[:, None, None, :] > 0, logits, -1e10)
    probs = jax.nn.softmax(masked, axis=-1)
    entropy = -jnp.sum(probs * jnp.log(jnp.clip(probs, 1e-12)), axis=-1)
    pred = jnp.argmax(probs, axis=-1).astype(jnp.uint8)
    pred = jnp.where(tissue == 0, jnp.uint8(bg_class), pred)
    return small, pred, entropy


def infer_stage3(
    cfg: Config,
    train_data: str,
    ckpt_dir: str,
    out_dir: str,
    limit: Optional[int] = None,
) -> Dict:
    profile = cfg.profile
    num_classes = profile.num_classes
    sc = cfg.mosaic

    act_dtype = jnp.bfloat16 if sc.precision == "bf16" else jnp.float32
    model = create_segmentation_model(sc.model, sc.encoder, num_classes,
                                      sc.decoder_attention, dtype=act_dtype)
    ckpt = CheckpointManager(ckpt_dir)
    name = "best" if ckpt.exists("best") else "last"

    from pistoseg_tpu.core.manifest import hash_tree, skip_if_current, write_manifest

    out = Path(out_dir)
    manifest_inputs = {
        "train_data": hash_tree(train_data, "*.png", limit=256),
        "checkpoint": hash_tree(Path(ckpt_dir) / f"{name}.meta.json"),
        "limit": str(limit),
    }
    if skip_if_current(out, "stage3", manifest_inputs, cfg.to_dict()):
        return {"patches": -1, "checkpoint": name, "out_dir": str(out),
                "skipped": True}

    tree = ckpt.restore(name)
    variables = {"params": tree["params"], "batch_stats": tree["batch_stats"]}

    # one jit over normalize + all 8 d4 views + inversion + mean (eager view
    # ops each cost a relay dispatch); variables/prep passed as ARGUMENTS so
    # the weights aren't baked into the program as constants.
    # Data-parallel over the mesh (VERDICT r3 #4): params replicated, batch
    # sharded on 'data' — the reference's stage-3 runs on one GPU, but its
    # sibling export stages DataParallel over all GPUs
    # (prepare_seg_inputs.py:78, infer_revise_masks.py:110); here every
    # inference stage rides the full slice.  Per-sample math never crosses
    # the batch axis, so artifacts are device-count-invariant up to bf16
    # reassociation noise (argmax outputs byte-identical) — locked by
    # tests/test_multidevice_infer.py.
    from pistoseg_tpu.stages.common import make_infer_forward, stage_mesh

    mesh = stage_mesh(cfg)
    repl, data = replicated(mesh), batch_sharding(mesh)
    fwd, prep = make_infer_forward(model, variables)
    if cfg.infer.tta:
        run_fwd = lambda v, p, imgs: d4_forward(  # noqa: E731
            lambda b: fwd(v, p, b), imagenet_normalize(imgs))
    else:
        run_fwd = lambda v, p, imgs: fwd(v, p, imagenet_normalize(imgs))  # noqa: E731
    forward_full = jax.jit(run_fwd, in_shardings=(repl, repl, data),
                           out_shardings=data)
    # commit the weights replicated ONCE (restored trees are host numpy;
    # left uncommitted they would re-transfer on every call)
    variables = jax.device_put(variables, repl)
    prep = jax.device_put(prep, repl)
    emit = jax.jit(
        partial(emit_outputs, logits_size=cfg.infer.logits_size,
                bg_class=profile.bg_class),
        in_shardings=(data, data, data), out_shardings=data)

    ds = PatchInferenceDataset(train_data, profile, sc.patch_size)
    if limit is not None:
        ds.paths = ds.paths[:limit]
    # every batch (incl. the padded tail) must divide over the mesh —
    # mesh_batch_loader forces pad_last and the batch-size multiple
    loader = mesh_batch_loader(ds, cfg.infer.batch_size, mesh)

    (out / "logits_32x32").mkdir(parents=True, exist_ok=True)
    (out / "mask").mkdir(parents=True, exist_ok=True)
    (out / "entropy").mkdir(parents=True, exist_ok=True)

    def emit_one(name_, oh, ow, small_j, entropy_j, pred_j):
        stem = Path(name_).stem
        # [C, 32, 32] contract (Appendix B)
        np.save(out / "logits_32x32" / f"{stem}.npy",
                np.ascontiguousarray(small_j.transpose(2, 0, 1)))
        np.save(out / "entropy" / f"{stem}.npy", entropy_j)
        mask_native = resize_palette_pil(pred_j, (int(oh), int(ow)))
        encode_palette_png(mask_native, profile.palette, out / "mask" / name_)

    n_done = 0
    futures = []
    # host emission (palette resize + PNG/npy encode) overlaps the next
    # batch's device work — it dominated the serial loop
    with ThreadPoolExecutor(max_workers=8) as pool:
        for batch in loader.epoch(0):
            logits = forward_full(
                variables, prep, jax.device_put(batch["image"], data))
            small, pred, entropy = emit(
                logits,
                jax.device_put(batch["label"], data),
                jax.device_put(batch["tissue"], data),
            )
            small = np.asarray(small)
            pred = np.asarray(pred)
            entropy = np.asarray(entropy)
            for j, ok in enumerate(batch["valid"]):
                if not ok:
                    continue
                oh, ow = batch["orig_hw"][j]
                futures.append(pool.submit(
                    emit_one, batch["name"][j], oh, ow,
                    small[j], entropy[j], pred[j],
                ))
                n_done += 1
        for f in futures:
            f.result()

    write_manifest(
        out, "stage3",
        inputs=manifest_inputs,
        config=cfg.to_dict(),
        outputs={"patches": n_done},
    )
    return {"patches": n_done, "checkpoint": name, "out_dir": str(out)}


def main(argv=None):
    cfg, extras = parse_cli(argv)
    return infer_stage3(
        cfg,
        train_data=extras["train_data"],
        ckpt_dir=extras["ckpt_dir"],
        out_dir=extras.get("out_dir", str(Path(extras["ckpt_dir"]) / "pseudo")),
        limit=int(extras["limit"]) if "limit" in extras else None,
    )


if __name__ == "__main__":
    main()
