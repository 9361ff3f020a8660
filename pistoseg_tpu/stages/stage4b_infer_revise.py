"""Stage 4b: emit refined masks with the trained RFM.

TPU-native rebuild of ``infer_revise_masks.py``: images at 256²
(inference size differs from the 224² training size by design,
``infer_revise_masks.py:46`` vs ``revise_pseudo_labels.py:53``); forward
the RFM; **foreground-only** argmax of the label-masked refined maps
(``(x_rv·label)[:, 1:]`` then argmax, ``:137-143``); nearest-resize the
palette mask to native size (PIL P-mode resize semantics); for WSSS4LUAD
re-impose the recomputed background as the bg class (``:151-155``);
write ``refine/{pmask,pcam,cam}/{name}.png``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pistoseg_tpu.core.checkpoint import CheckpointManager
from pistoseg_tpu.core.config import Config
from pistoseg_tpu.data.datasets import RefineDataset
from pistoseg_tpu.models.rfm import ReviseNet
from pistoseg_tpu.ops.augment import imagenet_normalize
from pistoseg_tpu.ops.background import extract_background
from pistoseg_tpu.ops.palette import encode_palette_png
from pistoseg_tpu.ops.resize import resize_palette_pil
from pistoseg_tpu.stages.common import parse_cli
from pistoseg_tpu.stages.stage4_revise import prepare_batch


def infer_stage4b(
    cfg: Config,
    train_data: str,
    pmask_dir: str,
    cam_dir: str,
    ckpt_dir: str,
    out_dir: Optional[str] = None,
    limit: Optional[int] = None,
    trust_inputs: bool = False,
) -> Dict:
    profile = cfg.profile
    rc = cfg.revise
    n_ch = profile.num_classes + 1

    from pistoseg_tpu.core.manifest import (
        check_lineage,
        check_upstream,
        hash_tree,
        skip_if_current,
        write_manifest,
    )

    check_lineage(
        {
            "pmask_dir": check_upstream(pmask_dir, "stage3", what="pmask_dir",
                                        trust=trust_inputs),
            "cam_dir": check_upstream(cam_dir, "stage0_export", what="cam_dir",
                                      trust=trust_inputs),
        },
        "train_data", trust=trust_inputs,
    )

    out = Path(out_dir) if out_dir else Path(ckpt_dir) / "refine"
    manifest_inputs = {
        "train_data": hash_tree(train_data, "*.png", limit=256),
        "pmask": hash_tree(pmask_dir, "*.npy", limit=256),
        "cam": hash_tree(cam_dir, "*.npy", limit=256),
        "rfm": hash_tree(Path(ckpt_dir) / "rfm.meta.json"),
        "limit": str(limit),
    }
    if skip_if_current(out, "stage4b", manifest_inputs, cfg.to_dict()):
        return {"patches": -1, "out_dir": str(out), "skipped": True}

    act_dtype = jnp.bfloat16 if rc.precision == "bf16" else jnp.float32
    model = ReviseNet(num_classes=n_ch, dtype=act_dtype, use_pallas=rc.use_pallas)
    ckpt = CheckpointManager(ckpt_dir)
    tree = ckpt.restore("rfm")
    variables = {"params": tree["params"], "batch_stats": tree["batch_stats"]}

    def forward_fn(v, x, pmask, pcam, label):
        x = imagenet_normalize(x)
        _, cam_rv, pmask_rv, pcam_rv = model.apply(v, x, pmask, pcam, train=False)
        lbl = label[:, None, None, :]
        preds = []
        for m in (pmask_rv, pcam_rv, cam_rv):
            fg = (m * lbl)[..., 1:]                      # drop bg channel
            preds.append(jnp.argmax(fg, axis=-1).astype(jnp.uint8))
        return preds  # [pmask, pcam, cam] fg-class argmaxes

    # data-parallel over the mesh (reference DataParallels this stage,
    # infer_revise_masks.py:110): params replicated, batch sharded
    from pistoseg_tpu.parallel.mesh import (
        batch_sharding, mesh_batch_loader, replicated)
    from pistoseg_tpu.stages.common import stage_mesh

    mesh = stage_mesh(cfg)
    repl, data = replicated(mesh), batch_sharding(mesh)
    forward = jax.jit(forward_fn,
                      in_shardings=(repl, data, data, data, data),
                      out_shardings=data)
    variables = jax.device_put(variables, repl)

    ds = RefineDataset(train_data, pmask_dir, cam_dir, profile, rc.infer_size)
    if limit is not None:
        ds.paths = ds.paths[:limit]
    loader = mesh_batch_loader(ds, cfg.infer.batch_size, mesh)

    for sub in ("pmask", "pcam", "cam"):
        (out / sub).mkdir(parents=True, exist_ok=True)

    from concurrent.futures import ThreadPoolExecutor

    from pistoseg_tpu.data.datasets import load_image

    def emit_one(name, pred_j):
        # re-decode the original for its native size + background mask,
        # then write the three palette masks (infer_revise_masks.py:161-210)
        original = load_image(Path(train_data) / name)
        h, w = original.shape[:2]
        bg = extract_background(original) if profile.has_background_channel else None
        for sub, pred in zip(("pmask", "pcam", "cam"), pred_j):
            mask = resize_palette_pil(pred, (h, w))
            if bg is not None:
                mask[bg > 0] = profile.bg_class
            encode_palette_png(mask, profile.palette, out / sub / name)

    n_done = 0
    futures = []
    # host emission (decode + bg extract + 3 palette PNG writes per patch)
    # overlaps the next batch's device work — it dominated the serial loop
    # at production patch counts
    with ThreadPoolExecutor(max_workers=8) as pool:
        for batch in loader.epoch(0):
            pmask, pcam, label = (jax.device_put(t, data)
                                  for t in prepare_batch(batch))
            x = jax.device_put(batch["image"], data)
            preds = [np.asarray(p)
                     for p in forward(variables, x, pmask, pcam, label)]
            for j, ok in enumerate(batch["valid"]):
                if not ok:
                    continue
                futures.append(pool.submit(
                    emit_one, batch["name"][j],
                    [pred[j] for pred in preds]))
                n_done += 1
        for f in futures:
            f.result()

    write_manifest(
        out, "stage4b",
        inputs=manifest_inputs,
        config=cfg.to_dict(),
        outputs={"patches": n_done},
    )
    return {"patches": n_done, "out_dir": str(out)}


def main(argv=None):
    cfg, extras = parse_cli(argv)
    return infer_stage4b(
        cfg,
        train_data=extras["train_data"],
        pmask_dir=extras["pmask_dir"],
        cam_dir=extras["cam_dir"],
        ckpt_dir=extras["ckpt_dir"],
        out_dir=extras.get("out_dir"),
        limit=int(extras["limit"]) if "limit" in extras else None,
        trust_inputs=extras.get("trust_inputs", "false").lower() in ("1", "true", "yes"),
    )


if __name__ == "__main__":
    main()
