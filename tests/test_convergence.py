"""Convergence benchmark: proof the framework LEARNS, stage by stage
(VERDICT r4 #2 — the strongest feasible quality evidence while the real
datasets/weights are absent from this environment).

A learnable synthetic histology-like task (color/texture-separable tissue
classes with per-tile brightness jitter, so hue — not intensity — carries
the class) drives three thresholded claims:

* **stage 2 trains to convergence**: UNet++/b0 + device augmentation +
  Dice under the production trainer reaches stitched-validation
  ``mask_miou ≥ 0.90`` within a fixed budget (vs ≈0.33 chance on 3
  classes) — ``test_stage2_converges``.
* **the RFM actually REVISES**: stage 4 trained on systematically
  corrupted pseudo-masks (boundary erosion + label flips + noisy CAMs)
  emits refined masks that beat their own inputs by a margin — the
  module's entire reason to exist
  (``/root/reference/revise_pseudo_labels.py:253-282``) —
  ``test_stage4_rfm_improves_corrupted_masks``.
* **refinement helps downstream**: stage 5 trained on the refined masks
  beats stage 5 trained on the corrupted masks, evaluated against clean
  ground truth — ``test_stage5_refined_beats_corrupted``.

Budgets are sized for the 1-core CPU heavy lane (64² patches, b0
encoders); run on the chip via ``scripts/run_convergence_tpu.py`` (same
code).  Measured margins are recorded in STATUS.md.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from pistoseg_tpu.core.config import DATASET_PROFILES, Config
from pistoseg_tpu.data.labels import format_label
from pistoseg_tpu.metrics.miou import MIoUAccumulator
from pistoseg_tpu.ops.palette import decode_palette_png, encode_palette_png
from pistoseg_tpu.ops.resize import resize_palette_pil

pytestmark = [pytest.mark.heavy, pytest.mark.convergence]

PROFILE = DATASET_PROFILES["wsss4luad"]
# hue-separable, brightness-overlapping class colors: per-tile brightness
# jitter spans ±35%, so a mean-intensity shortcut cannot separate classes
_COLORS = np.array([[170, 70, 110], [70, 170, 110], [90, 110, 200]], np.uint8)
SIZE = 64


def _tile(rng, cls: int, size: int) -> np.ndarray:
    base = _COLORS[cls].astype(np.float32)
    gain = rng.uniform(0.65, 1.35)
    tex = np.kron(rng.randint(-25, 25, (size // 8, size // 8, 3)),
                  np.ones((8, 8, 1)))
    noise = rng.randint(-12, 12, (size, size, 3))
    return np.clip(base[None, None] * gain + tex + noise, 0, 235).astype(np.uint8)


def _blob_mask(rng, size: int, cells: int = 4) -> np.ndarray:
    small = rng.randint(0, PROFILE.num_classes, (cells, cells))
    return np.kron(small, np.ones((size // cells, size // cells),
                                  np.uint8)).astype(np.uint8)


def _image_for_mask(rng, mask: np.ndarray) -> np.ndarray:
    img = np.zeros(mask.shape + (3,), np.uint8)
    for cls in range(PROFILE.num_classes):
        sel = mask == cls
        if sel.any():
            img[sel] = _tile(rng, cls, mask.shape[0])[sel]
    return img


def make_mosaics(root: Path, n: int, seed: int = 0):
    """Stage-2 style (image, exact mask) mosaic pairs at 64²."""
    rng = np.random.RandomState(seed)
    (root / "img").mkdir(parents=True, exist_ok=True)
    (root / "mask").mkdir(parents=True, exist_ok=True)
    for i in range(n):
        mask = _blob_mask(rng, SIZE, cells=2)
        img = _image_for_mask(rng, mask)
        Image.fromarray(img).save(root / "img" / f"{i:04d}.png")
        encode_palette_png(mask, PROFILE.palette, root / "mask" / f"{i:04d}.png")


def make_big_eval(root: Path, n: int, size: int = 96, seed: int = 1):
    rng = np.random.RandomState(seed)
    (root / "img").mkdir(parents=True, exist_ok=True)
    (root / "mask").mkdir(parents=True, exist_ok=True)
    for i in range(n):
        mask = _blob_mask(rng, size, cells=4)
        img = _image_for_mask(rng, mask)
        # a known-background corner (wsss4luad semantics)
        mask[:8, :8] = PROFILE.bg_class
        img[:8, :8] = 255
        Image.fromarray(img).save(root / "img" / f"{i}.png")
        encode_palette_png(mask, PROFILE.palette, root / "mask" / f"{i}.png")


def make_labeled_patches(root: Path, gt_root: Path, n: int, seed: int = 2):
    """Training patches with filename multilabels + clean gt masks."""
    rng = np.random.RandomState(seed)
    root.mkdir(parents=True, exist_ok=True)
    gt_root.mkdir(parents=True, exist_ok=True)
    names = []
    for i in range(n):
        mask = _blob_mask(rng, SIZE, cells=2)
        img = _image_for_mask(rng, mask)
        present = [1 if (mask == c).any() else 0
                   for c in range(PROFILE.num_classes)]
        name = f"c{i:04d}-{format_label(present, PROFILE.label_grammar)}.png"
        Image.fromarray(img).save(root / name)
        encode_palette_png(mask, PROFILE.palette, gt_root / f"{name[:-4]}.png")
        names.append(name)
    return names


def corrupt_artifacts(train: Path, gt: Path, pmask_dir: Path, cam_dir: Path,
                      flip_frac: float = 0.25, seed: int = 3):
    """Systematically corrupted stage-3/0b artifacts from clean gt:
    boundary erosion (pre-flip nearest downsample to 16² then back — cell
    boundaries shift up to 4 px) + ``flip_frac`` random 4²-cell label
    flips, emitted as one-hot-ish [C, 32, 32] logits; CAMs are the clean
    gt softened with strong blur-like noise."""
    rng = np.random.RandomState(seed)
    pmask_dir.mkdir(parents=True, exist_ok=True)
    cam_dir.mkdir(parents=True, exist_ok=True)
    c = PROFILE.num_classes
    for p in sorted(train.glob("*.png")):
        mask = decode_palette_png(gt / f"{p.stem}.png")
        # boundary erosion: quantize the geometry to a coarse grid
        small = mask[::4, ::4]                       # 16²
        shifted = np.kron(small, np.ones((2, 2), np.uint8))  # back to 32²
        # random cell flips on a 4²-cell grid of the 32² artifact
        cells = shifted.reshape(8, 4, 8, 4)
        flips = rng.rand(8, 8) < flip_frac
        rand_cls = rng.randint(0, c, (8, 8))
        for y in range(8):
            for x in range(8):
                if flips[y, x]:
                    cells[y, :, x, :] = rand_cls[y, x]
        corrupted = cells.reshape(32, 32)
        onehot = np.eye(c, dtype=np.float32)[corrupted]      # (32, 32, C)
        logits = onehot * 6.0 + rng.randn(32, 32, c).astype(np.float32) * 0.5
        np.save(pmask_dir / f"{p.stem}.npy",
                np.ascontiguousarray(logits.transpose(2, 0, 1)))
        # CAM: clean gt, softened + noisy (roughly-right-but-blurry)
        gt32 = np.eye(c, dtype=np.float32)[mask[::2, ::2]]
        cam = np.clip(gt32 * rng.uniform(0.6, 1.0)
                      + rng.rand(32, 32, c).astype(np.float32) * 0.4, 0, 1)
        np.save(cam_dir / f"{p.stem}.npy",
                np.ascontiguousarray(cam.transpose(2, 0, 1)))


def corrupted_mask_pngs(pmask_dir: Path, out_dir: Path, train: Path):
    """Baseline masks from the corrupted artifacts, emitted with the SAME
    semantics as stage 4b (argmax → P-mode nearest resize to native)."""
    out_dir.mkdir(parents=True, exist_ok=True)
    n = 0
    for p in sorted(train.glob("*.png")):
        logits = np.load(pmask_dir / f"{p.stem}.npy")       # [C, 32, 32]
        pred = logits.argmax(0).astype(np.uint8)
        native = resize_palette_pil(pred, (SIZE, SIZE))
        encode_palette_png(native, PROFILE.palette, out_dir / p.name)
        n += 1
    return n


def miou_vs_gt(mask_dir: Path, gt_dir: Path, names) -> float:
    acc = MIoUAccumulator(PROFILE.num_classes)
    for name in names:
        pred = decode_palette_png(Path(mask_dir) / name)
        gt = decode_palette_png(Path(gt_dir) / f"{Path(name).stem}.png")
        acc.add(pred, gt)
    return acc.miou()


# ---------------------------------------------------------------------------
# shared corpus + trained artifacts (module-scoped: the three tests verify
# successive stages of ONE pipeline run, like the golden chain)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("convergence")
    make_mosaics(root / "mosaic", 64)
    make_big_eval(root / "valid", 2)
    train = root / "train"
    gt = root / "gt"
    names = make_labeled_patches(train, gt, 48)
    corrupt_artifacts(train, gt, root / "pmask", root / "cam")
    corrupted_mask_pngs(root / "pmask", root / "corrupted_masks", train)
    from pistoseg_tpu.stages.stage1_split import split_images

    cfg = _cfg()
    split_images(cfg, str(root / "valid"), str(root / "val_patches"),
                 patch_size=SIZE, stride=SIZE // 2)
    # a quick stage-0 classifier on the same corpus: stage 4's backbone
    # warm start (the reference inits it from published res38d weights;
    # from RANDOM init the RFM measurably corrupts its inputs — see
    # apply_stage0_trunk)
    from pistoseg_tpu.stages.stage0_cam import train_stage0

    r0 = train_stage0(_cfg(), str(train), log_dir=str(root / "logs/s0"))
    return {"root": root, "train": train, "gt": gt, "names": names,
            "s0_ckpt": r0["checkpoint_dir"]}


def _cfg() -> Config:
    cfg = Config()
    cfg.dataset = "wsss4luad"
    # single-device mesh (chain-test precedent): the default (-1,) absorbs
    # the conftest's 8 virtual devices, which both thrashes the 1-core host
    # with collectives and rejects revise.batch_size=4 (not divisible by 8)
    cfg.mesh.shape = (1,)
    cfg.cam.crop_size = SIZE
    cfg.cam.batch_size = 8
    cfg.cam.epochs = 8
    cfg.cam.lr = 0.003          # random init (full-budget harness finding)
    cfg.mosaic.patch_size = SIZE
    cfg.mosaic.batch_size = 8
    cfg.mosaic.epochs = 8
    cfg.mosaic.tta = False
    cfg.revise.batch_size = 4
    cfg.revise.epochs = 6
    cfg.revise.train_size = SIZE
    cfg.revise.infer_size = SIZE
    cfg.revise.lr = 5e-3
    cfg.seg.encoder = "efficientnet-b0"   # CPU-lane budget (BCSS-chain precedent)
    cfg.seg.patch_size = SIZE
    cfg.seg.batch_size = 8
    cfg.seg.epochs = 6
    cfg.seg.tta = False
    cfg.infer.batch_size = 8
    cfg.infer.tta = False
    return cfg


RESULTS: dict = {}


def _record(key, value):
    RESULTS[key] = round(float(value), 4)
    print(f"[convergence] {key} = {value:.4f}", flush=True)
    out = Path(__file__).parent / ".convergence_results.json"
    out.write_text(json.dumps(RESULTS, indent=2, sort_keys=True))


def test_stage2_converges(corpus):
    """The production stage-2 trainer reaches mask_miou ≥ 0.90 stitched
    validation within 8 epochs on the learnable task (chance ≈ 0.33;
    the 2-step chain goldens plateau near 0.49)."""
    from pistoseg_tpu.stages.stage2_mosaic import train_stage2

    root = corpus["root"]
    r = train_stage2(
        _cfg(), str(root / "mosaic"), val_data=str(root / "val_patches"),
        val_big_root=str(root / "valid"), log_dir=str(root / "logs/s2"))
    _record("stage2_best_mask_miou", r["best_metric"])
    assert r["best_metric"] >= 0.90


def test_stage4_rfm_improves_corrupted_masks(corpus):
    """Stage 4 (RFM) trained on corrupted pseudo-masks + noisy CAMs emits
    refined masks that beat their own inputs vs clean gt by ≥ 0.05 mIoU —
    the module's purpose (revise_pseudo_labels.py:253-282)."""
    from pistoseg_tpu.stages.stage4_revise import train_stage4
    from pistoseg_tpu.stages.stage4b_infer_revise import infer_stage4b

    root, train, gt = corpus["root"], corpus["train"], corpus["gt"]
    cfg = _cfg()
    r4 = train_stage4(cfg, str(train), str(root / "pmask"), str(root / "cam"),
                      log_dir=str(root / "logs/s4"), trust_inputs=True,
                      pretrained_stage0=corpus["s0_ckpt"])
    infer_stage4b(cfg, str(train), str(root / "pmask"), str(root / "cam"),
                  r4["checkpoint_dir"], out_dir=str(root / "refine"),
                  trust_inputs=True)
    base = miou_vs_gt(root / "corrupted_masks", gt, corpus["names"])
    refined = miou_vs_gt(root / "refine" / "cam", gt, corpus["names"])
    _record("stage4_corrupted_miou", base)
    _record("stage4_refined_miou", refined)
    assert refined >= base + 0.05, (refined, base)


def test_stage5_refined_beats_corrupted(corpus):
    """Stage 5 trained on the RFM-refined masks beats stage 5 trained on
    the corrupted masks (same budget, same eval vs clean gt)."""
    import jax
    import jax.numpy as jnp

    from pistoseg_tpu.core.checkpoint import CheckpointManager
    from pistoseg_tpu.data.datasets import load_image
    from pistoseg_tpu.models.factory import create_segmentation_model
    from pistoseg_tpu.ops.augment import imagenet_normalize
    from pistoseg_tpu.stages.stage5_train import train_stage5

    root, train, gt = corpus["root"], corpus["train"], corpus["gt"]
    cfg = _cfg()

    def train_and_eval(mask_dir: Path, tag: str) -> float:
        r = train_stage5(cfg, str(train), str(mask_dir),
                         log_dir=str(root / f"logs/s5_{tag}"),
                         trust_inputs=True)
        model = create_segmentation_model(
            cfg.seg.model, cfg.seg.encoder, PROFILE.num_classes,
            cfg.seg.decoder_attention, dtype=jnp.bfloat16)
        ckpt = CheckpointManager(r["checkpoint_dir"])
        tree = ckpt.restore("best" if ckpt.exists("best") else "last")
        variables = {"params": tree["params"],
                     "batch_stats": tree["batch_stats"]}
        fwd = jax.jit(lambda v, x: jnp.argmax(
            model.apply(v, imagenet_normalize(x), train=False), -1))
        acc = MIoUAccumulator(PROFILE.num_classes)
        for name in corpus["names"]:
            img = load_image(train / name).astype(np.float32)[None]
            pred = np.asarray(fwd(variables, jnp.asarray(img)))[0]
            acc.add(pred.astype(np.uint8),
                    decode_palette_png(gt / f"{Path(name).stem}.png"))
        return acc.miou()

    refined = train_and_eval(root / "refine" / "cam", "refined")
    corrupted = train_and_eval(root / "corrupted_masks", "corrupted")
    _record("stage5_on_refined_miou", refined)
    _record("stage5_on_corrupted_miou", corrupted)
    assert refined > corrupted, (refined, corrupted)
