"""Tests for datasets, loader, augmentation, mosaic synthesis, splitting."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pistoseg_tpu.core.config import Config, DATASET_PROFILES
from pistoseg_tpu.data.datasets import (
    EvalPatchDataset,
    MosaicDataset,
    PatchInferenceDataset,
    PseudoTrainDataset,
    CutMixDataset,
    RefineDataset,
    pad_to_size_reflect,
)
from pistoseg_tpu.data.loader import BatchLoader, collate
from pistoseg_tpu.data.mosaic import MosaicSynthesizer, write_background_masks
from pistoseg_tpu.data.oeem import CropListDataset, OriginPatchesDataset
from pistoseg_tpu.ops.augment import AugmentConfig, augment_batch, imagenet_normalize

from util_synthetic import (
    make_big_eval_set,
    make_stage4_artifacts,
    make_training_patches,
)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    train = root / "train"
    make_training_patches(train, "wsss4luad", n_per_class=3, size=64)
    big = make_big_eval_set(root / "valid", "wsss4luad", n_images=2, size=96)
    return {"root": root, "train": train, "big": big}


def test_patch_inference_dataset(synth):
    profile = DATASET_PROFILES["wsss4luad"]
    ds = PatchInferenceDataset(synth["train"], profile, patch_size=32)
    item = ds[0]
    assert item["image"].shape == (32, 32, 3)
    assert item["tissue"].shape == (32, 32)
    assert item["label"].shape == (3,)
    assert tuple(item["orig_hw"]) == (64, 64)


def test_loader_shuffle_determinism_and_padding(synth):
    profile = DATASET_PROFILES["wsss4luad"]
    ds = PatchInferenceDataset(synth["train"], profile, patch_size=32)
    ld = BatchLoader(ds, batch_size=4, shuffle=True, seed=7)
    names1 = [b["name"] for b in ld.epoch(0)]
    names2 = [b["name"] for b in ld.epoch(0)]
    assert names1 == names2                      # same epoch → same order
    names3 = [b["name"] for b in ld.epoch(1)]
    assert names1 != names3                      # different epoch → reshuffled
    # 9 items / batch 4 → last batch padded to 4 with valid mask
    batches = list(ld.epoch(0))
    assert batches[-1]["image"].shape[0] == 4
    assert batches[-1]["valid"].sum() == 1


def test_augment_batch_deterministic_and_shaped():
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 255, (4, 64, 64, 3)), jnp.float32)
    masks = jnp.asarray(rng.randint(0, 4, (4, 64, 64)))
    cfg = AugmentConfig(out_size=32)
    key = jax.random.PRNGKey(3)
    out1, m1 = augment_batch(key, images, masks, cfg)
    out2, m2 = augment_batch(key, images, masks, cfg)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    assert out1.shape == (4, 32, 32, 3)
    assert m1.shape == (4, 32, 32)
    # masks keep valid class values only
    assert set(np.unique(np.asarray(m1))) <= {0, 1, 2, 3}
    # different key → different augmentation
    out3, _ = augment_batch(jax.random.PRNGKey(4), images, masks, cfg)
    assert np.abs(np.asarray(out1) - np.asarray(out3)).max() > 1e-3


def test_augment_two_pass_matches_gather_reference_in_frame():
    """The MXU two-pass warp must match the golden gather formulation
    everywhere the composite map stays inside the frame (out-of-frame
    pixels use per-pass reflect-101 — a documented, equally-valid fill).
    Tolerance covers bf16 einsum weights + the two-pass reconstruction
    filter on smooth content."""
    from pistoseg_tpu.ops.augment import (
        WarpParams, _apply_map, _sample_params, augment_pair_reference)

    N, H, W, S = 6, 64, 64, 48
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    imgs = np.stack([
        np.stack([np.sin(yy / 17 + i) * 100 + 120,
                  np.cos(xx / 23 - i) * 100 + 120,
                  (yy + xx) / (H + W) * 200 + 20], -1)
        for i in range(N)
    ]).astype(np.float32)
    masks = ((yy[None] > H / 2).astype(np.int32) +
             (xx[None] > W / 2).astype(np.int32))
    masks = np.broadcast_to(masks, (N, H, W)).astype(np.int32)

    cfg = AugmentConfig(out_size=S)
    key = jax.random.PRNGKey(3)
    out, m = augment_batch(key, jnp.asarray(imgs), jnp.asarray(masks), cfg,
                           do_normalize=False)
    keys = jax.random.split(key, N)
    r = jnp.arange(S, dtype=jnp.float32)[:, None]
    c = jnp.arange(S, dtype=jnp.float32)[None, :]
    for i in range(N):
        ref, mref = augment_pair_reference(
            keys[i], jnp.asarray(imgs[i]), jnp.asarray(masks[i]), cfg)
        p = _sample_params(keys[i], (H, W), cfg)
        ys, xs, _ = _apply_map(p, r, c, (H, W))
        in_frame = np.asarray((ys >= 1) & (ys <= H - 2) & (xs >= 1) & (xs <= W - 2))
        err = np.abs(np.asarray(out[i]) - np.asarray(ref))
        assert err[in_frame].max() < 2.5  # [0, 255] scale
        # nearest mask: in-frame mismatches only on rounding ties along
        # class boundaries — must be rare
        mm = (np.asarray(m[i]) != np.asarray(mref)) & in_frame
        assert mm.mean() < 0.02


def test_augment_two_pass_exact_for_separable_transforms():
    """With rotation/distortion off the two-pass warp IS direct bilinear;
    only bf16 weight quantization separates the paths."""
    from pistoseg_tpu.ops.augment import augment_pair_reference

    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 255, (3, 64, 64, 3)).astype(np.float32)
    masks = rng.randint(0, 4, (3, 64, 64)).astype(np.int32)
    cfg = AugmentConfig(out_size=48, ssr_p=0.0, distort_p=0.0)
    key = jax.random.PRNGKey(11)
    out, m = augment_batch(key, jnp.asarray(imgs), jnp.asarray(masks), cfg,
                           do_normalize=False)
    keys = jax.random.split(key, 3)
    for i in range(3):
        ref, mref = augment_pair_reference(
            keys[i], jnp.asarray(imgs[i]), jnp.asarray(masks[i]), cfg)
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(ref), atol=2.5)
        np.testing.assert_array_equal(np.asarray(m[i]), np.asarray(mref))


def test_augment_chunked_warp_matches_dense():
    """Spatial lax.map chunking (the HBM bound for big batches) must be a
    pure re-slabbing: same results as the single-shot dense warp."""
    from pistoseg_tpu.ops.augment import _sample_params, _warp_two_pass

    # includes a prime (H, W, S) case: sizes that don't divide into the
    # slab count are padded (zero-weight rows), not silently densified
    for N, H, W, S in [(6, 32, 32, 24), (3, 37, 41, 29)]:
        rng = np.random.RandomState(5)
        imgs = jnp.asarray(rng.rand(N, H, W, 3).astype(np.float32) * 255)
        masks = jnp.asarray(rng.randint(0, 4, (N, H, W)).astype(np.int32))
        cfg = AugmentConfig(out_size=S)
        keys = jax.random.split(jax.random.PRNGKey(7), N)
        params = jax.vmap(lambda k: _sample_params(k, (H, W), cfg))(keys)
        dense = _warp_two_pass(imgs, masks, params, S, chunk_target=1)
        chunked = _warp_two_pass(imgs, masks, params, S, chunk_target=4)
        # images: same per-sample math, but XLA may reassociate the bf16
        # contraction differently between the two compilations → up to one
        # bf16 lsb (2.0 at [0, 255] magnitudes) on isolated elements
        np.testing.assert_allclose(np.asarray(chunked[0]),
                                   np.asarray(dense[0]), atol=2.0)
        np.testing.assert_array_equal(np.asarray(chunked[1]),
                                      np.asarray(dense[1]))


def test_augment_two_pass_deviation_bound():
    """PERF.md round-4 bound: with SSR AND distortion forced on (the
    reference's full parameter range), the two-pass warp's in-frame
    deviation vs the golden gather on smooth histology-like content must
    stay within the recorded envelope (measured at 224²: max 3.63,
    P99 1.01 — asserted here with headroom for key/content variance)."""
    from pistoseg_tpu.ops.augment import (
        _apply_map, _sample_params, augment_pair_reference)

    N, H = 8, 224
    S = 224
    yy, xx = np.mgrid[0:H, 0:H].astype(np.float32)
    rng = np.random.RandomState(42)
    imgs = np.empty((N, H, H, 3), np.float32)
    for i in range(N):
        base = np.zeros((H, H))
        for _ in range(10):
            cy, cx = rng.rand(2) * H
            s = rng.rand() * 40 + 12
            base += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
        for ch in range(3):
            v = (base * rng.uniform(60, 120)
                 + np.sin(yy / rng.uniform(3, 9)) * np.cos(xx / rng.uniform(3, 9))
                 * rng.uniform(10, 30) + rng.uniform(60, 140))
            imgs[i, :, :, ch] = np.clip(v, 0, 255)

    cfg = AugmentConfig(out_size=S, ssr_p=1.0, distort_p=1.0)
    key = jax.random.PRNGKey(17)
    out, _ = augment_batch(key, jnp.asarray(imgs), None, cfg,
                           do_normalize=False)
    out = np.asarray(out)
    keys = jax.random.split(key, N)
    r = jnp.arange(S, dtype=jnp.float32)[:, None]
    c = jnp.arange(S, dtype=jnp.float32)[None, :]
    deltas = []
    for i in range(N):
        ref, _ = augment_pair_reference(keys[i], jnp.asarray(imgs[i]), None, cfg)
        p = _sample_params(keys[i], (H, H), cfg)
        ys, xs, _ = _apply_map(p, r, c, (H, H))
        in_frame = np.asarray((ys >= 1) & (ys <= H - 2) & (xs >= 1) & (xs <= H - 2))
        deltas.append(np.abs(out[i] - np.asarray(ref))[in_frame].ravel())
    d = np.concatenate(deltas)
    assert d.max() < 8.0, f"in-frame max {d.max():.2f} blew the recorded bound"
    assert np.percentile(d, 99) < 2.5, \
        f"in-frame P99 {np.percentile(d, 99):.2f} blew the recorded bound"


def test_augment_sampling_matches_albumentations_ranges():
    """Drawn transform parameters must respect the reference's
    albumentations stack (dataset.py:41-49 — RRC(scale=(0.9,1), default
    ratio (3/4,4/3)), flips p=.5, SSR defaults (shift .0625, scale .1,
    rotate 45°), OpticalDistortion defaults (distort .05, shift .05)).
    Catches unit/plumbing bugs (e.g. degrees-as-radians) that forward
    parity tests can't see."""
    from pistoseg_tpu.ops.augment import _sample_params

    H = W = 128
    S = 96
    n = 4000
    keys = jax.random.split(jax.random.PRNGKey(0), n)

    def draw(cfg):
        return jax.vmap(lambda k: _sample_params(k, (H, W), cfg))(keys)

    # --- RandomResizedCrop alone: area/aspect/bounds
    p = draw(AugmentConfig(out_size=S, hflip_p=0, vflip_p=0, ssr_p=0,
                           distort_p=0))
    ch = np.asarray(p.a_yr) * S
    cw = np.asarray(p.a_xc) * S
    area = ch * cw / (H * W)
    aspect = cw / ch
    assert area.min() >= 0.9 - 1e-5 and area.max() <= 1.0 + 1e-5
    assert 0.93 < area.mean() < 0.97              # ~uniform over [0.9, 1]
    assert aspect.min() >= 0.75 - 1e-3 and aspect.max() <= 4 / 3 + 1e-3
    y0 = np.asarray(p.a_y0) + 0.5 - 0.5 * np.asarray(p.a_yr)
    x0 = np.asarray(p.a_x0) + 0.5 - 0.5 * np.asarray(p.a_xc)
    assert (y0 >= -1e-3).all() and (y0 + ch <= H + 1e-2).all()
    assert (x0 >= -1e-3).all() and (x0 + cw <= W + 1e-2).all()
    assert float(np.abs(np.asarray(p.kd)).max()) == 0.0   # distortion off

    # --- flip firing rates ≈ p (sign of the linear coefficients)
    p = draw(AugmentConfig(out_size=S, ssr_p=0.0, distort_p=0.0))
    assert abs((np.asarray(p.a_xc) < 0).mean() - 0.5) < 0.03
    assert abs((np.asarray(p.a_yr) < 0).mean() - 0.5) < 0.03

    # --- ShiftScaleRotate alone on a full square crop: the linear part
    # decomposes into rotation ≤45° and scale within 1±0.1
    p = draw(AugmentConfig(out_size=S, rrc_scale=(1.0, 1.0),
                           rrc_ratio=(1.0, 1.0), hflip_p=0, vflip_p=0,
                           ssr_p=1.0, distort_p=0))
    ayr, ayc = np.asarray(p.a_yr), np.asarray(p.a_yc)
    axr, axc = np.asarray(p.a_xr), np.asarray(p.a_xc)
    det = ayr * axc - ayc * axr
    scale = (H / S) / np.sqrt(det)                 # forward scale s
    assert scale.min() >= 0.9 - 1e-3 and scale.max() <= 1.1 + 1e-3
    theta = np.degrees(np.arctan2(ayc, ayr))
    assert np.abs(theta).max() <= 45.01            # degrees-as-radians → >>45
    assert np.abs(theta).max() > 40                # double-deg2rad → ≤0.8°
    assert np.percentile(np.abs(theta), 50) > 15   # spans the range
    # shift: center displacement bounded by the shift limits (plus the
    # half-pixel crop offset, scaled by 1/s)
    rc = (S - 1) / 2.0
    ys_c = ayr * rc + ayc * rc + np.asarray(p.a_y0)
    disp = np.abs(ys_c - np.asarray(p.cy))
    assert disp.max() <= (0.0625 * (H + W) + 1.0) / 0.9
    assert disp.std() > 1.0                        # shifts actually drawn

    # --- OpticalDistortion alone: radial coefficient and shift bounds,
    # and the p=0.5 gate
    p = draw(AugmentConfig(out_size=S, hflip_p=0, vflip_p=0, ssr_p=0,
                           distort_p=1.0))
    assert np.abs(np.asarray(p.kd)).max() <= 0.05 + 1e-6
    assert np.abs(np.asarray(p.dy)).max() <= 0.05 * H + 1e-3
    assert np.abs(np.asarray(p.dx)).max() <= 0.05 * W + 1e-3
    p = draw(AugmentConfig(out_size=S, hflip_p=0, vflip_p=0, ssr_p=0,
                           distort_p=0.5))
    fired = np.asarray(p.kd) != 0.0
    assert abs(fired.mean() - 0.5) < 0.03


def test_imagenet_normalize_matches_reference_formula():
    x = np.full((1, 2, 2, 3), 128, np.float32)
    got = np.asarray(imagenet_normalize(jnp.asarray(x)))
    ref = (128 / 255.0 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(got[0, 0, 0], ref, rtol=1e-5)


def test_pad_to_size_reflect():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    padded, h, w = pad_to_size_reflect(img, 6)
    assert padded.shape == (6, 6)
    assert (h, w) == (3, 4)
    np.testing.assert_array_equal(padded[:3, :4], img)
    # reflect: row 3 mirrors row 1 (reflect without repeating the edge)
    np.testing.assert_array_equal(padded[3, :4], img[1])


def test_mosaic_synthesizer_deterministic(synth, tmp_path):
    profile = DATASET_PROFILES["wsss4luad"]
    bg_dir = tmp_path / "bg"
    write_background_masks(synth["train"], bg_dir)
    synthm = MosaicSynthesizer(
        synth["train"], profile, background_dir=bg_dir,
        patch_num=2, tile_size=16,
    )
    img1, mask1 = synthm.synthesize_one(5)
    img2, mask2 = synthm.synthesize_one(5)
    np.testing.assert_array_equal(img1, img2)
    np.testing.assert_array_equal(mask1, mask2)
    assert img1.shape == (32, 32, 3)
    assert set(np.unique(mask1)) <= {0, 1, 2, 3}
    img3, _ = synthm.synthesize_one(6)
    assert not np.array_equal(img1, img3)


def test_mosaic_write_dataset(synth, tmp_path):
    profile = DATASET_PROFILES["wsss4luad"]
    synthm = MosaicSynthesizer(synth["train"], profile, patch_num=2, tile_size=16)
    out = tmp_path / "mosaic"
    synthm.write_dataset(out, 4, num_workers=2)
    ds = MosaicDataset(out)
    assert len(ds) == 4
    item = ds[0]
    assert item["image"].shape == (32, 32, 3)
    assert item["mask"].shape == (32, 32)


def test_stage1_split_and_eval_dataset(synth, tmp_path):
    from pistoseg_tpu.stages.stage1_split import split_images

    cfg = Config()
    out = tmp_path / "patches"
    r = split_images(cfg, synth["big"], out, patch_size=64, stride=32, scales=(1.0,))
    assert r["patches"] > 0
    ds = EvalPatchDataset(out, patch_size=64)
    item = ds[0]
    assert item["image"].shape == (64, 64, 3)
    assert "slide" in item and "pos" in item
    # patch grid covers each 96² image: positions 0 and 32 per axis
    names = [p.name for p in ds.images]
    assert any("_0_32-" in n for n in names)


def test_pseudo_train_and_cutmix_datasets(synth, tmp_path):
    profile = DATASET_PROFILES["wsss4luad"]
    mask_dir = tmp_path / "refined"
    mask_dir.mkdir()
    rng = np.random.RandomState(0)
    from pistoseg_tpu.ops.palette import encode_palette_png
    for p in sorted(Path(synth["train"]).glob("*.png")):
        encode_palette_png(rng.randint(0, 4, (64, 64)).astype(np.uint8),
                           profile.palette, mask_dir / p.name)
    ds = PseudoTrainDataset(synth["train"], mask_dir, profile, patch_size=32,
                            cutmix_prob=1.0)
    item = ds[0]
    assert item["image"].shape == (32, 32, 3)
    assert item["mask"].shape == (32, 32)
    assert item["label"].shape == (3,)

    ds2 = CutMixDataset(synth["train"], profile, patch_size=32, cutmix_prob=1.0)
    item2 = ds2[0]
    assert item2["image"].shape == (32, 32, 3)
    assert set(np.unique(item2["mask"])) <= {0, 1, 2, 3}


def test_refine_dataset(synth, tmp_path):
    profile = DATASET_PROFILES["wsss4luad"]
    pm, cm = tmp_path / "pmask", tmp_path / "cam"
    make_stage4_artifacts(Path(synth["train"]), pm, cm)
    ds = RefineDataset(synth["train"], pm, cm, profile, size=64)
    item = ds[0]
    assert item["image"].shape == (64, 64, 3)
    assert item["pmask"].shape == (32, 32, 3)
    assert item["cam"].shape == (32, 32, 3)
    assert item["label"].shape == (3,)


def test_oeem_datasets(synth):
    profile = DATASET_PROFILES["wsss4luad"]
    ds = OriginPatchesDataset(synth["train"], profile)
    assert ds[0]["label"].shape == (3,)
    crops = CropListDataset(synth["big"] / "img", profile, patch_size=64,
                            stride=32, scales=(1.0, 1.5), glob="*.png")
    item = crops[0]
    assert len(item["scales"]) == 2
    s0 = item["scales"][0]
    assert s0["crops"].shape[1:] == (64, 64, 3)
    assert len(s0["ys"]) == len(s0["crops"])


def test_collate_strings_and_scalars():
    batch = collate([{"a": 1.0, "n": "x"}, {"a": 2.0, "n": "y"}], pad_to=3)
    assert batch["a"].shape == (3,)
    assert batch["n"] == ["x", "y", "y"]
    assert list(batch["valid"]) == [True, True, False]
