"""Tests for label parsing, palette codec, patch geometry, background."""

import numpy as np
import pytest

from pistoseg_tpu.data.labels import (
    parse_label,
    format_label,
    parse_patch_name,
    slide_id,
)
from pistoseg_tpu.ops.palette import (
    encode_palette_png,
    decode_palette_png,
    mask_to_rgb,
)
from pistoseg_tpu.ops.patches import cut_patch_boxes, multiscale_patch_boxes
from pistoseg_tpu.ops.background import extract_background
from pistoseg_tpu.core.config import Config, DATASET_PROFILES


def test_parse_bracket_list_label():
    # WSSS4LUAD grammar: training/1003370-11223-11698-[1, 1, 0].png
    assert parse_label("training/1003370-11223-11698-[1, 1, 0].png", "bracket-list") == [1, 1, 0]
    assert parse_label("x-[0, 0, 1].png", "bracket-list") == [0, 0, 1]


def test_parse_digit_string_label():
    # BCSS grammar: name[1101].png
    assert parse_label("foo[1101].png", "digit-string") == [1, 1, 0, 1]
    assert parse_label("a/b/c[0010].png", "digit-string") == [0, 0, 1, 0]


def test_label_roundtrip():
    assert parse_label(f"n-{format_label([1, 0, 1], 'bracket-list')}.png", "bracket-list") == [1, 0, 1]
    assert parse_label(f"n{format_label([1, 0, 1, 1], 'digit-string')}.png", "digit-string") == [1, 0, 1, 1]


def test_parse_patch_name():
    idx, scale, y, x = parse_patch_name("17_1.25_448_224-[1, 0, 1].png")
    assert (idx, scale, y, x) == ("17", 1.25, 448, 224)
    assert slide_id("17_1.25_448_224-[1, 0, 1].png") == "17"


def test_palette_roundtrip(tmp_path):
    prof = DATASET_PROFILES["wsss4luad"]
    rng = np.random.RandomState(0)
    mask = rng.randint(0, 4, size=(31, 57), dtype=np.uint8)
    p = tmp_path / "m.png"
    encode_palette_png(mask, prof.palette, p)
    back = decode_palette_png(p)
    np.testing.assert_array_equal(back, mask)
    rgb = mask_to_rgb(mask, prof.palette)
    assert rgb.shape == (31, 57, 3)
    # background index 3 must map to white
    assert tuple(rgb[mask == 3][0]) == (255, 255, 255)


def test_cut_patch_boxes_tail_snap():
    # 500x500, patch 224, stride 112 -> positions 0,112,224,276 (tail snap)
    boxes = cut_patch_boxes(500, 500, 224, 112)
    ys = sorted({y for y, _ in boxes})
    assert ys == [0, 112, 224, 276]
    # every pixel covered
    cover = np.zeros((500, 500), bool)
    for y, x in boxes:
        cover[y : y + 224, x : x + 224] = True
    assert cover.all()


def test_cut_patch_boxes_exact_fit_and_small():
    assert cut_patch_boxes(448, 448, 224, 224) == [(0, 0), (0, 224), (224, 0), (224, 224)]
    assert cut_patch_boxes(100, 100, 224, 112) == [(0, 0)]


def test_multiscale_boxes():
    ms = multiscale_patch_boxes(300, 400, 224, 112, (1.0, 1.5))
    assert ms[0][1:3] == (300, 400)
    assert ms[1][1:3] == (450, 600)
    for _, sh, sw, boxes in ms:
        for y, x in boxes:
            assert 0 <= y <= sh - 224 and 0 <= x <= sw - 224


def test_extract_background():
    img = np.full((64, 64, 3), 120, np.uint8)       # tissue: mid gray
    img[:20, :20] = 255                              # large bright region
    img[40:43, 40:43] = 255                          # 9 px: below min_size
    bg = extract_background(img)
    assert bg[:20, :20].min() == 255
    assert bg[40:43, 40:43].max() == 0
    assert bg[25:35, 25:35].max() == 0


def test_config_profiles_and_overrides():
    cfg = Config.from_args(["--dataset=bcss", "--mosaic.lr=0.01", "--seg.tta=true"])
    assert cfg.profile.num_classes == 4
    assert cfg.profile.bg_class == 4
    assert cfg.mosaic.lr == 0.01
    assert cfg.seg.tta is True
    with pytest.raises(KeyError):
        cfg.override("mosaic.nope", "1")
    # serialization round-trip sanity
    assert "bcss" in cfg.to_json()
    # explicit CLI sets are tracked (stage5_test arch adoption) and stay
    # out of the serialized config
    assert cfg.cli_overridden == {"dataset", "mosaic.lr", "seg.tta"}
    assert "cli_overridden" not in cfg.to_json()
    # parse_cli tracks the same way and splits extras
    from pistoseg_tpu.stages.common import parse_cli
    cfg2, extras = parse_cli(["--seg.encoder=efficientnet-b0", "--train_data=x"])
    assert cfg2.cli_overridden == {"seg.encoder"}
    assert extras == {"train_data": "x"}
    assert Config().cli_overridden == frozenset()


def test_glas_profile_and_normalize():
    import jax.numpy as jnp
    from pistoseg_tpu.ops.augment import normalize

    p = DATASET_PROFILES["glas"]
    assert p.num_classes == 2
    x = np.full((1, 2, 2, 3), 200, np.float32)
    out = np.asarray(normalize(jnp.asarray(x), p.norm_mean, p.norm_std))
    ref = (200 / 255.0 - np.array(p.norm_mean)) / np.array(p.norm_std)
    np.testing.assert_allclose(out[0, 0, 0], ref, rtol=1e-4)


def test_join_crops_back(tmp_path):
    from PIL import Image
    from pistoseg_tpu.ops.cam import join_crops_back
    from pistoseg_tpu.ops.palette import decode_palette_png
    from pistoseg_tpu.ops.patches import cut_patch_boxes

    profile = DATASET_PROFILES["glas"]
    origin = tmp_path / "imgs"
    origin.mkdir()
    h = w = 20
    Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(origin / "train_7.bmp")
    crops = tmp_path / "crops"
    crops.mkdir()
    boxes = cut_patch_boxes(h, w, 8, 4)
    full = np.random.RandomState(0).randint(0, 2, (h, w)).astype(np.float64)
    for i, (y, x) in enumerate(boxes):
        np.save(crops / f"train_7_{i}-x.npy", full[y : y + 8, x : x + 8])
    n = join_crops_back(crops, origin, 8, 4, profile.palette)
    assert n == 1
    merged = decode_palette_png(crops / "train_7.png")
    np.testing.assert_array_equal(merged, full.astype(np.uint8))
    assert not list(crops.glob("*.npy"))       # crop files removed
