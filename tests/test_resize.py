"""Golden tests for deterministic resize vs PIL and torch CPU references."""

import numpy as np
import pytest

import jax.numpy as jnp
from PIL import Image

from pistoseg_tpu.ops.resize import resize, resize_matrix, resize_palette_pil

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _rand_img(h, w, c=3, seed=0):
    rng = np.random.RandomState(seed)
    return rng.rand(h, w, c).astype(np.float32)


@pytest.mark.parametrize("in_hw,out_hw", [((32, 32), (224, 224)), ((224, 224), (32, 32)),
                                          ((57, 83), (224, 224)), ((256, 256), (32, 32))])
@pytest.mark.parametrize("align", [False, True])
def test_bilinear_matches_torch(in_hw, out_hw, align):
    x = _rand_img(*in_hw)
    xt = torch.from_numpy(x.transpose(2, 0, 1))[None]
    ref = F.interpolate(xt, out_hw, mode="bilinear", align_corners=align)
    ref = ref[0].numpy().transpose(1, 2, 0)
    method = "linear_align_corners" if align else "linear"
    got = np.asarray(resize(jnp.asarray(x), out_hw, method=method))
    np.testing.assert_allclose(got, ref, atol=2e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((224, 224), (64, 64)), ((61, 47), (224, 224)),
                                          ((300, 180), (97, 211))])
def test_pil_bilinear_matches_pil(in_hw, out_hw):
    rng = np.random.RandomState(3)
    x = rng.randint(0, 256, size=in_hw + (3,), dtype=np.uint8)
    ref = np.asarray(
        Image.fromarray(x).resize((out_hw[1], out_hw[0]), Image.BILINEAR)
    ).astype(np.float32)
    got = np.asarray(resize(jnp.asarray(x, dtype=jnp.float32), out_hw, method="pil"))
    # PIL quantizes to uint8; compare within 1 intensity level
    assert np.max(np.abs(got - ref)) <= 1.0 + 1e-3


@pytest.mark.parametrize("out_hw", [(224, 224), (31, 77), (64, 64)])
def test_pil_palette_resize_matches_pil(out_hw):
    """PIL silently resizes P-mode images with NEAREST; we must match it."""
    rng = np.random.RandomState(7)
    mask = rng.randint(0, 4, size=(64, 64), dtype=np.uint8)
    img = Image.fromarray(mask, mode="P")
    ref = np.asarray(img.resize((out_hw[1], out_hw[0]), Image.BILINEAR))
    got = resize_palette_pil(mask, out_hw)
    np.testing.assert_array_equal(got, ref)


def test_nearest_matches_pil():
    rng = np.random.RandomState(11)
    mask = rng.randint(0, 5, size=(100, 73), dtype=np.uint8)
    ref = np.asarray(Image.fromarray(mask).resize((50, 40), Image.NEAREST))
    got = np.asarray(
        resize(jnp.asarray(mask, jnp.float32), (40, 50), method="nearest",
               channel_last=False)
    ).astype(np.uint8)
    np.testing.assert_array_equal(got, ref)


def test_resize_matrix_rows_sum_to_one():
    for method in ("linear", "linear_align_corners", "pil", "nearest"):
        for pair in ((224, 32), (32, 224), (17, 5)):
            R = resize_matrix(*pair, method)
            np.testing.assert_allclose(R.sum(axis=1), 1.0, atol=1e-6)


def test_identity_is_noop():
    x = _rand_img(16, 16)
    got = np.asarray(resize(jnp.asarray(x), (16, 16)))
    np.testing.assert_array_equal(got, x)


def test_channel_first_free_masks():
    m = np.arange(36, dtype=np.float32).reshape(6, 6)
    out = np.asarray(resize(jnp.asarray(m), (3, 3), channel_last=False))
    assert out.shape == (3, 3)
