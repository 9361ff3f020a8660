"""Tests for on-device overlap-add stitching and d4 TTA."""

import numpy as np

import jax.numpy as jnp

from pistoseg_tpu.ops.stitch import stitch_canvas, CanvasStitcher
from pistoseg_tpu.ops.tta import d4_forward, D4
from pistoseg_tpu.ops.patches import cut_patch_boxes
from pistoseg_tpu.ops.resize import resize


def test_stitch_canvas_overlap_average():
    p = 4
    patches = np.ones((2, p, p, 3), np.float32)
    patches[1] *= 3.0
    ys = np.array([0, 0], np.int32)
    xs = np.array([0, 2], np.int32)
    valid = np.array([True, True])
    value, count = stitch_canvas(
        jnp.asarray(patches), jnp.asarray(ys), jnp.asarray(xs), jnp.asarray(valid), 4, 6
    )
    value, count = np.asarray(value), np.asarray(count)
    assert count[0, 0, 0] == 1 and count[0, 3, 0] == 2 and count[0, 5, 0] == 1
    avg = value / np.maximum(count, 1e-12)
    assert avg[0, 0, 0] == 1.0
    assert avg[0, 3, 0] == 2.0    # overlap of 1 and 3
    assert avg[0, 5, 0] == 3.0


def test_stitch_canvas_padding_patches_ignored():
    p = 4
    patches = np.ones((2, p, p, 1), np.float32) * 7
    ys = xs = np.zeros(2, np.int32)
    valid = np.array([True, False])
    value, count = stitch_canvas(
        jnp.asarray(patches), jnp.asarray(ys), jnp.asarray(xs), jnp.asarray(valid), 4, 4
    )
    assert np.asarray(count).max() == 1.0


def test_canvas_stitcher_full_reconstruction():
    """Stitching constant-prob patches over a full grid reproduces the map."""
    rng = np.random.RandomState(0)
    h, w, c, p, stride = 300, 280, 3, 224, 112
    full = rng.rand(h, w, c).astype(np.float32)
    st = CanvasStitcher(num_classes=c)
    for y, x in cut_patch_boxes(h, w, p, stride):
        st.add("s", 1.0, (h, w), full[y : y + p, x : x + p], y, x)
    out = st.finalize("s")
    np.testing.assert_allclose(out, full, atol=1e-5)


def test_canvas_stitcher_multiscale_ordering():
    """Two scales: result = mean over scales of per-scale resized canvases."""
    rng = np.random.RandomState(1)
    h = w = 224
    m1 = rng.rand(h, w, 3).astype(np.float32)
    m2 = rng.rand(2 * h, 2 * w, 3).astype(np.float32)
    st = CanvasStitcher(3)
    st.add("s", 1.0, (h, w), m1, 0, 0)
    for y in (0, 224):
        for x in (0, 224):
            st.add("s", 2.0, (h, w), m2[y : y + 224, x : x + 224], y, x)
    out = st.finalize("s")
    m2_native = np.asarray(resize(jnp.asarray(m2), (h, w), "linear"))
    np.testing.assert_allclose(out, (m1 + m2_native) / 2, atol=1e-5)


def test_d4_forward_identity_model():
    """For an equivariance-respecting model (identity), TTA is exact."""
    rng = np.random.RandomState(2)
    x = rng.rand(2, 16, 16, 3).astype(np.float32)
    out = np.asarray(d4_forward(lambda v: v, jnp.asarray(x)))
    np.testing.assert_allclose(out, x, atol=1e-6)


def test_d4_has_eight_distinct_views():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    views = set()
    from pistoseg_tpu.ops.tta import _apply
    for k, f in D4:
        views.add(np.asarray(_apply(x, k, f)).tobytes())
    assert len(views) == 8


def test_d4_forward_averages_views():
    """A non-equivariant model: result equals hand-computed mean."""
    rng = np.random.RandomState(3)
    x = rng.rand(1, 8, 8, 1).astype(np.float32)
    w = rng.rand(8, 8, 1).astype(np.float32)

    def model(v):
        return v * jnp.asarray(w)[None]

    from pistoseg_tpu.ops.tta import _apply, _invert
    expect = np.zeros_like(x)
    for k, f in D4:
        view = _apply(jnp.asarray(x), k, f)
        expect += np.asarray(_invert(model(view), k, f))
    expect /= len(D4)
    got = np.asarray(d4_forward(model, jnp.asarray(x)))
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_canvas_stitcher_matches_host_reference_ragged():
    """Device masked stitch == naive host += accumulation (the reference
    semantics, mosaic_module.py:160-199), including cropped tail patches
    and canvas-size bucketing."""
    rng = np.random.RandomState(4)
    c, p = 3, 32
    natives = {"a": (70, 90), "b": (40, 33)}
    scales = (1.0, 1.5)
    st = CanvasStitcher(num_classes=c)
    host_val, host_cnt = {}, {}
    for slide, (h0, w0) in natives.items():
        for s in scales:
            sh, sw = int(h0 * s), int(w0 * s)
            k = f"{slide}_{s}"
            host_val[k] = np.zeros((sh, sw, c), np.float32)
            host_cnt[k] = np.zeros((sh, sw, 1), np.float32)
            for _ in range(rng.randint(3, 7)):
                ph = rng.randint(8, p + 1)
                pw = rng.randint(8, p + 1)
                y = rng.randint(0, sh - ph + 1)
                x = rng.randint(0, sw - pw + 1)
                patch = np.zeros((p, p, c), np.float32)
                patch[:ph, :pw] = rng.rand(ph, pw, c)
                st.add(slide, s, (h0, w0), patch, y, x, crop_hw=(ph, pw))
                host_val[k][y : y + ph, x : x + pw] += patch[:ph, :pw]
                host_cnt[k][y : y + ph, x : x + pw] += 1.0

    for slide, (h0, w0) in natives.items():
        acc = np.zeros((h0, w0, c), np.float32)
        for s in scales:
            k = f"{slide}_{s}"
            canvas = host_val[k] / np.maximum(host_cnt[k], 1e-12)
            acc += np.asarray(resize(jnp.asarray(canvas), (h0, w0), "linear"))
        ref = acc / len(scales)
        np.testing.assert_allclose(st.finalize(slide), ref, atol=1e-5)


def test_canvas_stitcher_incremental_flush_equivalence():
    """ADVICE r2: host buffers are bounded — a stitcher flushing every 4
    patches to running device canvases produces the same result as one
    buffering the whole pass, and frees its buffers as it goes."""
    rng = np.random.RandomState(7)
    c, p = 3, 16
    h0, w0 = 48, 64
    one = CanvasStitcher(num_classes=c, flush_every=10_000)
    inc = CanvasStitcher(num_classes=c, flush_every=4)
    for _ in range(11):
        ph = rng.randint(6, p + 1)
        pw = rng.randint(6, p + 1)
        y = rng.randint(0, h0 - ph + 1)
        x = rng.randint(0, w0 - pw + 1)
        patch = np.zeros((p, p, c), np.float32)
        patch[:ph, :pw] = rng.rand(ph, pw, c)
        for st in (one, inc):
            st.add("s", 1.0, (h0, w0), patch, y, x, crop_hw=(ph, pw))
    # flushing kept at most flush_every-1 patches on the host
    assert len(inc._buf.get("s_1.0", [])) < 4 and "s_1.0" in inc._partial
    np.testing.assert_allclose(inc.finalize("s"), one.finalize("s"),
                               atol=1e-5)
    # finalize consumed the slide's state
    assert not inc._buf and not inc._partial and not inc._scales
