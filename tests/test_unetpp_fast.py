"""Parity tests for the space-to-depth UNet++ inference path.

VERDICT r2 #1's bar: the re-laid-out decoder must be numerically
identical (≤1e-5) to the reference-layout one.  The s2d path is an exact
rearrangement (same products, same sums), so float32 agreement is tight.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from pistoseg_tpu.models.unetpp import UnetPlusPlus
from pistoseg_tpu.models.unetpp_fast import (
    depth_to_space,
    fast_train_apply,
    make_fast_infer,
    s2d_kernel,
    s2d_kernel_collapsed,
    space_to_depth,
)


def test_space_to_depth_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 10, 5), jnp.float32)
    s = space_to_depth(x)
    assert s.shape == (2, 4, 5, 20)
    np.testing.assert_array_equal(depth_to_space(s), x)
    # channel-major packing: phases of channel c are contiguous
    np.testing.assert_array_equal(s[0, 1, 2, 3 * 4 + 2], x[0, 3, 4, 3])


def test_s2d_block_kernel_identity():
    """conv3x3(x, W) == d2s(conv3x3(s2d(x), W_blk)) including SAME edges."""
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 10, 14, 5), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, 5, 7), jnp.float32)
    dn = ("NHWC", "HWIO", "NHWC")
    ref = lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=dn)
    blk = lax.conv_general_dilated(space_to_depth(x), s2d_kernel(w), (1, 1),
                                   "SAME", dimension_numbers=dn)
    np.testing.assert_allclose(depth_to_space(blk), ref, rtol=1e-6, atol=1e-5)


def test_s2d_collapsed_kernel_identity():
    """conv3x3(upsample2x(h), W) == d2s(conv3x3(h, W_col)): the ×2-nearest
    upsample folds into the collapsed kernel with no FLOP blowup."""
    rs = np.random.RandomState(3)
    h = jnp.asarray(rs.randn(2, 6, 9, 5), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, 5, 7), jnp.float32)
    dn = ("NHWC", "HWIO", "NHWC")
    up = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)       # ×2 nearest
    ref = lax.conv_general_dilated(up, w, (1, 1), "SAME", dimension_numbers=dn)
    col = lax.conv_general_dilated(h, s2d_kernel_collapsed(w), (1, 1), "SAME",
                                   dimension_numbers=dn)
    np.testing.assert_allclose(depth_to_space(col), ref, rtol=1e-6, atol=1e-5)


def test_make_fast_infer_matches_fast_eval():
    """Production bundle (eager prep + jitted forward) == fast_eval."""
    model = UnetPlusPlus(num_classes=3, encoder_name="efficientnet-b0",
                         dtype=jnp.float32, s2d_threshold=16)
    x = jnp.asarray(np.random.RandomState(4).rand(2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x)
    ref = model.apply(variables, x, method="fast_eval")
    infer, prep = make_fast_infer(model, variables)
    fast = jax.jit(infer)(variables, prep, x)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def _train_setup(threshold, seed=5):
    model = UnetPlusPlus(num_classes=3, encoder_name="efficientnet-b0",
                         dtype=jnp.float32, s2d_threshold=threshold)
    x = jnp.asarray(np.random.RandomState(seed).rand(2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(7), x)
    rngs = {"dropout": jax.random.PRNGKey(11),
            "droppath": jax.random.PRNGKey(12)}
    return model, variables, x, rngs


@pytest.mark.parametrize("threshold", [16, 32])
def test_fast_train_matches_reference_train_forward(threshold):
    """VERDICT r3 #3: train-mode s2d forward == flax train forward in f32 —
    logits AND the full batch_stats update (phase-pooled BN moments are
    exactly the reference spatial moments)."""
    model, variables, x, rngs = _train_setup(threshold)
    ref, upd = model.apply(variables, x, train=True,
                           mutable=["batch_stats"], rngs=rngs)
    fast, new_bs = fast_train_apply(model, variables["params"],
                                    variables["batch_stats"], x, rngs=rngs)
    # identity up to f32 reduction order (measured worst case 1.5e-5)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-4, atol=2e-5)
    ref_bs = upd["batch_stats"]
    assert (jax.tree_util.tree_structure(ref_bs)
            == jax.tree_util.tree_structure(new_bs))
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref_bs),
        jax.tree_util.tree_leaves_with_path(new_bs),
    ):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(pa))


def test_fast_train_grads_match_reference():
    """Gradients through the in-trace kernel re-layout land on the
    reference-layout parameters exactly (scatter transpose = gather)."""
    model, variables, x, rngs = _train_setup(16)
    params, bs = variables["params"], variables["batch_stats"]
    w = jnp.asarray(np.random.RandomState(9).randn(2, 64, 64, 3), jnp.float32)

    def loss_ref(p):
        out, _ = model.apply({"params": p, "batch_stats": bs}, x,
                             train=True, mutable=["batch_stats"], rngs=rngs)
        return jnp.mean(out * w)

    def loss_fast(p):
        out, _ = fast_train_apply(model, p, bs, x, rngs=rngs)
        return jnp.mean(out * w)

    g_ref = jax.grad(loss_ref)(params)
    g_fast = jax.grad(loss_fast)(params)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_fast),
    ):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(pa))


@pytest.mark.parametrize("threshold", [16, 32, 64])
def test_fast_eval_matches_reference_forward(threshold):
    """Full-model identity: fast_eval == __call__(train=False) in f32."""
    model = UnetPlusPlus(num_classes=3, encoder_name="efficientnet-b0",
                         dtype=jnp.float32, s2d_threshold=threshold)
    x = jnp.asarray(np.random.RandomState(2).rand(2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(variables, x, train=False)
    fast = model.apply(variables, x, method="fast_eval")
    assert fast.shape == ref.shape
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
