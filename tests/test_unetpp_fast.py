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
