"""Pallas kernels vs XLA references (interpret mode on the CPU mesh)."""

import numpy as np

import jax
import jax.numpy as jnp

from pistoseg_tpu.ops.pallas.rfm_attention import (
    _rfm_attention_reference,
    rfm_attention,
)
from pistoseg_tpu.ops.stitch import stitch_canvas


def test_rfm_attention_matches_reference():
    rng = np.random.RandomState(0)
    n, l, d, c = 2, 64, 32, 8
    q = jnp.asarray(rng.randn(n, l, d), jnp.float32)
    k = jnp.asarray(rng.randn(n, l, d), jnp.float32)
    v = jnp.asarray(rng.randn(n, l, c), jnp.float32)
    ref = np.asarray(_rfm_attention_reference(q, k, v))
    got = np.asarray(rfm_attention(q, k, v, block_j=32, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_rfm_attention_columns_normalized():
    """Each output pixel must be a convex combination of input pixels."""
    rng = np.random.RandomState(1)
    n, l, d = 1, 16, 8
    q = jnp.asarray(rng.randn(n, l, d), jnp.float32)
    k = jnp.asarray(rng.randn(n, l, d), jnp.float32)
    v = jnp.ones((n, l, 4), jnp.float32)
    out = np.asarray(rfm_attention(q, k, v, block_j=16, interpret=True))
    np.testing.assert_allclose(out, 1.0, atol=1e-5)



def test_rfm_attention_vjp_matches_reference_grad():
    """Custom VJP (used on compiled TPU) vs autodiff of the XLA reference."""
    from pistoseg_tpu.ops.pallas.rfm_attention import _rfm_bwd

    rng = np.random.RandomState(4)
    n, l, d, c = 1, 16, 8, 4
    q = jnp.asarray(rng.randn(n, l, d), jnp.float32)
    k = jnp.asarray(rng.randn(n, l, d), jnp.float32)
    v = jnp.asarray(rng.randn(n, l, c), jnp.float32)
    g = jnp.asarray(rng.randn(n, l, c), jnp.float32)

    def loss_ref(q, k, v):
        from pistoseg_tpu.ops.pallas.rfm_attention import _rfm_attention_reference
        return jnp.sum(_rfm_attention_reference(q, k, v) * g)

    dq_ref, dk_ref, dv_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    dq, dk, dv = _rfm_bwd(16, (q, k, v), g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), atol=1e-4)
