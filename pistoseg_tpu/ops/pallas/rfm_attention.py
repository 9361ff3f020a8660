"""Fused RFM affinity attention kernel.

The RFM refinement (``revise_net.py:69-96``) is, per image:

    A = softmax(qᵀ·k over rows)          # (L, L), L = h·w spatial tokens
    out = m_flat · A                      # for THREE maps m (pmask/pcam/cam)

i.e. out[:, j] = Σ_i m[:, i] · softmax_i(q_i·k_j) — attention with
queries = k-pixels, keys = q-pixels, values = the map rows.  The torch
reference materializes the full L×L matrix and runs three separate
matmuls against it.

This kernel streams over key-column blocks: for each block of output
pixels j, compute scores S = q·k_blkᵀ (MXU), normalize over the full
i-axis in VMEM (VPU), and apply Sᵀ·v (MXU) — with all three maps
concatenated on the value channel so the affinity is computed ONCE and
never round-trips to HBM.  For L = 1024, D = 192 the whole working set
fits VMEM; the grid is (batch, L/BJ).

Wrapper falls back to a jnp reference off-TPU (and is used with
``interpret=True`` in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, out_ref):
    # q: (L, D); k block: (BJ, D); v: (L, C); out block: (BJ, C)
    q = q_ref[:]
    kb = k_ref[:]
    # HIGHEST: match the XLA reference path bit-for-bit in spirit — the
    # MXU's default single-pass bf16 rounding costs ~4e-2 on the scores
    s = jax.lax.dot_general(
        q, kb, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (L, BJ): s[i, j] = q_i · k_j
    # softmax over i (axis 0) — the reference's dim=1 in (N, hw, hw) layout
    s = s - jnp.max(s, axis=0, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=0, keepdims=True)
    out_ref[:] = jax.lax.dot_general(
        p, v_ref[:], (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (BJ, C)


def _rfm_attention_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          block_j: int, interpret: bool) -> jnp.ndarray:
    n, l, d = q.shape
    c = v.shape[-1]
    grid = (n, pl.cdiv(l, block_j))
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, l, d), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_j, d), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, l, c), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, block_j, c), lambda b, j: (b, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, l, c), jnp.float32),
        interpret=interpret,
    )(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))


def _rfm_attention_reference(q, k, v):
    s = jnp.einsum("nid,njd->nij", q, k, precision=jax.lax.Precision.HIGHEST)
    p = jax.nn.softmax(s, axis=1)
    return jnp.einsum("nij,nic->njc", p, v, precision=jax.lax.Precision.HIGHEST)


# --- differentiable wrapper: Pallas forward, XLA backward -----------------
#
# pallas_call has no automatic VJP; training through the fused kernel needs
# one.  The backward recomputes P = softmax(qᵀk) with XLA (flash-style
# rematerialization — A never persists in HBM between fwd and bwd) and
# applies the standard attention gradients.


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _rfm_attention_diff(q, k, v, block_j):
    return _rfm_attention_pallas(q, k, v, block_j, False)


def _rfm_fwd(q, k, v, block_j):
    return _rfm_attention_pallas(q, k, v, block_j, False), (q, k, v)


def _rfm_bwd(block_j, residuals, g):
    q, k, v = residuals
    hi = jax.lax.Precision.HIGHEST
    s = jnp.einsum("nid,njd->nij", q, k, precision=hi)
    p = jax.nn.softmax(s, axis=1)                       # (N, i, j)
    # out[j, c] = Σ_i p[i, j] v[i, c]
    dv = jnp.einsum("nij,njc->nic", p, g, precision=hi)
    dp = jnp.einsum("nic,njc->nij", v, g, precision=hi)
    # softmax over axis 1 (i): ds = p * (dp − Σ_i p·dp)
    ds = p * (dp - jnp.sum(p * dp, axis=1, keepdims=True))
    dq = jnp.einsum("nij,njd->nid", ds, k, precision=hi)
    dk = jnp.einsum("nij,nid->njd", ds, q, precision=hi)
    return dq, dk, dv


_rfm_attention_diff.defvjp(_rfm_fwd, _rfm_bwd)


@functools.partial(jax.jit, static_argnames=("block_j", "interpret", "use_pallas"))
def rfm_attention(
    q: jnp.ndarray,   # (N, L, D)
    k: jnp.ndarray,   # (N, L, D)
    v: jnp.ndarray,   # (N, L, C) values (maps stacked on C)
    block_j: int = 256,
    interpret: bool = False,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """out[n, j, c] = Σ_i softmax_i(q_i·k_j) · v[n, i, c].

    Differentiable: compiled-TPU calls route through a custom VJP
    (Pallas forward, rematerializing XLA backward)."""
    if not use_pallas or (not interpret and not on_tpu()):
        # off-TPU (and not explicitly interpreting): XLA reference path
        return _rfm_attention_reference(q, k, v)
    l = q.shape[1]
    bj = min(block_j, l)
    if interpret:
        return _rfm_attention_pallas(q, k, v, bj, interpret)
    return _rfm_attention_diff(q, k, v, bj)


def on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")
