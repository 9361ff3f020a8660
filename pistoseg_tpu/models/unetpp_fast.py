"""Space-to-depth inference path for the UNet++ decoder.

Why: matching smp's ``UnetPlusPlus(decoder_attention_type='scse')``
(``/root/reference/models/mosaic_module.py:78-86``) exactly means the
decoder's widest feature maps run at tiny channel counts — the final
column computes 16-channel 3×3 convs at 224².  On the MXU (128×128
systolic tiles) C_out = 16 fills 12.5% of the output lanes and
9·C_in ≤ 432 fills ≤ 3/128 contraction tiles after im2col: the array
mostly multiplies zero padding (PERF.md).

Fix: evaluate those columns on a half-resolution grid with 2×2 pixel
blocks packed into channels — ``x_s2d[n, i, j, c*4 + (a*2+b)] =
x[n, 2i+a, 2j+b, c]`` (channel-major phase packing, so channel-concat
stays valid) — with the 3×3 kernels *exactly* rearranged into block
kernels ``(3, 3, 4C_in, 4C_out)``.  Every output element is the same sum
of the same products as the reference layout (zero-padded SAME edges
included), so this is a numerical identity, not an approximation; only
float reduction order differs.  The ×2 nearest upsample feeding each
column becomes a free channel repeat (the 224² grid is never
materialized until the final depth-to-space).

The block-kernel identity: for output pixel y[2I+a_o, 2J+b_o] =
Σ_{ki,kj} W[ki,kj]·x[2I+a_o+ki−1, 2J+b_o+kj−1], write the input index as
2(I+d_i)+a_i with (d_i, a_i) = divmod(a_o+ki−1, 2).  Then
W_blk[d_i+1, d_j+1, c_i·4+(a_i·2+b_i), c_o·4+(a_o·2+b_o)] = W[ki,kj,c_i,c_o];
each (ki, a_o) maps to a unique (d_i, a_i) so there are no collisions, and
the impossible corner taps (|offset| = 2) stay zero, which makes SAME
padding in block space agree with SAME padding in pixel space.

This module is pure functions over the flax variable tree of
``unetpp.UnetPlusPlusDecoder`` — training and checkpoints are untouched.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")
_BN_EPS = 1e-5  # flax nn.BatchNorm default, as used by ConvBNReLU


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) → (N, H/2, W/2, 4C), channel-major phase packing."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)          # (n, h/2, w/2, c, a, b)
    return x.reshape(n, h // 2, w // 2, c * 4)


def depth_to_space(y: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    n, h2, w2, c4 = y.shape
    c = c4 // 4
    y = y.reshape(n, h2, w2, c, 2, 2)
    y = y.transpose(0, 1, 4, 2, 5, 3)          # (n, h/2, a, w/2, b, c)
    return y.reshape(n, h2 * 2, w2 * 2, c)


def s2d_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) → the equivalent (3, 3, 4Cin, 4Cout) block kernel."""
    kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3, "s2d re-layout implemented for 3x3 kernels"
    blk = jnp.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for ki in range(3):
        for kj in range(3):
            for ao in range(2):
                for bo in range(2):
                    di, ai = divmod(ao + ki - 1, 2)
                    dj, bi = divmod(bo + kj - 1, 2)
                    pin, pout = ai * 2 + bi, ao * 2 + bo
                    blk = blk.at[di + 1, dj + 1, pin::4, pout::4].set(w[ki, kj])
    return blk


def _rep4(v: jnp.ndarray) -> jnp.ndarray:
    """Per-channel vector → per-s2d-channel (channel-major: repeat each)."""
    return jnp.repeat(v, 4)


def _fold_bn(kernel, bn_p, bn_s):
    """Fold eval-mode BatchNorm into the preceding conv's kernel + a bias."""
    inv = bn_p["scale"] * lax.rsqrt(bn_s["var"] + _BN_EPS)
    return kernel * inv, bn_p["bias"] - bn_s["mean"] * inv


def _conv_bn_relu(pv: Dict, bv: Dict, x: jnp.ndarray, s2d: bool) -> jnp.ndarray:
    k, b = _fold_bn(pv["Conv_0"]["kernel"], pv["BatchNorm_0"], bv["BatchNorm_0"])
    if s2d:
        k, b = s2d_kernel(k), _rep4(b)
    y = lax.conv_general_dilated(x, k.astype(x.dtype), (1, 1), "SAME",
                                 dimension_numbers=_DN)
    return nn_relu(y + b.astype(y.dtype))


def nn_relu(x):
    return jnp.maximum(x, 0)


def _scse(pv: Dict, x: jnp.ndarray, s2d: bool) -> jnp.ndarray:
    """smp 'scse' attention, evaluated in either layout (unetpp.SCSE)."""
    dt = x.dtype
    if s2d:
        c4 = x.shape[-1]
        c = c4 // 4
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))      # (N, 4C)
        pooled = pooled.reshape(-1, c, 4).mean(-1).astype(dt)      # (N, C)
    else:
        c = x.shape[-1]
        pooled = jnp.mean(x, axis=(1, 2))
    # cSE: 1×1 convs on the pooled vector are plain matmuls
    r = pv["cse_reduce"]
    s = nn_relu(pooled @ r["kernel"][0, 0].astype(dt) + r["bias"].astype(dt))
    e = pv["cse_expand"]
    s = s @ e["kernel"][0, 0].astype(dt) + e["bias"].astype(dt)
    cscale = jax.nn.sigmoid(s)                                     # (N, C)
    # sSE: per-pixel 1×1 → sigmoid gate
    w = pv["sse"]["kernel"]                                        # (1,1,C,1)
    b = pv["sse"]["bias"]
    if s2d:
        blk = jnp.zeros((1, 1, 4 * c, 4), w.dtype)
        for p in range(4):
            blk = blk.at[0, 0, p::4, p].set(w[0, 0, :, 0])
        q = lax.conv_general_dilated(x, blk.astype(dt), (1, 1), "SAME",
                                     dimension_numbers=_DN) + b.astype(dt)
        sgate = jax.nn.sigmoid(q)                                  # (N,h,w,4)
        cse = x * jnp.repeat(cscale, 4, axis=-1)[:, None, None, :]
        sse = x * jnp.tile(sgate, (1, 1, 1, c))
    else:
        q = lax.conv_general_dilated(x, w.astype(dt), (1, 1), "SAME",
                                     dimension_numbers=_DN) + b.astype(dt)
        cse = x * cscale[:, None, None, :]
        sse = x * jax.nn.sigmoid(q)
    return cse + sse


def _block(pv: Dict, bv: Dict, x: jnp.ndarray,
           skips: Sequence[jnp.ndarray], attention: Optional[str],
           s2d: bool) -> jnp.ndarray:
    """DecoderBlock forward on an already-upsampled input (either layout)."""
    if skips:
        x = jnp.concatenate([x] + [s.astype(x.dtype) for s in skips], axis=-1)
        if attention == "scse":
            x = _scse(pv["attention1"], x, s2d)
    x = _conv_bn_relu(pv["conv1"], bv["conv1"], x, s2d)
    x = _conv_bn_relu(pv["conv2"], bv["conv2"], x, s2d)
    if attention == "scse":
        x = _scse(pv["attention2"], x, s2d)
    return x


def _upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def fast_decoder_head(
    decoder_vars: Dict,
    head_vars: Dict,
    features: Sequence[jnp.ndarray],
    decoder_channels: Sequence[int],
    attention: Optional[str],
    num_classes: int,
    threshold: int = 32,
    dtype: Any = jnp.float32,
) -> jnp.ndarray:
    """UNet++ decoder + head forward, s2d layout for low-channel columns.

    Mirrors ``unetpp.UnetPlusPlusDecoder.__call__`` exactly (same smp
    wiring, ``mosaic_module.py:78-86``); a column runs in s2d when every
    conv output width in it is ≤ ``threshold``.
    """
    p, bs = decoder_vars["params"], decoder_vars["batch_stats"]
    feats = list(features)[::-1]               # deepest first
    depth = len(feats) - 1
    dch = list(decoder_channels)

    def col_widths(li):
        if li == depth:
            return [dch[li]]
        return [dch[li], feats[li + 1].shape[-1]]

    use_s2d = {li: (threshold > 0 and max(col_widths(li)) <= threshold)
               for li in range(depth + 1)}

    dense: Dict = {}        # normal-layout outputs (input to the next column)
    dense_s2d: Dict = {}    # s2d-layout outputs (skips within an s2d column)
    feats_s2d: Dict = {}    # s2d view of encoder skips, cached per level

    def feat_skip(li):
        if use_s2d[li]:
            if li not in feats_s2d:
                feats_s2d[li] = space_to_depth(feats[li + 1].astype(dtype))
            return feats_s2d[li]
        return feats[li + 1]

    def run(d, li, x_half, skips):
        s2d = use_s2d[li]
        # ×2 nearest upsample: in s2d layout every phase equals the source
        # pixel, so the upsample is a channel repeat on the HALF-res grid
        x = (jnp.repeat(x_half, 4, axis=-1) if s2d
             else _upsample2x_nearest(x_half))
        y = _block(p[f"x_{d}_{li}"], bs[f"x_{d}_{li}"], x, skips, attention, s2d)
        dense_s2d[(d, li)] = y if s2d else None
        dense[(d, li)] = depth_to_space(y) if s2d else y

    for layer in range(depth):                 # smp diagonal loop
        for d in range(depth - layer):
            li = d + layer
            if layer == 0:
                run(d, li, feats[d].astype(dtype), [feat_skip(li)])
            else:
                if use_s2d[li]:
                    cat = [dense_s2d[(idx, li)] for idx in range(d + 1, li + 1)]
                else:
                    cat = [dense[(idx, li)] for idx in range(d + 1, li + 1)]
                run(d, li, dense[(d, li - 1)].astype(dtype),
                    cat + [feat_skip(li)])
    # final column: ×2 to input resolution, no skip
    run(0, depth, dense[(0, depth - 1)], [])

    hk = head_vars["params"]["kernel"].astype(jnp.float32)
    hb = head_vars["params"]["bias"].astype(jnp.float32)
    if use_s2d[depth]:
        y = dense_s2d[(0, depth)].astype(jnp.float32)
        out = lax.conv_general_dilated(y, s2d_kernel(hk), (1, 1), "SAME",
                                       dimension_numbers=_DN) + _rep4(hb)
        return depth_to_space(out)
    y = dense[(0, depth)].astype(jnp.float32)
    return lax.conv_general_dilated(y, hk, (1, 1), "SAME",
                                    dimension_numbers=_DN) + hb
