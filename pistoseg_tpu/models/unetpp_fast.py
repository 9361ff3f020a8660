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

Structure: :func:`prepare_fast_vars` folds eval-mode BatchNorm into the
convs and performs every kernel re-layout ONCE (call it eagerly, outside
jit — the 36 strided scatters per block kernel are not something to
re-execute on the device every forward); :func:`fast_forward` is the
pure jit-friendly forward over the prepared tree.  :func:`make_fast_infer`
bundles both for production (stage-3 inference, bench).
``UnetPlusPlus.fast_eval`` routes through the same code with the
preparation traced inline, so the parity tests cover one code path.

This module is pure functions over the flax variable tree of
``unetpp.UnetPlusPlusDecoder`` — training and checkpoints are untouched.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

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


def s2d_kernel_collapsed(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) → (3, 3, Cin, 4Cout) for a phase-identical input.

    When the conv input is a ×2-nearest upsample (every 2×2 block of
    pixels equal), the four input phases of the s2d layout coincide, so
    the (3,3,4Cin,4Cout) block kernel collapses over its input phases:
    the half-res source feeds the conv directly with NO ×4 FLOP blowup
    (this is exactly the full-res conv's FLOP count, at 4× the output
    lanes).  Accumulates taps that alias to the same half-res offset."""
    kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3
    blk = jnp.zeros((3, 3, cin, 4 * cout), w.dtype)
    for ki in range(3):
        for kj in range(3):
            for ao in range(2):
                for bo in range(2):
                    di, _ = divmod(ao + ki - 1, 2)
                    dj, _ = divmod(bo + kj - 1, 2)
                    po = ao * 2 + bo
                    blk = blk.at[di + 1, dj + 1, :, po::4].add(w[ki, kj])
    return blk


def sse_s2d_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(1, 1, C, 1) sSE gate kernel → (1, 1, 4C, 4) per-phase block kernel."""
    c = w.shape[2]
    blk = jnp.zeros((1, 1, 4 * c, 4), w.dtype)
    for p in range(4):
        blk = blk.at[0, 0, p::4, p].set(w[0, 0, :, 0])
    return blk


def _rep4(v: jnp.ndarray) -> jnp.ndarray:
    """Per-channel vector → per-s2d-channel (channel-major: repeat each)."""
    return jnp.repeat(v, 4)


def _fold_bn(kernel, bn_p, bn_s):
    """Fold eval-mode BatchNorm into the preceding conv's kernel + a bias."""
    inv = bn_p["scale"] * lax.rsqrt(bn_s["var"] + _BN_EPS)
    return kernel * inv, bn_p["bias"] - bn_s["mean"] * inv


def nn_relu(x):
    return jnp.maximum(x, 0)


# --- preparation (run eagerly, once per checkpoint) -------------------------


def _col_use_s2d(
    encoder_channels: Sequence[int],
    decoder_channels: Sequence[int],
    threshold: int,
) -> Dict[int, bool]:
    """Which decoder columns run in s2d layout.

    A column runs s2d when every conv output width in it is ≤ threshold
    (column li's convs are dch[li] wide on the main row and
    encoder-tap-wide on dense rows)."""
    taps = list(encoder_channels)[::-1]        # deepest first, f(32)..f(2)
    depth = len(taps) - 1
    dch = list(decoder_channels)

    def col_widths(li):
        if li == depth:
            return [dch[li]]
        return [dch[li], taps[li + 1]]

    return {li: (threshold > 0 and max(col_widths(li)) <= threshold)
            for li in range(depth + 1)}


def _prep_conv(pv: Dict, bv: Dict, s2d: bool, dtype,
               collapse: bool = False) -> Dict[str, jnp.ndarray]:
    k, b = _fold_bn(pv["Conv_0"]["kernel"].astype(jnp.float32),
                    jax.tree.map(lambda a: a.astype(jnp.float32), pv["BatchNorm_0"]),
                    jax.tree.map(lambda a: a.astype(jnp.float32), bv["BatchNorm_0"]))
    if s2d:
        k, b = (s2d_kernel_collapsed(k) if collapse else s2d_kernel(k)), _rep4(b)
    return {"kernel": k.astype(dtype), "bias": b.astype(dtype)}


def _prep_scse(pv: Dict, s2d: bool, dtype) -> Dict[str, jnp.ndarray]:
    out = {
        "cse_reduce_w": pv["cse_reduce"]["kernel"][0, 0].astype(dtype),
        "cse_reduce_b": pv["cse_reduce"]["bias"].astype(dtype),
        "cse_expand_w": pv["cse_expand"]["kernel"][0, 0].astype(dtype),
        "cse_expand_b": pv["cse_expand"]["bias"].astype(dtype),
        "sse_b": pv["sse"]["bias"].astype(dtype),
    }
    w = pv["sse"]["kernel"]
    out["sse_w"] = (sse_s2d_kernel(w) if s2d else w).astype(dtype)
    return out


def prepare_fast_vars(
    decoder_vars: Dict,
    head_vars: Dict,
    encoder_channels: Sequence[int],
    decoder_channels: Sequence[int],
    attention: Optional[str],
    threshold: int = 32,
    dtype: Any = jnp.float32,
) -> Dict:
    """Fold BN and re-layout kernels for :func:`fast_forward`.

    Call OUTSIDE jit: the s2d kernel rearrangements are dozens of strided
    scatters per block — done here once, they cost nothing per step."""
    p, bs = decoder_vars["params"], decoder_vars["batch_stats"]
    use_s2d = _col_use_s2d(encoder_channels, decoder_channels, threshold)
    prep: Dict = {}
    depth_ = len(list(encoder_channels)) - 1
    for name, bp in p.items():
        li = int(name.split("_")[-1])
        s2d = use_s2d[li]
        # the no-skip final block's conv1 input is a pure ×2 upsample:
        # feed the half-res source straight in via the collapsed kernel
        collapse1 = s2d and li == depth_
        blk: Dict = {
            "conv1": _prep_conv(bp["conv1"], bs[name]["conv1"], s2d, dtype,
                                collapse=collapse1),
            "conv2": _prep_conv(bp["conv2"], bs[name]["conv2"], s2d, dtype),
        }
        if attention == "scse":
            if "attention1" in bp:
                blk["attention1"] = _prep_scse(bp["attention1"], s2d, dtype)
            blk["attention2"] = _prep_scse(bp["attention2"], s2d, dtype)
        prep[name] = blk
    depth = len(list(encoder_channels)) - 1
    hk = head_vars["params"]["kernel"].astype(jnp.float32)
    hb = head_vars["params"]["bias"].astype(jnp.float32)
    if use_s2d[depth]:
        prep["head"] = {"kernel": s2d_kernel(hk), "bias": _rep4(hb)}
    else:
        prep["head"] = {"kernel": hk, "bias": hb}
    return prep


# --- forward (pure over the prepared tree; jit-friendly) --------------------


def _conv_bias_relu(prep_conv: Dict, x: jnp.ndarray) -> jnp.ndarray:
    y = lax.conv_general_dilated(x, prep_conv["kernel"].astype(x.dtype), (1, 1),
                                 "SAME", dimension_numbers=_DN)
    return nn_relu(y + prep_conv["bias"].astype(y.dtype))


def global_mean(arr: jnp.ndarray, s2d_layout: bool) -> jnp.ndarray:
    """(N, C) f32 global spatial mean of a map in either layout."""
    m = jnp.mean(arr.astype(jnp.float32), axis=(1, 2))
    if s2d_layout:
        m = m.reshape(m.shape[0], -1, 4).mean(-1)      # fold 2×2 phases
    return m


def _scse(pv: Dict, x: jnp.ndarray, s2d: bool,
          pooled: jnp.ndarray) -> jnp.ndarray:
    """smp 'scse' attention, evaluated in either layout (unetpp.SCSE).

    ``pooled`` is the (N, C) f32 global mean of ``x`` in REFERENCE layout —
    passed in so the caller can assemble it from cached per-part means
    (mean of a channel concat = concat of part means; mean of a ×2-nearest
    upsample = mean of its half-res source) instead of re-reading the
    full-resolution map from HBM for every attention."""
    dt = x.dtype
    c = x.shape[-1] // 4 if s2d else x.shape[-1]
    pooled = pooled.astype(dt)
    # cSE: 1×1 convs on the pooled vector are plain matmuls
    s = nn_relu(pooled @ pv["cse_reduce_w"].astype(dt) + pv["cse_reduce_b"].astype(dt))
    s = s @ pv["cse_expand_w"].astype(dt) + pv["cse_expand_b"].astype(dt)
    cscale = jax.nn.sigmoid(s)                                     # (N, C)
    # sSE: per-pixel 1×1 → sigmoid gate
    q = lax.conv_general_dilated(x, pv["sse_w"].astype(dt), (1, 1), "SAME",
                                 dimension_numbers=_DN) + pv["sse_b"].astype(dt)
    if s2d:
        # gate = cscale (per n,c) + sgate (per n,h,w,phase); apply in one
        # fused broadcast over the (c, phase) split — no tile materialized
        n, h, w, _ = x.shape
        sgate = jax.nn.sigmoid(q)                                  # (N,h,w,4)
        gate = (cscale[:, None, None, :, None]
                + sgate[:, :, :, None, :])                         # (N,h,w,c,4)
        return (x.reshape(n, h, w, c, 4) * gate).reshape(x.shape)
    return x * (cscale[:, None, None, :] + jax.nn.sigmoid(q))


def _block(blk: Dict, x: jnp.ndarray, skips: Sequence[jnp.ndarray],
           attention: Optional[str], s2d: bool,
           pooled1: Optional[jnp.ndarray], need_mean: bool):
    """DecoderBlock forward on an already-upsampled input (either layout).

    ``pooled1``: precomputed (N, ΣC) f32 mean of the concat input for
    attention1 (None when there are no skips / no attention).  Returns
    ``(out, mean_out)``: ``mean_out`` is the f32 mean of the block OUTPUT
    (post-attention2) when ``need_mean`` — cached by the caller so
    downstream attention1s never re-read this map for pooling."""
    if skips:
        x = jnp.concatenate([x] + [s.astype(x.dtype) for s in skips], axis=-1)
        if attention == "scse":
            x = _scse(blk["attention1"], x, s2d, pooled1)
    x = _conv_bias_relu(blk["conv1"], x)
    x = _conv_bias_relu(blk["conv2"], x)
    if attention == "scse":
        x = _scse(blk["attention2"], x, s2d, global_mean(x, s2d))
    mean_out = global_mean(x, s2d) if need_mean else None
    return x, mean_out


def _upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def _decoder_loop(
    block_fn,
    head_fn,
    features: Sequence[jnp.ndarray],
    decoder_channels: Sequence[int],
    attention: Optional[str],
    threshold: int,
    dtype: Any,
) -> jnp.ndarray:
    """The shared UNet++ dense-grid walk (smp wiring, s2d column routing,
    cached scSE pooling) — parameterized over how a block/head computes so
    the prep-folded inference path and the train-mode BN path run the SAME
    wiring (``fast_forward`` / ``fast_train_forward``).

    ``block_fn(name, x, skips, s2d, pooled1, need_mean) -> (y, mean|None)``;
    ``head_fn(y, s2d) -> logits`` (s2d output is depth_to_space'd here).
    """
    feats = list(features)[::-1]               # deepest first
    depth = len(feats) - 1
    use_s2d = _col_use_s2d([f.shape[-1] for f in features],
                           decoder_channels, threshold)

    dense: Dict = {}        # normal-layout outputs (input to the next column)
    dense_s2d: Dict = {}    # s2d-layout outputs (skips within an s2d column)
    feats_s2d: Dict = {}    # s2d view of encoder skips, cached per level
    means: Dict = {}        # map key → (N, C) f32 global mean, computed once

    scse = attention == "scse"

    def feat_skip(li):
        if use_s2d[li]:
            if li not in feats_s2d:
                feats_s2d[li] = space_to_depth(feats[li + 1].astype(dtype))
            return feats_s2d[li]
        return feats[li + 1]

    def feat_mean(idx):
        key = ("feat", idx)
        if key not in means:
            means[key] = global_mean(feats[idx], False)
        return means[key]

    def run(d, li, x_half, skips, pooled_parts, need_mean):
        s2d = use_s2d[li]
        # ×2 nearest upsample: in s2d layout every phase equals the source
        # pixel, so the upsample is a channel repeat on the HALF-res grid —
        # and with no skips (final block) the repeat folds into conv1's
        # collapsed kernel, avoiding the ×4 FLOP blowup entirely
        if s2d:
            x = x_half if not skips else jnp.repeat(x_half, 4, axis=-1)
        else:
            x = _upsample2x_nearest(x_half)
        # attention1's cSE pool, assembled from cached per-part means in
        # concat channel order (mean of upsample == mean of its source)
        pooled1 = (jnp.concatenate(pooled_parts, axis=-1)
                   if (skips and scse) else None)
        y, m = block_fn(f"x_{d}_{li}", x, skips, s2d,
                        pooled1, need_mean and scse)
        if m is not None:
            means[(d, li)] = m
        dense_s2d[(d, li)] = y if s2d else None
        dense[(d, li)] = depth_to_space(y) if s2d else y

    for layer in range(depth):                 # smp diagonal loop
        for d in range(depth - layer):
            li = d + layer
            # dense[(0, depth-1)] feeds only the skip-less final block:
            # nothing downstream pools it
            need_mean = not (d == 0 and li == depth - 1)
            if layer == 0:
                run(d, li, feats[d].astype(dtype), [feat_skip(li)],
                    [feat_mean(d), feat_mean(li + 1)] if scse else [],
                    need_mean)
            else:
                if use_s2d[li]:
                    cat = [dense_s2d[(idx, li)] for idx in range(d + 1, li + 1)]
                else:
                    cat = [dense[(idx, li)] for idx in range(d + 1, li + 1)]
                pooled_parts = ([means[(d, li - 1)]]
                                + [means[(idx, li)] for idx in range(d + 1, li + 1)]
                                + [feat_mean(li + 1)]) if scse else []
                run(d, li, dense[(d, li - 1)].astype(dtype),
                    cat + [feat_skip(li)], pooled_parts, need_mean)
    # final column: ×2 to input resolution, no skip
    run(0, depth, dense[(0, depth - 1)], [], [], False)

    if use_s2d[depth]:
        return depth_to_space(head_fn(dense_s2d[(0, depth)], True))
    return head_fn(dense[(0, depth)], False)


def fast_forward(
    prep: Dict,
    features: Sequence[jnp.ndarray],
    decoder_channels: Sequence[int],
    attention: Optional[str],
    threshold: int = 32,
    dtype: Any = jnp.float32,
) -> jnp.ndarray:
    """UNet++ decoder + head forward over a prepared tree.

    Mirrors ``unetpp.UnetPlusPlusDecoder.__call__`` exactly (same smp
    wiring, ``mosaic_module.py:78-86``); columns selected by
    :func:`_col_use_s2d` run in the space-to-depth layout.
    """

    def block_fn(name, x, skips, s2d, pooled1, need_mean):
        return _block(prep[name], x, skips, attention, s2d, pooled1,
                      need_mean)

    def head_fn(y, s2d):
        del s2d  # prep["head"] is already in the matching layout
        hk = prep["head"]["kernel"].astype(jnp.float32)
        hb = prep["head"]["bias"].astype(jnp.float32)
        return lax.conv_general_dilated(y.astype(jnp.float32), hk, (1, 1),
                                        "SAME", dimension_numbers=_DN) + hb

    return _decoder_loop(block_fn, head_fn, features, decoder_channels,
                         attention, threshold, dtype)


# --- train-mode path (VERDICT r4: extend the s2d win to training) -----------
#
# The block-kernel re-layout is a per-sample identity, so the only training-
# specific question is BatchNorm's BATCH statistics: the spatial moments
# over (N, H, W) of a reference-layout channel equal the phase-pooled
# moments over (N, H/2, W/2, 4 phases) of its s2d channels — same elements,
# same counts, different summation order.  Variance likewise when computed
# around the pooled mean (flax ``use_fast_variance=False`` semantics:
# mean((x - mean)²)).  Kernels are re-laid out IN-TRACE from the reference-
# layout parameters (36 tiny scatters on a (3,3,C,4C') tensor — negligible
# next to the conv), so autodiff maps gradients straight back to the
# reference parameter tree and checkpoints/optimizer state are untouched.


def _bn_train(bn_p: Dict, bn_s: Dict, y: jnp.ndarray, s2d: bool,
              momentum: float = 0.9):
    """Train-mode BatchNorm over either layout → (normalized, new_stats).

    Stats are computed in f32 (flax promotes too) and phase-pooled in s2d
    layout, so ``new_stats`` is EXACTLY the reference-layout update: the
    running tree stays checkpoint-compatible with ``ConvBNReLU``."""
    yf = y.astype(jnp.float32)
    mean_l = jnp.mean(yf, axis=(0, 1, 2))              # (4C,) or (C,)
    mean = mean_l.reshape(-1, 4).mean(-1) if s2d else mean_l
    mean_b = _rep4(mean) if s2d else mean
    centered = yf - mean_b
    var_l = jnp.mean(centered * centered, axis=(0, 1, 2))
    var = var_l.reshape(-1, 4).mean(-1) if s2d else var_l
    var_b = _rep4(var) if s2d else var
    scale = bn_p["scale"].astype(jnp.float32)
    bias = bn_p["bias"].astype(jnp.float32)
    if s2d:
        scale, bias = _rep4(scale), _rep4(bias)
    yn = centered * (lax.rsqrt(var_b + _BN_EPS) * scale) + bias
    new_stats = {
        "mean": bn_s["mean"] * momentum + (1.0 - momentum) * mean,
        "var": bn_s["var"] * momentum + (1.0 - momentum) * var,
    }
    return yn.astype(y.dtype), new_stats


def _conv_bn_relu_train(bp_conv: Dict, bs_conv: Dict, x: jnp.ndarray,
                        s2d: bool, collapse: bool, momentum: float):
    """ConvBNReLU (train=True) with the kernel re-laid out in-trace."""
    w = bp_conv["Conv_0"]["kernel"]
    if s2d:
        w = s2d_kernel_collapsed(w) if collapse else s2d_kernel(w)
    y = lax.conv_general_dilated(x, w.astype(x.dtype), (1, 1), "SAME",
                                 dimension_numbers=_DN)
    yn, new_stats = _bn_train(bp_conv["BatchNorm_0"], bs_conv["BatchNorm_0"],
                              y, s2d, momentum)
    return nn_relu(yn), {"BatchNorm_0": new_stats}


def fast_train_forward(
    decoder_params: Dict,
    decoder_stats: Dict,
    head_params: Dict,
    features: Sequence[jnp.ndarray],
    decoder_channels: Sequence[int],
    attention: Optional[str],
    threshold: int = 16,
    dtype: Any = jnp.float32,
    bn_momentum: float = 0.9,
) -> Tuple[jnp.ndarray, Dict]:
    """Train-mode decoder + head in the s2d layout → (logits, new_stats).

    Numerically equivalent to ``UnetPlusPlusDecoder(train=True)`` + head
    (exact in f32 — tests/test_unetpp_fast.py locks logits, grads AND the
    batch_stats update); runs the ≤threshold columns on the half-res grid
    with 4× the MXU output lanes through forward AND backward."""
    new_stats: Dict = {}

    def block_fn(name, x, skips, s2d, pooled1, need_mean):
        bp, bs = decoder_params[name], decoder_stats[name]
        if skips:
            x = jnp.concatenate([x] + [s.astype(x.dtype) for s in skips],
                                axis=-1)
            if attention == "scse":
                x = _scse(_prep_scse(bp["attention1"], s2d, dtype), x, s2d,
                          pooled1)
        collapse1 = s2d and not skips   # final block: input is a pure ×2 up
        x, st1 = _conv_bn_relu_train(bp["conv1"], bs["conv1"], x, s2d,
                                     collapse1, bn_momentum)
        x, st2 = _conv_bn_relu_train(bp["conv2"], bs["conv2"], x, s2d,
                                     False, bn_momentum)
        if attention == "scse":
            x = _scse(_prep_scse(bp["attention2"], s2d, dtype), x, s2d,
                      global_mean(x, s2d))
        new_stats[name] = {"conv1": st1, "conv2": st2}
        mean_out = global_mean(x, s2d) if need_mean else None
        return x, mean_out

    def head_fn(y, s2d):
        hk = head_params["kernel"].astype(jnp.float32)
        hb = head_params["bias"].astype(jnp.float32)
        if s2d:
            hk, hb = s2d_kernel(hk), _rep4(hb)
        return lax.conv_general_dilated(y.astype(jnp.float32), hk, (1, 1),
                                        "SAME", dimension_numbers=_DN) + hb

    # _block is bypassed here (BN sits between the convs), but the loop —
    # wiring, s2d routing, cached scSE pooling — is the shared one
    logits = _decoder_loop(block_fn, head_fn, features, decoder_channels,
                           attention, threshold, dtype)
    return logits, new_stats


def fast_train_apply(model, params: Dict, batch_stats: Dict, x: jnp.ndarray,
                     rngs: Optional[Dict] = None) -> Tuple[jnp.ndarray, Dict]:
    """Full-model train forward with the s2d decoder → (logits, new_bs).

    Drop-in for ``model.apply(..., train=True, mutable=['batch_stats'])``
    in the stage-2/5 loss functions: the encoder runs the stock flax path
    (its layouts are already MXU-friendly), the decoder+head run
    :func:`fast_train_forward`.  The returned batch_stats tree has the
    exact reference structure."""
    feats, enc_upd = model.apply(
        {"params": params, "batch_stats": batch_stats}, x,
        train=True, mutable=["batch_stats"], method="encode",
        rngs=rngs or {},
    )
    logits, dec_stats = fast_train_forward(
        params["decoder"], batch_stats["decoder"], params["head"],
        feats, tuple(model.decoder_channels), model.attention,
        model.s2d_threshold, model.dtype,
    )
    new_bs = dict(enc_upd["batch_stats"])
    new_bs["decoder"] = dec_stats
    return logits, new_bs


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
    """One-shot prepare + forward (preparation traced inline).

    Used by ``UnetPlusPlus.fast_eval`` so the module method needs no
    state; production paths should :func:`prepare_fast_vars` once and jit
    :func:`fast_forward` (see :func:`make_fast_infer`)."""
    del num_classes
    prep = prepare_fast_vars(
        decoder_vars, head_vars, [f.shape[-1] for f in features],
        decoder_channels, attention, threshold, dtype,
    )
    return fast_forward(prep, features, decoder_channels, attention,
                        threshold, dtype)


def make_fast_infer(model, variables) -> Tuple[Callable, Dict]:
    """Production bundle: eager preparation + a jittable forward.

    Returns ``(infer_fn, prep)`` where ``infer_fn(variables, prep, x)``
    runs encoder → prepared decoder → head.  ``prep`` is a pytree of
    arrays (pass it through jit as an argument, not a closure, so the
    XLA executable is checkpoint-independent).
    """
    from pistoseg_tpu.models.efficientnet import encoder_out_channels

    prep = prepare_fast_vars(
        {"params": variables["params"]["decoder"],
         "batch_stats": variables["batch_stats"]["decoder"]},
        {"params": variables["params"]["head"]},
        encoder_out_channels(model.encoder_name),
        tuple(model.decoder_channels),
        model.attention,
        model.s2d_threshold,
        model.dtype,
    )

    def infer(vs, prep_tree, x):
        feats = model.apply(vs, x, train=False, method="encode")
        return fast_forward(prep_tree, feats, tuple(model.decoder_channels),
                            model.attention, model.s2d_threshold, model.dtype)

    return infer, prep
