"""On-device batched data augmentation with keyed PRNG.

The reference augments on the host per-sample via albumentations
(``dataset.py:41-49,119-127``): RandomResizedCrop(scale 0.9–1) →
HorizontalFlip(0.5) → VerticalFlip(0.5) → ShiftScaleRotate(0.5) →
OpticalDistortion(0.5) → ImageNet normalize.  cv2's geometric ops are a
major host bottleneck and are nondeterministic across worker scheduling.

TPU-first design: every geometric aug is folded into **one** inverse
coordinate map per sample — affine 3×3 composition (crop-resize, flips,
shift/scale/rotate) plus the optical-distortion radial term.  Randomness
comes from a single PRNG key: deterministic given (seed, epoch, step).
Border handling is reflect-101 like cv2's default.

Execution is a **Catmull–Smith two-pass resampling on the MXU**, not a
gather: XLA lowers per-pixel gathers with a 3-wide trailing dim to
scalar fetches (~30 ms per bilinear corner at batch 64·224² on a v5e —
2/3 of the whole stage-2 train step).  Instead each pass is a batched
one-hot-lerp matmul:

* pass 1 (horizontal): ``tmp[i, c] = img[i, X(i, c)]`` where ``X(i, c)``
  is the x-coordinate of output column ``c``'s warp line where it
  crosses input row ``i`` — found by inverting the row map ``ρ ↦
  ys(ρ, c)`` (analytically for the affine part, 3 Newton steps when the
  radial distortion is on; ``|∂ys/∂ρ| ≥ ~0.4`` for the reference's
  parameter ranges, so the inversion never degenerates);
* pass 2 (vertical): ``out[r, c] = tmp[ys(r, c), c]``.

Each pass contracts a ``relu(1 − |coord − iota|)`` interpolation-weight
tensor against the image with one einsum — dense, static-shaped, and
~25× faster than the gather formulation (12 ms vs 165 ms for the image
pair at batch 64).  Masks ride the same passes with the coordinates
rounded first, which makes the weights exactly one-hot — true
nearest-neighbour sampling that preserves label values bit-exactly.

Semantics notes (intentional, documented deviations — this augments
training data, it is not an inference-path resize):

* Two-pass reconstruction lerps along the warp curve instead of axis-
  aligned texel pairs; for separable transforms (crop/flip/scale) it is
  IDENTICAL to direct bilinear, under rotation/distortion it is an
  equally-valid linear reconstruction that differs by O(local image
  curvature).
* The einsum runs in bf16 (weights + pixels): ≤1/256 relative error on
  [0, 255] inputs, ~0.02 after ImageNet normalization.  fp32-precision
  stages switch it to f32 (``AugmentConfig.warp_dtype``) so augmented
  batches stay deterministic across device counts.
* reflect-101 is applied per pass; for coordinates that leave the frame
  under rotation the reflected x comes from the reflected row's own
  warp line (border band only).

The reference gather formulation is kept below
(``grid_sample_bilinear``/``augment_pair_reference``) as the golden
implementation the tests compare against.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize(x: jnp.ndarray, mean=IMAGENET_MEAN, std=IMAGENET_STD) -> jnp.ndarray:
    """uint8/float [0,255] (N, H, W, 3) → normalized float32.

    ``mean``/``std`` in [0, 1] units (dataset profiles carry them; GlaS
    ships its own stats, ``configuration_glas.yml``)."""
    m = jnp.asarray(mean, jnp.float32) * 255.0
    s = jnp.asarray(std, jnp.float32) * 255.0
    return (x.astype(jnp.float32) - m) / s


def imagenet_normalize(x: jnp.ndarray) -> jnp.ndarray:
    return normalize(x)


def _reflect101(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    """cv2 BORDER_REFLECT_101 coordinate folding: -1 → 1, size → size-2."""
    period = 2 * (size - 1)
    c = jnp.abs(coord) % period
    return jnp.where(c >= size, period - c, c)


def _reflect101_f(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    """Float-coordinate reflect-101 fold into [0, size-1]."""
    period = 2.0 * (size - 1)
    c = jnp.abs(coord) % period
    return jnp.where(c > size - 1, period - c, c)


def grid_sample_bilinear(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample (H, W, C) image at float coords (h', w') with reflect-101.

    Golden-reference gather formulation — NOT used in the training hot
    path (XLA lowers it to scalar fetches on TPU); see module docstring.
    """
    H, W = img.shape[:2]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = (ys - y0)[..., None]
    fx = (xs - x0)[..., None]

    def at(yi, xi):
        yi = _reflect101(yi.astype(jnp.int32), H)
        xi = _reflect101(xi.astype(jnp.int32), W)
        return img[yi, xi]

    v00 = at(y0, x0)
    v01 = at(y0, x0 + 1)
    v10 = at(y0 + 1, x0)
    v11 = at(y0 + 1, x0 + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def grid_sample_nearest(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    H, W = img.shape[:2]
    yi = _reflect101(jnp.round(ys).astype(jnp.int32), H)
    xi = _reflect101(jnp.round(xs).astype(jnp.int32), W)
    return img[yi, xi]


class AugmentConfig(NamedTuple):
    out_size: int = 224
    rrc_scale: Tuple[float, float] = (0.9, 1.0)
    rrc_ratio: Tuple[float, float] = (3 / 4, 4 / 3)
    hflip_p: float = 0.5
    vflip_p: float = 0.5
    ssr_p: float = 0.5
    shift_limit: float = 0.0625
    scale_limit: float = 0.1
    rotate_limit: float = 45.0
    distort_p: float = 0.5
    distort_limit: float = 0.05
    distort_shift: float = 0.05
    norm_mean: Tuple[float, float, float] = IMAGENET_MEAN
    norm_std: Tuple[float, float, float] = IMAGENET_STD
    # dtype of the two-pass interpolation einsums.  bf16 halves the weight
    # tensors' HBM traffic and is plenty for augmented pixels (≤1/256 rel
    # err); fp32-precision training selects "f32" so the warp stays
    # deterministic across device counts (bf16 matmul reassociation
    # differs between 1-dev and N-dev compilations).
    warp_dtype: str = "bf16"


class WarpParams(NamedTuple):
    """Per-sample inverse warp: affine (out → in) plus gated radial term.

    ``(ys, xs) = radial(A @ (r, c) + t)`` with the radial distortion
    about the crop centre ``(cy, cx)``; ``kd = 0`` when the distortion
    op did not fire, making the map exactly affine.
    """
    a_yr: jnp.ndarray
    a_yc: jnp.ndarray
    a_y0: jnp.ndarray
    a_xr: jnp.ndarray
    a_xc: jnp.ndarray
    a_x0: jnp.ndarray
    cy: jnp.ndarray
    cx: jnp.ndarray
    kd: jnp.ndarray
    dy: jnp.ndarray
    dx: jnp.ndarray


def _sample_params(key: jax.Array, in_hw: Tuple[int, int], cfg: AugmentConfig) -> WarpParams:
    """Draw one sample's augmentation and fold it into WarpParams.

    Sampling semantics follow the reference's albumentations stack
    (``dataset.py:41-49``) including torchvision-style RRC rejection;
    ranges are statistically pinned by
    ``test_augment_sampling_matches_albumentations_ranges``.
    """
    H, W = in_hw
    S = cfg.out_size
    ks = jax.random.split(key, 12)

    # --- RandomResizedCrop: area scale + log-uniform aspect, random origin.
    # torchvision/albumentations sample (area, aspect) up to 10 times and
    # REJECT out-of-frame candidates (clipping instead would realize areas
    # below the configured scale range — e.g. 0.82 for scale=(0.9, 1) on a
    # square image); vectorized here as 10 draws + first-valid select,
    # with torchvision's deterministic fallback when all 10 miss.
    lo, hi = cfg.rrc_ratio
    area_frac = jax.random.uniform(
        ks[0], (10,), minval=cfg.rrc_scale[0], maxval=cfg.rrc_scale[1])
    aspect = jnp.exp(jax.random.uniform(
        ks[1], (10,), minval=math.log(lo), maxval=math.log(hi)))
    area = area_frac * H * W
    cw_cand = jnp.sqrt(area * aspect)
    ch_cand = jnp.sqrt(area / aspect)
    valid = (cw_cand <= W) & (ch_cand <= H)
    first = jnp.argmax(valid)          # index of the first valid attempt
    in_ratio = W / H
    if in_ratio < lo:
        fw, fh = float(W), W / lo
    elif in_ratio > hi:
        fh, fw = float(H), H * hi
    else:
        fw, fh = float(W), float(H)
    any_valid = valid.any()
    cw = jnp.where(any_valid, cw_cand[first], fw)
    ch = jnp.where(any_valid, ch_cand[first], fh)
    # torchvision centers the fallback crop; valid candidates get a
    # uniform origin
    y0 = jnp.where(any_valid,
                   jax.random.uniform(ks[2], ()) * (H - ch), (H - ch) / 2.0)
    x0 = jnp.where(any_valid,
                   jax.random.uniform(ks[3], ()) * (W - cw), (W - cw) / 2.0)

    # crop grid as an affine map of the output pixel index (half-pixel centers)
    a_yr = ch / S
    a_y0 = 0.5 * (ch / S) - 0.5 + y0
    a_xc = cw / S
    a_x0 = 0.5 * (cw / S) - 0.5 + x0
    a_yc = jnp.zeros(())
    a_xr = jnp.zeros(())

    # --- flips (about the crop center): reflection of the affine map
    cy = y0 + ch / 2.0
    cx = x0 + cw / 2.0
    do_h = jax.random.uniform(ks[4]) < cfg.hflip_p
    do_v = jax.random.uniform(ks[5]) < cfg.vflip_p
    a_xr = jnp.where(do_h, -a_xr, a_xr)
    a_xc = jnp.where(do_h, -a_xc, a_xc)
    a_x0 = jnp.where(do_h, 2 * cx - a_x0, a_x0)
    a_yr = jnp.where(do_v, -a_yr, a_yr)
    a_yc = jnp.where(do_v, -a_yc, a_yc)
    a_y0 = jnp.where(do_v, 2 * cy - a_y0, a_y0)

    # --- ShiftScaleRotate (inverse map: rotate by −θ, scale by 1/s, shift back)
    do_ssr = jax.random.uniform(ks[6]) < cfg.ssr_p
    shift_y = jax.random.uniform(ks[7], (), minval=-cfg.shift_limit, maxval=cfg.shift_limit) * H
    shift_x = jax.random.uniform(ks[8], (), minval=-cfg.shift_limit, maxval=cfg.shift_limit) * W
    scale = 1.0 + jax.random.uniform(ks[9], (), minval=-cfg.scale_limit, maxval=cfg.scale_limit)
    theta = jnp.deg2rad(
        jax.random.uniform(ks[10], (), minval=-cfg.rotate_limit, maxval=cfg.rotate_limit)
    )
    cos, sin = jnp.cos(-theta), jnp.sin(-theta)
    # y' = (sin·(x−cx−sx) + cos·(y−cy−sy))/scale + cy, composed onto the
    # current affine (y, x are themselves affine in (r, c))
    oy = cy + shift_y
    ox = cx + shift_x
    n_yr = (sin * a_xr + cos * a_yr) / scale
    n_yc = (sin * a_xc + cos * a_yc) / scale
    n_y0 = (sin * (a_x0 - ox) + cos * (a_y0 - oy)) / scale + cy
    n_xr = (cos * a_xr - sin * a_yr) / scale
    n_xc = (cos * a_xc - sin * a_yc) / scale
    n_x0 = (cos * (a_x0 - ox) - sin * (a_y0 - oy)) / scale + cx
    a_yr = jnp.where(do_ssr, n_yr, a_yr)
    a_yc = jnp.where(do_ssr, n_yc, a_yc)
    a_y0 = jnp.where(do_ssr, n_y0, a_y0)
    a_xr = jnp.where(do_ssr, n_xr, a_xr)
    a_xc = jnp.where(do_ssr, n_xc, a_xc)
    a_x0 = jnp.where(do_ssr, n_x0, a_x0)

    # --- OpticalDistortion (barrel/pincushion radial term about center)
    do_dist = jax.random.uniform(ks[11]) < cfg.distort_p
    kd_key, sx_key, sy_key = jax.random.split(jax.random.fold_in(key, 7), 3)
    kd = jax.random.uniform(kd_key, (), minval=-cfg.distort_limit, maxval=cfg.distort_limit)
    dx = jax.random.uniform(sx_key, (), minval=-cfg.distort_shift, maxval=cfg.distort_shift) * W
    dy = jax.random.uniform(sy_key, (), minval=-cfg.distort_shift, maxval=cfg.distort_shift) * H
    kd = jnp.where(do_dist, kd, 0.0)
    dx = jnp.where(do_dist, dx, 0.0)
    dy = jnp.where(do_dist, dy, 0.0)

    return WarpParams(a_yr, a_yc, a_y0, a_xr, a_xc, a_x0, cy, cx, kd, dy, dx)


def _apply_map(p: WarpParams, rho, c, in_hw: Tuple[int, int]):
    """Evaluate the inverse map (and ∂ys/∂ρ) at (ρ, c) grids.

    ``p`` leaves are broadcast against ``rho``/``c`` (callers reshape to
    (N, 1, 1)).  Returns (ys, xs, dys_drho).
    """
    H, W = in_hw
    h2, w2 = H / 2.0, W / 2.0
    y_a = p.a_yr * rho + p.a_yc * c + p.a_y0
    x_a = p.a_xr * rho + p.a_xc * c + p.a_x0
    yn = (y_a - p.cy) / h2
    xn = (x_a - p.cx) / w2
    r2 = yn * yn + xn * xn
    f = 1.0 + p.kd * r2
    ys = yn * f * h2 + p.cy + p.dy
    xs = xn * f * w2 + p.cx + p.dx
    # d(ys)/dρ = a_yr·f + yn·h2·kd·dr2/dρ
    dr2 = 2.0 * (yn * p.a_yr / h2 + xn * p.a_xr / w2)
    dys = p.a_yr * f + yn * h2 * p.kd * dr2
    return ys, xs, dys


def _row_crossings(p: WarpParams, in_hw: Tuple[int, int], out_size: int,
                   newton_steps: int = 3):
    """X(i, c): x-coordinate where output column c's warp line crosses
    input row i.  Solves ys(ρ, c) = i for ρ (exact for affine, Newton
    steps for the radial term) and evaluates xs there.

    ``newton_steps=0`` skips the refinement entirely — callers pass 0
    when the config statically disables distortion (the affine guess is
    then the exact solution), removing four (N, H, S) map sweeps."""
    H, W = in_hw
    S = out_size
    i = jnp.arange(H, dtype=jnp.float32)[None, :, None]        # (1, H, 1)
    c = jnp.arange(S, dtype=jnp.float32)[None, None, :]        # (1, 1, S)
    # affine initial guess: a_yr·ρ + a_yc·c + a_y0 = i
    rho = (i - p.a_yc * c - p.a_y0) / p.a_yr                   # (N, H, S)
    for _ in range(newton_steps):
        ys, _, dys = _apply_map(p, rho, c, in_hw)
        # floor |denominator| at 0.1, keeping the sign (treat exact 0 as +)
        denom = jnp.where(jnp.abs(dys) < 0.1,
                          jnp.where(dys < 0, -0.1, 0.1), dys)
        rho = rho - (ys - i) / denom
    _, xs, _ = _apply_map(p, rho, c, in_hw)
    return xs                                                  # (N, H, S)


def _lerp_weights(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    """relu(1 − |coord − iota|): rows of linear-interpolation weights.

    Exactly one-hot when ``coord`` is integral (used for nearest)."""
    iota = jnp.arange(size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coord[..., None] - iota))


# The one-hot-lerp weight tensors are dense (N, rows, S, W) bf16 — built
# all at once at batch 64·224² they total ~8.7 GB of temporaries (measured
# via memory_analysis), which cannot sit in HBM next to the UNet++
# fwd/bwd.  Each pass is therefore lax.map-chunked into WARP_CHUNKS slabs
# along a SPATIAL axis (input rows for pass 1, output rows for pass 2):
# live warp temps drop to ~0.5 GB with no MXU-efficiency loss (the
# contraction and batch dims of every einsum are untouched).  Chunking
# deliberately never splits the batch axis — that is the data-parallel
# sharded axis in the stage-2/0 train steps, and a loop over it would
# force the SPMD partitioner into cross-device gathers.
WARP_CHUNKS = 8


def _pad_rows(a: jnp.ndarray, rows_to: int, fill: float) -> jnp.ndarray:
    """Pad axis 1 (rows) up to ``rows_to`` with ``fill``.

    Sizes that don't divide into WARP_CHUNKS slabs are padded rather than
    silently falling back to the dense (multi-GB) formulation: pad
    coordinate −2 produces all-zero interpolation weights, and padded
    output rows are sliced off after the pass."""
    pad = rows_to - a.shape[1]
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[1] = (0, pad)
    return jnp.pad(a, widths, constant_values=fill)


def _warp_two_pass(
    img: jnp.ndarray,          # (N, H, W, C) float32
    mask: Optional[jnp.ndarray],   # (N, H, W) int or None
    p: WarpParams,             # leaves (N,)
    out_size: int,
    chunk_target: int = WARP_CHUNKS,
    warp_dtype: str = "bf16",
    newton_steps: int = 3,
):
    N, H, W = img.shape[:3]
    S = out_size
    wdt = jnp.bfloat16 if warp_dtype == "bf16" else jnp.float32
    pb = WarpParams(*(leaf[:, None, None] for leaf in p))

    xs_rows = _reflect101_f(
        _row_crossings(pb, (H, W), S, newton_steps), W)             # (N, H, S)
    r = jnp.arange(S, dtype=jnp.float32)[None, :, None]
    c = jnp.arange(S, dtype=jnp.float32)[None, None, :]
    ys_out, _, _ = _apply_map(pb, r, c, (H, W))                      # (N, S, S)
    ys_out = _reflect101_f(ys_out, H)

    def two_pass(values, x_coord, y_coord):
        C = values.shape[-1]
        # pass 1 (horizontal): tmp[n, i, c, ch] = Σ_w Wx[n,i,c,w]·values[n,i,w,ch]
        # chunked over input rows i (padded rows get zero weights)
        g1 = min(chunk_target, H)
        hp = -(-H // g1) * g1
        xc = _pad_rows(x_coord, hp, -2.0)
        vc = _pad_rows(values, hp, 0.0)
        xc = jnp.moveaxis(xc.reshape(N, g1, hp // g1, S), 1, 0)
        vc = jnp.moveaxis(vc.reshape(N, g1, hp // g1, W, C), 1, 0)

        def pass1(args):
            xcc, vcc = args
            wx = _lerp_weights(xcc, W).astype(wdt)
            return jnp.einsum("nicw,niwx->nicx", wx, vcc.astype(wdt),
                              preferred_element_type=jnp.float32)

        tmp = jax.lax.map(pass1, (xc, vc)) if g1 > 1 else pass1((xc[0], vc[0]))[None]
        # padded tmp rows (index ≥ H) always get zero pass-2 weight:
        # y_coord ≤ H−1, so relu(1 − |y − i|) = 0 for i ≥ H
        tmp = jnp.moveaxis(tmp, 0, 1).reshape(N, hp, S, C).astype(wdt)

        # pass 2 (vertical): out[n, r, c, ch] = Σ_i Wy[n,r,c,i]·tmp[n,i,c,ch]
        # chunked over output rows r (tmp is a loop invariant; padded
        # output rows compute junk and are sliced off)
        g2 = min(chunk_target, S)
        sp = -(-S // g2) * g2
        yc = _pad_rows(y_coord, sp, 0.0)
        yc = jnp.moveaxis(yc.reshape(N, g2, sp // g2, S), 1, 0)

        def pass2(ycc):
            wy = _lerp_weights(ycc, hp).astype(wdt)
            return jnp.einsum("nrci,nicx->nrcx", wy, tmp,
                              preferred_element_type=jnp.float32)

        out = jax.lax.map(pass2, yc) if g2 > 1 else pass2(yc[0])[None]
        return jnp.moveaxis(out, 0, 1).reshape(N, sp, S, C)[:, :S]

    img_out = two_pass(img.astype(jnp.float32), xs_rows, ys_out)
    if mask is None:
        return img_out, None
    # nearest: round the coordinates first → weights become exactly one-hot,
    # values pass through bit-exactly (mask classes ≤ 255 are exact in bf16)
    m_out = two_pass(
        mask.astype(jnp.float32)[..., None],
        jnp.round(xs_rows), jnp.round(ys_out),
    )
    return img_out, jnp.round(m_out[..., 0]).astype(mask.dtype)


def augment_pair_reference(
    key: jax.Array,
    image: jnp.ndarray,      # (H, W, 3) uint8/float
    mask: Optional[jnp.ndarray],  # (H, W) int or None
    cfg: AugmentConfig,
):
    """Golden-reference single-sample path: direct bilinear/nearest gather
    of the same inverse map.  Used by tests; too slow for TPU hot loops."""
    p = _sample_params(key, image.shape[:2], cfg)
    S = cfg.out_size
    r = jnp.arange(S, dtype=jnp.float32)[:, None]
    c = jnp.arange(S, dtype=jnp.float32)[None, :]
    ys, xs, _ = _apply_map(p, r, c, image.shape[:2])
    img_out = grid_sample_bilinear(image.astype(jnp.float32), ys, xs)
    if mask is None:
        return img_out, None
    return img_out, grid_sample_nearest(mask, ys, xs)


# kept as an alias: single-sample API used by older tests/scripts
augment_pair = augment_pair_reference


from functools import partial


@partial(jax.jit, static_argnames=("cfg", "do_normalize"))
def augment_batch(
    key: jax.Array,
    images: jnp.ndarray,     # (N, H, W, 3)
    masks: Optional[jnp.ndarray],  # (N, H, W) or None
    cfg: AugmentConfig,
    do_normalize: bool = True,
):
    """Batched two-pass MXU augmentation; returns (images_f32, masks).

    jitted with the config static, so each (shape, cfg) compiles once;
    inside a larger jit (the train step) it inlines and fuses.
    """
    if cfg.ssr_p > 0 and cfg.rotate_limit > 60.0:
        # the horizontal pass inverts the row map ρ ↦ ys(ρ, c); its
        # conditioning degrades as |θ| → 90° (a_yr → 0). 45° (the
        # reference's albumentations default) is well inside the safe
        # range; refuse configs the two-pass formulation can't honor.
        raise ValueError(
            f"rotate_limit={cfg.rotate_limit} exceeds the two-pass warp's "
            "conditioning bound (60°); use the gather reference path for "
            "extreme rotations")
    keys = jax.random.split(key, images.shape[0])
    params = jax.vmap(lambda k: _sample_params(k, images.shape[1:3], cfg))(keys)
    # distortion statically off → the affine row-map inversion is exact;
    # skip the Newton sweeps (cfg is static at this jit boundary)
    steps = 0 if cfg.distort_p == 0.0 else 3
    out, m = _warp_two_pass(images, masks, params, cfg.out_size,
                            warp_dtype=cfg.warp_dtype, newton_steps=steps)
    if do_normalize:
        out = normalize(out, cfg.norm_mean, cfg.norm_std)
    return out, m
