"""On-device batched data augmentation with keyed PRNG.

The reference augments on the host per-sample via albumentations
(``dataset.py:41-49,119-127``): RandomResizedCrop(scale 0.9–1) →
HorizontalFlip(0.5) → VerticalFlip(0.5) → ShiftScaleRotate(0.5) →
OpticalDistortion(0.5) → ImageNet normalize.  cv2's geometric ops are a
major host bottleneck and are nondeterministic across worker scheduling.

TPU-first design: every geometric aug is folded into **one** inverse
coordinate map per sample — affine 3×3 composition (crop-resize, flips,
shift/scale/rotate) plus the optical-distortion radial term — applied by a
single bilinear (images) / nearest (masks) grid sample, batched over the
whole batch under ``jit``.  Randomness comes from a single PRNG key:
deterministic given (seed, epoch, step).  Border handling is reflect-101
like cv2's default.

The whole augmentation runs inside the training jit, so XLA fuses
normalize + warp + cast with the first conv's input pipeline.
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


def grid_sample_bilinear(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample (H, W, C) image at float coords (h', w') with reflect-101."""
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


def _sample_coords(key: jax.Array, in_hw: Tuple[int, int], cfg: AugmentConfig):
    """Build the per-sample inverse coordinate map (out → in)."""
    H, W = in_hw
    S = cfg.out_size
    ks = jax.random.split(key, 12)

    # --- RandomResizedCrop: area scale + log-uniform aspect, random origin
    area_frac = jax.random.uniform(ks[0], (), minval=cfg.rrc_scale[0], maxval=cfg.rrc_scale[1])
    log_r = jax.random.uniform(
        ks[1], (), minval=math.log(cfg.rrc_ratio[0]), maxval=math.log(cfg.rrc_ratio[1])
    )
    aspect = jnp.exp(log_r)
    area = area_frac * H * W
    cw = jnp.clip(jnp.sqrt(area * aspect), 1.0, W)
    ch = jnp.clip(jnp.sqrt(area / aspect), 1.0, H)
    y0 = jax.random.uniform(ks[2], (), minval=0.0, maxval=1.0) * (H - ch)
    x0 = jax.random.uniform(ks[3], (), minval=0.0, maxval=1.0) * (W - cw)

    # output pixel grid (half-pixel centers convention of the resize)
    oy = (jnp.arange(S, dtype=jnp.float32) + 0.5) * (ch / S) - 0.5 + y0
    ox = (jnp.arange(S, dtype=jnp.float32) + 0.5) * (cw / S) - 0.5 + x0
    ys = jnp.broadcast_to(oy[:, None], (S, S))
    xs = jnp.broadcast_to(ox[None, :], (S, S))

    # --- flips (about the crop center)
    cy = y0 + ch / 2.0
    cx = x0 + cw / 2.0
    do_h = jax.random.uniform(ks[4]) < cfg.hflip_p
    do_v = jax.random.uniform(ks[5]) < cfg.vflip_p
    xs = jnp.where(do_h, 2 * cx - xs, xs)
    ys = jnp.where(do_v, 2 * cy - ys, ys)

    # --- ShiftScaleRotate (inverse map: rotate by −θ, scale by 1/s, shift back)
    do_ssr = jax.random.uniform(ks[6]) < cfg.ssr_p
    shift_y = jax.random.uniform(ks[7], (), minval=-cfg.shift_limit, maxval=cfg.shift_limit) * H
    shift_x = jax.random.uniform(ks[8], (), minval=-cfg.shift_limit, maxval=cfg.shift_limit) * W
    scale = 1.0 + jax.random.uniform(ks[9], (), minval=-cfg.scale_limit, maxval=cfg.scale_limit)
    theta = jnp.deg2rad(
        jax.random.uniform(ks[10], (), minval=-cfg.rotate_limit, maxval=cfg.rotate_limit)
    )
    cos, sin = jnp.cos(-theta), jnp.sin(-theta)
    ys_c, xs_c = ys - cy - shift_y, xs - cx - shift_x
    ys_r = (sin * xs_c + cos * ys_c) / scale + cy
    xs_r = (cos * xs_c - sin * ys_c) / scale + cx
    ys = jnp.where(do_ssr, ys_r, ys)
    xs = jnp.where(do_ssr, xs_r, xs)

    # --- OpticalDistortion (barrel/pincushion radial term about center)
    do_dist = jax.random.uniform(ks[11]) < cfg.distort_p
    kd_key, sx_key, sy_key = jax.random.split(jax.random.fold_in(key, 7), 3)
    kd = jax.random.uniform(kd_key, (), minval=-cfg.distort_limit, maxval=cfg.distort_limit)
    dx = jax.random.uniform(sx_key, (), minval=-cfg.distort_shift, maxval=cfg.distort_shift) * W
    dy = jax.random.uniform(sy_key, (), minval=-cfg.distort_shift, maxval=cfg.distort_shift) * H
    yn = (ys - cy) / (H / 2.0)
    xn = (xs - cx) / (W / 2.0)
    r2 = yn * yn + xn * xn
    factor = 1.0 + kd * r2
    ys_d = yn * factor * (H / 2.0) + cy + dy
    xs_d = xn * factor * (W / 2.0) + cx + dx
    ys = jnp.where(do_dist, ys_d, ys)
    xs = jnp.where(do_dist, xs_d, xs)

    return ys, xs


def augment_pair(
    key: jax.Array,
    image: jnp.ndarray,      # (H, W, 3) uint8/float
    mask: Optional[jnp.ndarray],  # (H, W) int or None
    cfg: AugmentConfig,
):
    ys, xs = _sample_coords(key, image.shape[:2], cfg)
    img_out = grid_sample_bilinear(image.astype(jnp.float32), ys, xs)
    if mask is None:
        return img_out, None
    mask_out = grid_sample_nearest(mask, ys, xs)
    return img_out, mask_out


from functools import partial


@partial(jax.jit, static_argnames=("cfg", "do_normalize"))
def augment_batch(
    key: jax.Array,
    images: jnp.ndarray,     # (N, H, W, 3)
    masks: Optional[jnp.ndarray],  # (N, H, W) or None
    cfg: AugmentConfig,
    do_normalize: bool = True,
):
    """vmap'd per-sample augmentation; returns (images_f32, masks).

    jitted with the config static, so each (shape, cfg) compiles once;
    inside a larger jit (the train step) it inlines and fuses.
    """
    keys = jax.random.split(key, images.shape[0])
    if masks is None:
        out = jax.vmap(lambda k, im: augment_pair(k, im, None, cfg)[0])(keys, images)
        m = None
    else:
        out, m = jax.vmap(lambda k, im, mk: augment_pair(k, im, mk, cfg))(keys, images, masks)
    if do_normalize:
        out = normalize(out, cfg.norm_mean, cfg.norm_std)
    return out, m
