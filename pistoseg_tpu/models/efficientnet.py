"""EfficientNet encoder (b0–b7) with a 5-level feature pyramid.

The reference gets its encoders from ``segmentation_models_pytorch`` /
timm (``mosaic_module.py:79-86``: ``efficientnet-b0``;
``run.sh:32``: ``efficientnet-b3``).  This is a from-scratch NHWC flax
implementation: stem → 7 MBConv stages with squeeze-excitation and
stochastic depth, feature taps at reductions 2/4/8/16/32 matching the smp
encoder contract (e.g. b0 channels (32, 24, 40, 112, 320), b3
(40, 32, 48, 136, 384)).

TPU notes: NHWC + ``lax.conv_general_dilated`` via flax keeps convs on the
MXU; SAME padding with static shapes; bf16-friendly (params fp32,
activations cast by the caller).
"""

from __future__ import annotations

import math
from typing import Any, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# (width_mult, depth_mult, default_dropout)
_SCALING = {
    "efficientnet-b0": (1.0, 1.0, 0.2),
    "efficientnet-b1": (1.0, 1.1, 0.2),
    "efficientnet-b2": (1.1, 1.2, 0.3),
    "efficientnet-b3": (1.2, 1.4, 0.3),
    "efficientnet-b4": (1.4, 1.8, 0.4),
    "efficientnet-b5": (1.6, 2.2, 0.4),
    "efficientnet-b6": (1.8, 2.6, 0.5),
    "efficientnet-b7": (2.0, 3.1, 0.5),
}

# base (expand, kernel, stride, channels, repeats) per stage (b0)
_BASE_STAGES = (
    (1, 3, 1, 16, 1),
    (6, 3, 2, 24, 2),
    (6, 5, 2, 40, 2),
    (6, 3, 2, 80, 3),
    (6, 5, 1, 112, 3),
    (6, 5, 2, 192, 4),
    (6, 3, 1, 320, 1),
)

# stages after which smp taps features (reductions 4, 8, 16, 32)
_TAP_AFTER_STAGE = {1: 0, 2: 1, 4: 2, 6: 3}


def round_filters(filters: float, width_mult: float, divisor: int = 8) -> int:
    filters *= width_mult
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * repeats))


def encoder_out_channels(name: str) -> Tuple[int, ...]:
    """smp-style out_channels (without the input level): reductions 2..32."""
    w, d, _ = _SCALING[name]
    stem = round_filters(32, w)
    chans = [round_filters(c, w) for (_, _, _, c, _) in _BASE_STAGES]
    return (stem, chans[1], chans[2], chans[4], chans[6])


class SqueezeExcite(nn.Module):
    in_channels: int          # un-expanded block input channels (ratio base)
    expanded: int
    se_ratio: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        reduced = max(1, int(self.in_channels * self.se_ratio))
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(reduced, (1, 1), dtype=self.dtype, name="reduce")(s)
        s = nn.swish(s)
        s = nn.Conv(self.expanded, (1, 1), dtype=self.dtype, name="expand")(s)
        return x * nn.sigmoid(s)


class MBConv(nn.Module):
    in_channels: int
    out_channels: int
    expand_ratio: int
    kernel: int
    stride: int
    dilation: int = 1
    drop_rate: float = 0.0
    bn_momentum: float = 0.9
    bn_eps: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        inp = x
        c_exp = self.in_channels * self.expand_ratio

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=self.bn_eps,
                dtype=self.dtype,
                # two-pass variance: the fast mean(x^2)-mean(x)^2 form loses
                # ~1e-3 to cancellation on large activations, which breaks
                # cross-sharding reproducibility (1-dev vs 8-dev)
                use_fast_variance=False,
                name=name,
            )

        if self.expand_ratio != 1:
            x = nn.Conv(c_exp, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(x)
            x = bn("bn0")(x)
            x = nn.swish(x)

        x = nn.Conv(
            c_exp,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding="SAME",
            feature_group_count=c_exp,
            use_bias=False,
            dtype=self.dtype,
            name="dwconv",
        )(x)
        x = bn("bn1")(x)
        x = nn.swish(x)

        x = SqueezeExcite(self.in_channels, c_exp, dtype=self.dtype, name="se")(x)

        x = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(x)
        x = bn("bn2")(x)

        if self.stride == 1 and self.in_channels == self.out_channels:
            if train and self.drop_rate > 0.0:
                # stochastic depth (per-sample drop of the residual branch)
                keep = 1.0 - self.drop_rate
                rng = self.make_rng("droppath")
                mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                mask = jnp.floor(keep + jax.random.uniform(rng, mask_shape))
                x = x / keep * mask.astype(x.dtype)
            x = x + inp
        return x


class EfficientNetEncoder(nn.Module):
    """Returns the 5-level feature pyramid [r2, r4, r8, r16, r32]."""

    model_name: str = "efficientnet-b0"
    drop_path_rate: float = 0.2
    bn_momentum: float = 0.9
    dtype: Any = jnp.float32
    # 16 = smp make_dilated semantics for DeepLabV3+: the r32 stages' first
    # stride becomes 1 and every conv there is dilated ×2, so the deepest
    # feature stays on the r16 grid (smp encoders/_utils.py
    # replace_strides_with_dilation; dilation is a no-op for 1×1 convs)
    output_stride: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        w, d, _ = _SCALING[self.model_name]
        stem_ch = round_filters(32, w)

        x = x.astype(self.dtype)
        x = nn.Conv(stem_ch, (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=self.bn_momentum,
                         epsilon=1e-3, dtype=self.dtype,
                         use_fast_variance=False, name="stem_bn")(x)
        x = nn.swish(x)

        features: List[jnp.ndarray] = [x]  # reduction 2

        total_blocks = sum(round_repeats(r, d) for (_, _, _, _, r) in _BASE_STAGES)
        block_idx = 0
        in_ch = stem_ch
        for stage_i, (expand, kernel, stride, base_c, base_r) in enumerate(_BASE_STAGES):
            out_ch = round_filters(base_c, w)
            repeats = round_repeats(base_r, d)
            # stages 5-6 produce the r32 features; at output_stride 16 they
            # run undownsampled with ×2-dilated depthwise convs
            dilated = self.output_stride == 16 and stage_i >= 5
            for r in range(repeats):
                s = 1 if dilated else (stride if r == 0 else 1)
                drop = self.drop_path_rate * block_idx / max(total_blocks, 1)
                x = MBConv(
                    in_channels=in_ch,
                    out_channels=out_ch,
                    expand_ratio=expand,
                    kernel=kernel,
                    stride=s,
                    dilation=2 if dilated else 1,
                    drop_rate=drop,
                    bn_momentum=self.bn_momentum,
                    dtype=self.dtype,
                    name=f"stage{stage_i}_block{r}",
                )(x, train=train)
                in_ch = out_ch
                block_idx += 1
            if stage_i in _TAP_AFTER_STAGE:
                features.append(x)

        return features  # [r2, r4, r8, r16, r32]
