"""UNet++ decoder with scSE attention + segmentation head.

Re-implements the architecture the reference instantiates via
``smp.create_model('UnetPlusPlus', encoder_name='efficientnet-b0',
decoder_attention_type='scse')`` (``mosaic_module.py:78-86``,
``segmentation_module.py``) as native flax/NHWC: the nested dense-skip
decoder (x_{i,j} grid over 5 feature levels, decoder channels
256/128/64/32/16), each block = nearest ×2 upsample → concat skips →
scSE → Conv-BN-ReLU ×2 → scSE, and a 3×3 conv head at input resolution.

TPU notes: nearest ×2 upsample is a reshape-broadcast (no gather);
concats are channel-dim (last, lane-aligned); all convs SAME/NHWC on the
MXU.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from pistoseg_tpu.models.efficientnet import EfficientNetEncoder


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) → (N, 2H, 2W, C) by pure reshape/broadcast."""
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


class SCSE(nn.Module):
    """Concurrent spatial & channel squeeze-excitation (smp 'scse')."""

    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        # cSE
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(max(1, c // self.reduction), (1, 1), dtype=self.dtype,
                    name="cse_reduce")(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), dtype=self.dtype, name="cse_expand")(s)
        cse = x * nn.sigmoid(s)
        # sSE
        q = nn.Conv(1, (1, 1), dtype=self.dtype, name="sse")(x)
        sse = x * nn.sigmoid(q)
        return cse + sse


class ConvBNReLU(nn.Module):
    features: int
    bn_momentum: float = 0.9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=self.bn_momentum,
                         dtype=self.dtype, use_fast_variance=False)(x)
        return nn.relu(x)


class DecoderBlock(nn.Module):
    out_channels: int
    attention: Optional[str] = "scse"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, skip: Optional[jnp.ndarray] = None, train: bool = False
    ) -> jnp.ndarray:
        x = upsample2x_nearest(x)
        if skip is not None:
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            if self.attention == "scse":
                x = SCSE(dtype=self.dtype, name="attention1")(x)
        x = ConvBNReLU(self.out_channels, dtype=self.dtype, name="conv1")(x, train=train)
        x = ConvBNReLU(self.out_channels, dtype=self.dtype, name="conv2")(x, train=train)
        if self.attention == "scse":
            x = SCSE(dtype=self.dtype, name="attention2")(x)
        return x


class UnetPlusPlusDecoder(nn.Module):
    """Nested dense-skip decoder over 5 encoder levels.

    Follows smp's UnetPlusPlusDecoder wiring: with reversed encoder
    channels (deepest first), dense grid x_{depth, layer}; the final block
    x_{0, 4} upsamples to input resolution with no skip.
    """

    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    attention: Optional[str] = "scse"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], train: bool = False) -> jnp.ndarray:
        # features: [r2, r4, r8, r16, r32] → deepest first
        feats = list(features)[::-1]  # [f(32), f(16), f(8), f(4), f(2)]
        depth = len(feats) - 1  # 4
        dch = list(self.decoder_channels)

        # smp out-channel rule: a block in column `li` outputs
        # decoder_channels[li] on the main row (d == 0) and
        # feats[li+1]-many channels on dense rows (d > 0).
        dense = {}
        for layer in range(depth):           # diagonal index as smp loops
            for d in range(depth - layer):
                li = d + layer               # layer index of this block
                if layer == 0:
                    out_ch = dch[li] if d == 0 else feats[li + 1].shape[-1]
                    # first diagonal: input feats[d], skip feats[d+1]
                    dense[(d, li)] = DecoderBlock(
                        out_ch, self.attention, self.dtype, name=f"x_{d}_{li}"
                    )(feats[d], feats[d + 1], train=train)
                else:
                    cat = [dense[(idx, li)] for idx in range(d + 1, li + 1)]
                    skip = jnp.concatenate(cat + [feats[li + 1]], axis=-1)
                    out_ch = dch[li] if d == 0 else feats[li + 1].shape[-1]
                    dense[(d, li)] = DecoderBlock(
                        out_ch, self.attention, self.dtype, name=f"x_{d}_{li}"
                    )(dense[(d, li - 1)], skip, train=train)
        # final ×2 to input resolution, no skip
        dense[(0, depth)] = DecoderBlock(
            dch[depth], self.attention, self.dtype, name=f"x_0_{depth}"
        )(dense[(0, depth - 1)], None, train=train)
        return dense[(0, depth)]


class UnetPlusPlus(nn.Module):
    """Full segmentation model: EfficientNet encoder → UNet++ → class logits.

    setup-style so the parts are addressable: ``__call__`` is the reference
    forward; ``fast_eval`` is the inference path that runs the low-channel
    decoder columns in a space-to-depth layout (numerically equivalent —
    see ``unetpp_fast.py``).  Parameter names (encoder/decoder/head) are
    identical between both paths, so checkpoints are interchangeable.
    """

    num_classes: int = 3
    encoder_name: str = "efficientnet-b0"
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    attention: Optional[str] = "scse"
    dtype: Any = jnp.float32
    # fast_eval: run decoder columns whose widest conv has ≤ this many output
    # channels in space-to-depth layout (0 disables).  16 measured fastest on
    # v5e: only the final 224² column re-lays out; wider columns lose more to
    # the ×4 FLOP blowup on concat convs than they gain in lane utilization.
    s2d_threshold: int = 16

    def setup(self):
        self.encoder = EfficientNetEncoder(self.encoder_name, dtype=self.dtype)
        self.decoder = UnetPlusPlusDecoder(
            tuple(self.decoder_channels), self.attention, self.dtype
        )
        # head + logits in f32 for loss stability
        self.head = nn.Conv(self.num_classes, (3, 3), padding="SAME")

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        feats = self.encoder(x, train=train)
        y = self.decoder(feats, train=train)
        return self.head(y.astype(jnp.float32))

    def encode(self, x: jnp.ndarray, train: bool = False):
        return self.encoder(x, train=train)

    def fast_eval(self, x: jnp.ndarray) -> jnp.ndarray:
        """Inference forward with the space-to-depth decoder re-layout.

        The smp-parity decoder's ≤32-channel 3×3 convs fill ≤3/128 of the
        MXU's contraction tiles and ≤¼ of its output lanes (PERF.md); this
        path reshapes those columns to (H/2, W/2, 4C) with exactly
        rearranged kernels — same math, ~4× better lane utilization.
        """
        from pistoseg_tpu.models.unetpp_fast import fast_decoder_head

        feats = self.encoder(x, train=False)
        return fast_decoder_head(
            self.decoder.variables,
            self.head.variables,
            feats,
            tuple(self.decoder_channels),
            self.attention,
            self.num_classes,
            threshold=self.s2d_threshold,
            dtype=self.dtype,
        )
