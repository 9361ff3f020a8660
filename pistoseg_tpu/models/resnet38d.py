"""Wide dilated ResNet-38 ("ResNet38d", SEAM lineage) backbone.

Reimplements ``models/resnet38d.py`` of the reference in NHWC flax:
pre-activation residual blocks (BN → ReLU → conv), ``conv1a`` 3→64,
stride-2 stages b2–b4 (→ /8), b5 at dilation 2 (1024ch), bottleneck b6 at
dilation 4 (2048ch, spatial dropout 0.3), b7 at dilation 4 (4096ch,
dropout 0.5), final BN+ReLU; ``forward_as_dict`` feature taps conv3–conv6
(reference ``resnet38d.py:159-188``).

Frozen-BN semantics: the reference's ``train()`` override puts every
BatchNorm permanently in eval mode (``resnet38d.py:191-213``) — here BN
always uses running statistics (``use_running_average=True``); with
ImageNet-imported stats this matches the reference, and from scratch it
degenerates to a learnable affine (same as torch eval-mode BN at init).

The OEEM classifier variant differs only in b7's dilation (2 vs 4,
``OEEM/classification/network/wide_resnet.py:129``) — exposed as
``b7_dilation``.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp


def _conv(features: int, kernel: int, stride: int = 1, dilation: int = 1,
          dtype=jnp.float32, name=None):
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        kernel_dilation=(dilation, dilation),
        padding=[(pad, pad), (pad, pad)],
        use_bias=False,
        dtype=dtype,
        name=name,
    )


class FrozenBN(nn.Module):
    """BatchNorm locked to running statistics (reference frozen-BN mode)."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.BatchNorm(
            use_running_average=True,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            name="bn",
        )(x)


class ResBlock(nn.Module):
    """Pre-activation 3×3/3×3 block (reference ``ResBlock``)."""

    mid_channels: int
    out_channels: int
    stride: int = 1
    first_dilation: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_branch: bool = False):
        in_ch = x.shape[-1]
        same_shape = in_ch == self.out_channels and self.stride == 1

        branch2 = nn.relu(FrozenBN(dtype=self.dtype, name="bn_branch2a")(x))
        x_bn_relu = branch2

        if same_shape:
            branch1 = x
        else:
            branch1 = _conv(self.out_channels, 1, self.stride, dtype=self.dtype,
                            name="conv_branch1")(branch2)

        branch2 = _conv(
            self.mid_channels, 3, self.stride, self.first_dilation,
            dtype=self.dtype, name="conv_branch2a"
        )(branch2)
        branch2 = nn.relu(FrozenBN(dtype=self.dtype, name="bn_branch2b1")(branch2))
        branch2 = _conv(self.out_channels, 3, 1, self.dilation, dtype=self.dtype,
                        name="conv_branch2b1")(branch2)

        out = branch1 + branch2
        if return_branch:
            return out, x_bn_relu
        return out


class ResBlockBot(nn.Module):
    """Pre-activation bottleneck 1×1/3×3/1×1 with spatial dropout
    (reference ``ResBlock_bot``)."""

    out_channels: int
    stride: int = 1
    dilation: int = 1
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, return_branch: bool = False):
        branch2 = nn.relu(FrozenBN(dtype=self.dtype, name="bn_branch2a")(x))
        x_bn_relu = branch2

        branch1 = _conv(self.out_channels, 1, self.stride, dtype=self.dtype,
                        name="conv_branch1")(branch2)

        branch2 = _conv(self.out_channels // 4, 1, self.stride, dtype=self.dtype,
                        name="conv_branch2a")(branch2)
        branch2 = nn.relu(FrozenBN(dtype=self.dtype, name="bn_branch2b1")(branch2))
        branch2 = nn.Dropout(self.dropout, broadcast_dims=(1, 2), deterministic=not train)(branch2)
        branch2 = _conv(self.out_channels // 2, 3, 1, self.dilation, dtype=self.dtype,
                        name="conv_branch2b1")(branch2)
        branch2 = nn.relu(FrozenBN(dtype=self.dtype, name="bn_branch2b2")(branch2))
        branch2 = nn.Dropout(self.dropout, broadcast_dims=(1, 2), deterministic=not train)(branch2)
        branch2 = _conv(self.out_channels, 1, 1, dtype=self.dtype,
                        name="conv_branch2b2")(branch2)

        out = branch1 + branch2
        if return_branch:
            return out, x_bn_relu
        return out


class ResNet38d(nn.Module):
    """Backbone; ``__call__`` returns the conv3–conv6 feature dict."""

    b7_dilation: int = 4  # OEEM classifier variant uses 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        x = x.astype(self.dtype)
        x = _conv(64, 3, dtype=self.dtype, name="conv1a")(x)

        x = ResBlock(128, 128, stride=2, dtype=self.dtype, name="b2")(x)
        x = ResBlock(128, 128, dtype=self.dtype, name="b2_1")(x)
        x = ResBlock(128, 128, dtype=self.dtype, name="b2_2")(x)

        x = ResBlock(256, 256, stride=2, dtype=self.dtype, name="b3")(x)
        x = ResBlock(256, 256, dtype=self.dtype, name="b3_1")(x)
        x = ResBlock(256, 256, dtype=self.dtype, name="b3_2")(x)

        x, conv3 = ResBlock(512, 512, stride=2, dtype=self.dtype, name="b4")(x, return_branch=True)
        x = ResBlock(512, 512, dtype=self.dtype, name="b4_1")(x)
        x = ResBlock(512, 512, dtype=self.dtype, name="b4_2")(x)
        x = ResBlock(512, 512, dtype=self.dtype, name="b4_3")(x)
        x = ResBlock(512, 512, dtype=self.dtype, name="b4_4")(x)
        x = ResBlock(512, 512, dtype=self.dtype, name="b4_5")(x)

        x, conv4 = ResBlock(
            512, 1024, stride=1, first_dilation=1, dilation=2,
            dtype=self.dtype, name="b5"
        )(x, return_branch=True)
        x = ResBlock(512, 1024, dilation=2, dtype=self.dtype, name="b5_1")(x)
        x = ResBlock(512, 1024, dilation=2, dtype=self.dtype, name="b5_2")(x)

        x, conv5 = ResBlockBot(2048, dilation=4, dropout=0.3, dtype=self.dtype, name="b6")(
            x, train=train, return_branch=True
        )

        x = ResBlockBot(4096, dilation=self.b7_dilation, dropout=0.5,
                        dtype=self.dtype, name="b7")(
            x, train=train
        )
        conv6 = nn.relu(FrozenBN(dtype=self.dtype, name="bn7")(x))

        return {"conv3": conv3, "conv4": conv4, "conv5": conv5, "conv6": conv6}
