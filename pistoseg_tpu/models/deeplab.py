"""DeepLabV3+ decoder (ASPP + low-level fusion).

The reference's model factory accepts DeepLabV3Plus alongside UNet++
(``smp.create_model``, ``mosaic_module.py:78-86``; the stage-5 trainer
special-cases it as nondeterministic, ``segmentation_train.py:153-169`` —
a torch-only caveat: here the upsampling is the deterministic matrix
resize, so DeepLab is exactly reproducible too).

Architecture (smp semantics): ASPP over the r16 encoder feature
(rates 12/24/36, global pooling branch), 1×1 projection to 256, ×4
upsample, concat with a 48-ch projection of the r4 feature, two 3×3
separable convs, head, ×4 upsample to input resolution.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from pistoseg_tpu.models.efficientnet import EfficientNetEncoder
from pistoseg_tpu.ops.resize import resize


class _ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    dilation: int = 1
    depthwise: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.depthwise:
            c = x.shape[-1]
            x = nn.Conv(c, (self.kernel, self.kernel),
                        kernel_dilation=(self.dilation, self.dilation),
                        padding="SAME", feature_group_count=c, use_bias=False,
                        dtype=self.dtype, name="dw")(x)
            x = nn.Conv(self.features, (1, 1), use_bias=False,
                        dtype=self.dtype, name="pw")(x)
        else:
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        kernel_dilation=(self.dilation, self.dilation),
                        padding="SAME", use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         use_fast_variance=False)(x)
        return nn.relu(x)


class ASPP(nn.Module):
    features: int = 256
    rates: Sequence[int] = (12, 24, 36)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1:3]
        branches = [_ConvBNReLU(self.features, 1, dtype=self.dtype)(x, train)]
        for r in self.rates:
            branches.append(
                _ConvBNReLU(self.features, 3, dilation=r, depthwise=True,
                            dtype=self.dtype)(x, train)
            )
        gp = jnp.mean(x, axis=(1, 2), keepdims=True)
        gp = _ConvBNReLU(self.features, 1, dtype=self.dtype)(gp, train)
        gp = jnp.broadcast_to(gp, (x.shape[0], h, w, self.features))
        branches.append(gp)
        y = jnp.concatenate(branches, axis=-1)
        y = _ConvBNReLU(self.features, 1)(y, train)
        return nn.Dropout(0.5, deterministic=not train)(y)


class DeepLabV3Plus(nn.Module):
    num_classes: int = 3
    encoder_name: str = "efficientnet-b0"
    decoder_channels: int = 256
    attention: Optional[str] = None  # accepted for factory uniformity
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        H, W = x.shape[1:3]
        feats = EfficientNetEncoder(self.encoder_name, dtype=self.dtype,
                                    name="encoder")(x, train=train)
        r4, r16 = feats[1], feats[3]

        y = ASPP(self.decoder_channels, dtype=self.dtype, name="aspp")(r16, train=train)
        y = resize(y, r4.shape[1:3], method="linear")
        low = _ConvBNReLU(48, 1, dtype=self.dtype, name="low_proj")(r4, train)
        y = jnp.concatenate([y, low.astype(y.dtype)], axis=-1)
        y = _ConvBNReLU(self.decoder_channels, 3, depthwise=True,
                        dtype=self.dtype, name="fuse1")(y, train)
        y = _ConvBNReLU(self.decoder_channels, 3, depthwise=True,
                        dtype=self.dtype, name="fuse2")(y, train)
        y = nn.Conv(self.num_classes, (1, 1), name="head")(y.astype(jnp.float32))
        return resize(y, (H, W), method="linear")
