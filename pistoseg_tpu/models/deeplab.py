"""DeepLabV3+ — smp 0.3.0-exact topology (ASPP + separable decoder).

The reference's model factory accepts DeepLabV3Plus alongside UNet++
(``smp.create_model``, ``mosaic_module.py:78-86``; the stage-5 trainer
special-cases it as nondeterministic, ``segmentation_train.py:153-169`` —
a torch-only caveat: here every upsample is the deterministic matrix
resize, so DeepLab is exactly reproducible too).

Mirrors ``segmentation_models_pytorch==0.3.0`` (the reference's pin,
``environment.yaml:182``) structurally:

* the encoder runs at **output_stride 16** (smp ``make_dilated``: the r32
  stages' first stride → 1, every conv dilated ×2), so ASPP consumes the
  DEEPEST feature (b0: 320 ch) on the r16 grid;
* ASPP with **separable** 3×3 branches at rates 12/24/36 (dw conv has no
  interleaved BN — BN follows the pointwise), a pooled branch, a 1×1
  projection with Dropout(0.5);
* one separable 3×3 after ASPP (still r16), ×4 bilinear **align_corners**
  upsample, concat with the 48-ch projection of the r4 feature, ONE
  separable 3×3 fuse block;
* 1×1 head then ×4 align-corners upsample to input resolution.

Functional-torch parity: tests/test_torch_forward_parity.py
``test_deeplab_decoder_forward_parity`` re-executes this decoder spec with
raw ``F.conv2d``/``F.batch_norm`` chains and asserts ≤1e-4.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from pistoseg_tpu.models.efficientnet import EfficientNetEncoder
from pistoseg_tpu.ops.resize import resize


class SeparableConvBNReLU(nn.Module):
    """smp ``SeparableConv2d`` (+BN+ReLU): depthwise 3×3 (dilated) →
    pointwise 1×1 → BN → ReLU.  No BN between dw and pw, both bias-free."""

    features: int
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = nn.Conv(c, (3, 3), kernel_dilation=(self.dilation, self.dilation),
                    padding="SAME", feature_group_count=c, use_bias=False,
                    dtype=self.dtype, name="dw")(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="pw")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         use_fast_variance=False, name="bn")(x)
        return nn.relu(x)


class ConvBNReLU1x1(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         use_fast_variance=False, name="bn")(x)
        return nn.relu(x)


class ASPP(nn.Module):
    """smp ASPP with separable branches (deeplabv3/decoder.py)."""

    features: int = 256
    rates: Sequence[int] = (12, 24, 36)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1:3]
        branches = [ConvBNReLU1x1(self.features, dtype=self.dtype,
                                  name="branch0")(x, train)]
        for i, r in enumerate(self.rates):
            branches.append(
                SeparableConvBNReLU(self.features, dilation=r,
                                    dtype=self.dtype,
                                    name=f"branch{i + 1}")(x, train)
            )
        # pooled branch: 1×1 global pool → conv/BN/ReLU → broadcast back
        # (bilinear interpolation of a 1×1 map == broadcast)
        gp = jnp.mean(x, axis=(1, 2), keepdims=True)
        gp = ConvBNReLU1x1(self.features, dtype=self.dtype,
                           name="pool_branch")(gp, train)
        branches.append(jnp.broadcast_to(
            gp, (x.shape[0], h, w, self.features)))
        y = jnp.concatenate(branches, axis=-1)
        y = ConvBNReLU1x1(self.features, dtype=self.dtype,
                          name="project")(y, train)
        return nn.Dropout(0.5, deterministic=not train)(y)


class DeepLabV3PlusDecoder(nn.Module):
    """smp ``DeepLabV3PlusDecoder`` (output_stride=16): ASPP → separable
    3×3 → ×4 align-corners up → concat 48-ch low-level → separable 3×3."""

    features: int = 256
    rates: Sequence[int] = (12, 24, 36)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], train: bool = False):
        r4, deepest = features[1], features[-1]      # r4 tap, dilated r16 tap
        y = ASPP(self.features, tuple(self.rates), dtype=self.dtype,
                 name="aspp")(deepest, train=train)
        y = SeparableConvBNReLU(self.features, dtype=self.dtype,
                                name="aspp_sep")(y, train)
        # nn.UpsamplingBilinear2d(scale_factor=4) == align_corners=True
        y = resize(y, r4.shape[1:3], method="linear_align_corners")
        low = ConvBNReLU1x1(48, dtype=self.dtype, name="block1")(r4, train)
        y = jnp.concatenate([y, low.astype(y.dtype)], axis=-1)
        return SeparableConvBNReLU(self.features, dtype=self.dtype,
                                   name="block2")(y, train)


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
                                    output_stride=16,
                                    name="encoder")(x, train=train)
        y = DeepLabV3PlusDecoder(self.decoder_channels, dtype=self.dtype,
                                 name="decoder")(feats, train=train)
        # smp SegmentationHead(kernel_size=1, upsampling=4, bilinear
        # align_corners=True)
        y = nn.Conv(self.num_classes, (1, 1), name="head")(y.astype(jnp.float32))
        return resize(y, (H, W), method="linear_align_corners")
