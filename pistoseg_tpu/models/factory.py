"""Model factory — the ``smp.create_model`` equivalent.

The reference builds stage-2/5 models via
``smp.create_model(args.model, encoder_name=args.encoder,
decoder_attention_type='scse', classes=num_classes)``
(``mosaic_module.py:78-86``).  Here the same (model, encoder) surface maps
to native flax modules.
"""

from __future__ import annotations

import flax.linen as nn

from pistoseg_tpu.models.unetpp import DecoderBlock, UnetPlusPlus
from pistoseg_tpu.models.efficientnet import EfficientNetEncoder

from typing import Any, Optional, Sequence

import jax.numpy as jnp


class Unet(nn.Module):
    """Plain UNet decoder (supported by the reference's ``--model`` flag)."""

    num_classes: int = 3
    encoder_name: str = "efficientnet-b0"
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    attention: Optional[str] = "scse"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        feats = EfficientNetEncoder(self.encoder_name, dtype=self.dtype,
                                    name="encoder")(x, train=train)
        skips = feats[:-1][::-1] + [None]          # [r16, r8, r4, r2, None]
        y = feats[-1]
        for i, skip in enumerate(skips):
            y = DecoderBlock(self.decoder_channels[i], self.attention,
                             self.dtype, name=f"block{i}")(y, skip, train=train)
        return nn.Conv(self.num_classes, (3, 3), padding="SAME",
                       name="head")(y.astype(jnp.float32))


from pistoseg_tpu.models.deeplab import DeepLabV3Plus

_MODELS = {
    "unetplusplus": UnetPlusPlus,
    "unet++": UnetPlusPlus,
    "unet": Unet,
    "deeplabv3plus": DeepLabV3Plus,
    "deeplabv3+": DeepLabV3Plus,
}


def create_segmentation_model(
    model: str,
    encoder: str,
    num_classes: int,
    attention: str = "scse",
    dtype=jnp.float32,
) -> nn.Module:
    """smp.create_model equivalent; ``dtype`` is the computation dtype
    (bf16 for the TPU hot path; params always f32)."""
    key = model.lower().replace("_", "").replace("-", "")
    if key not in _MODELS:
        raise ValueError(f"unknown model '{model}' (have: {sorted(_MODELS)})")
    cls = _MODELS[key]
    return cls(num_classes=num_classes, encoder_name=encoder,
               attention=attention, dtype=dtype)
