"""OEEM multilabel classifier (stage 0): ResNet38d trunk + 5632-ch head.

Reimplements ``OEEM/classification/network/wide_resnet.py:104-209``: the
ResNet38d trunk with b7 at dilation **2** (vs 4 in the segmentation
backbone, ``wide_resnet.py:129``), shared features =
``cat([conv4(512), conv5(1024), conv6(4096)])`` = 5632 channels at /8,
then GAP → Linear(5632→C) for classification.

CAM inference in the reference copies ``fc_cls`` weights into a 1×1 conv
``fc_cam`` at eval time (``train.py:136-143``); functionally a Linear
after GAP equals a 1×1 conv followed by GAP, so here ONE Dense produces
per-pixel class maps whose spatial mean is the classification logits —
no weight copying, both outputs in one forward.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from pistoseg_tpu.models.resnet38d import ResNet38d


class WideResNetClassifier(nn.Module):
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        d = ResNet38d(b7_dilation=2, dtype=self.dtype, name="trunk")(x, train=train)
        feats = jnp.concatenate([d["conv4"], d["conv5"], d["conv6"]], axis=-1)
        # head in f32 for loss stability
        pixel_logits = nn.Dense(self.num_classes, name="fc_cls")(
            feats.astype(jnp.float32))  # (N,h,w,C)
        logits = jnp.mean(pixel_logits, axis=(1, 2))                     # (N,C)
        return {"logits": logits, "cam": pixel_logits}
