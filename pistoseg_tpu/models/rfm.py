"""Revise-Feature Module network (stage 4).

Reimplements ``models/revise_net.py`` in NHWC flax: ResNet38d backbone,
``fc8`` 4096→C CAM head on dropped-out conv6, low/mid-level projections
``f8_3`` (512→64) / ``f8_4`` (1024→128), a pixel-affinity attention
``A = softmax(qᵀk, over rows)`` built from ``f = [x↓, f8_3, f8_4]``
(195ch) with ``f9_1``/``f9_2`` projections (``revise_net.py:64-75``), and
the RFM refinement ``RFM(m, A) = reshape(m_flat · A)``
(``revise_net.py:90-96``).  All four outputs are upsampled to input size
with align_corners=True bilinear (deterministic matrix resize here).

TPU notes: the affinity is a single (hw×hw) matmul per image — 1024²
for 256² inputs at /8 — which rides the MXU directly; the softmax is the
only VPU-bound step.  ``get_norm_cam_d`` is fully stop-gradient
(reference computes it under ``torch.no_grad``).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pistoseg_tpu.models.resnet38d import ResNet38d
from pistoseg_tpu.ops.resize import resize


def get_norm_cam_d(cam: jnp.ndarray) -> jnp.ndarray:
    """Per-channel spatial min-max norm, background = 1 − max(fg), and
    foreground non-max suppression (strictly-less entries zeroed) —
    ``revise_net.py:29-41``.  Entirely non-differentiable (no_grad).

    cam: (N, H, W, C), channel 0 = background.
    """
    cam = jax.lax.stop_gradient(cam)
    c_min = jnp.min(cam, axis=(1, 2), keepdims=True)
    c_max = jnp.max(cam, axis=(1, 2), keepdims=True) + 1e-5
    norm = (cam - c_min) / (c_max - c_min)
    fg = norm[..., 1:]
    bg = 1.0 - jnp.max(fg, axis=-1, keepdims=True)
    fg_max = jnp.max(fg, axis=-1, keepdims=True)
    fg = jnp.where(fg < fg_max, 0.0, fg)
    return jnp.concatenate([bg, fg], axis=-1)


class ReviseNet(nn.Module):
    """Returns (cam, cam_rv, pmask_rv, pcam_rv), all (N, H, W, C).

    ``use_pallas=True`` routes the affinity+apply through the fused
    Pallas attention kernel (``ops/pallas/rfm_attention.py``): the L×L
    affinity is computed once per image and streamed over all three maps
    concatenated on the value channel, never materializing A in HBM.
    """

    num_classes: int  # including background channel
    use_pallas: bool = False
    dtype: Any = jnp.float32
    remat: bool = False  # rematerialize the backbone (memory ↔ FLOPs)

    def rfm(self, m: jnp.ndarray, attn: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
        """Refine map ``m`` through affinity ``attn`` (``revise_net.py:90-96``)."""
        h, w = hw
        m = resize(m, (h, w), method="linear_align_corners")
        n, _, _, c = m.shape
        flat = m.reshape(n, h * w, c)                       # (N, hw, C)
        # out[j] = Σ_i m[i]·A[i, j]; A column-normalized over i
        out = jnp.einsum("nic,nij->njc", flat, attn,
                         precision=jax.lax.Precision.HIGHEST)
        return out.reshape(n, h, w, c)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,       # (N, H, W, 3) normalized image
        pmask: jnp.ndarray,   # (N, h, w, C) pseudo-mask logits incl. bg ch 0
        pcam: jnp.ndarray,    # (N, h, w, C) CAM scores incl. bg ch 0
        train: bool = False,
    ):
        N, H, W, _ = x.shape
        backbone_cls = (
            nn.remat(ResNet38d, static_argnums=(2,)) if self.remat else ResNet38d
        )
        d = backbone_cls(b7_dilation=4, dtype=self.dtype, name="backbone")(x, train)

        conv6 = nn.Dropout(0.5, broadcast_dims=(1, 2), deterministic=not train,
                           name="dropout7")(d["conv6"])
        # CAM head and attention projections in f32 (parity-sensitive)
        cam = nn.Conv(self.num_classes, (1, 1), use_bias=False,
                      kernel_init=nn.initializers.xavier_uniform(),
                      name="fc8")(conv6.astype(jnp.float32))  # (N, h, w, C)
        h, w = cam.shape[1:3]

        cam_d_norm = get_norm_cam_d(cam)
        pmask_d_norm = get_norm_cam_d(pmask)
        pcam_d_norm = get_norm_cam_d(pcam)

        f8_3 = nn.relu(nn.Conv(64, (1, 1), use_bias=False,
                               kernel_init=nn.initializers.kaiming_normal(),
                               name="f8_3")(d["conv4"].astype(jnp.float32)))
        f8_4 = nn.relu(nn.Conv(128, (1, 1), use_bias=False,
                               kernel_init=nn.initializers.kaiming_normal(),
                               name="f8_4")(d["conv5"].astype(jnp.float32)))
        x_s = resize(x, (h, w), method="linear_align_corners")
        f = jnp.concatenate([x_s, f8_3, f8_4], axis=-1)     # (N, h, w, 195)

        gain4 = nn.initializers.variance_scaling(16.0, "fan_avg", "uniform")
        q = nn.Conv(192, (1, 1), use_bias=False, kernel_init=gain4, name="f9_1")(f)
        k = nn.Conv(192, (1, 1), use_bias=False, kernel_init=gain4, name="f9_2")(f)
        q = q.reshape(N, h * w, 192)
        k = k.reshape(N, h * w, 192)

        up = lambda m: resize(m, (H, W), method="linear_align_corners")

        if self.use_pallas:
            from pistoseg_tpu.ops.pallas.rfm_attention import rfm_attention

            C = self.num_classes
            maps = [
                resize(m, (h, w), method="linear_align_corners")
                for m in (pmask_d_norm, pcam_d_norm, cam_d_norm)
            ]
            v = jnp.concatenate(
                [m.reshape(N, h * w, C) for m in maps], axis=-1
            )  # (N, L, 3C)
            out = rfm_attention(q, k, v)  # single fused pass
            out = out.reshape(N, h, w, 3 * C)
            pmask_rv = up(out[..., :C])
            pcam_rv = up(out[..., C : 2 * C])
            cam_rv = up(out[..., 2 * C :])
        else:
            # A[i, j] = <q_i, k_j>, softmax over i (dim=1, column-normalized)
            attn = jnp.einsum("nic,njc->nij", q, k,
                              precision=jax.lax.Precision.HIGHEST)
            attn = jax.nn.softmax(attn, axis=1)
            pmask_rv = up(self.rfm(pmask_d_norm, attn, (h, w)))
            pcam_rv = up(self.rfm(pcam_d_norm, attn, (h, w)))
            cam_rv = up(self.rfm(cam_d_norm, attn, (h, w)))

        cam_up = up(cam)
        return cam_up, cam_rv, pmask_rv, pcam_rv
