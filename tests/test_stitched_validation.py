"""stitched_validation over a multi-scale patch split with a synthetic
'oracle' model — locks the (apply_fn, variables) contract and the
patch+big-mask metric path without training anything."""

from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from pistoseg_tpu.core.config import Config, DATASET_PROFILES
from pistoseg_tpu.data.datasets import EvalPatchDataset
from pistoseg_tpu.data.loader import BatchLoader
from pistoseg_tpu.stages.common import stitched_validation
from pistoseg_tpu.stages.stage1_split import split_images

from util_synthetic import _CLASS_COLORS, make_big_eval_set

pytestmark = pytest.mark.heavy  # multi-scale oracle e2e


def test_multiscale_stitched_validation_with_oracle(tmp_path):
    big = make_big_eval_set(tmp_path / "val", "wsss4luad", n_images=2, size=128)
    cfg = Config()
    out = tmp_path / "patches"
    # two scales to exercise the cross-scale merge
    split_images(cfg, big, out, patch_size=64, stride=32, scales=(1.0, 1.5))

    colors = jnp.asarray(_CLASS_COLORS[:3], jnp.float32)  # (3, 3) class colors

    def oracle(variables, x):
        # x is ImageNet-normalized; undo to raw RGB, then score each pixel
        # by negative distance to its class color (white background scores
        # low everywhere -> arbitrary class, excluded by gt masking)
        mean = jnp.asarray([0.485, 0.456, 0.406]) * 255.0
        std = jnp.asarray([0.229, 0.224, 0.225]) * 255.0
        rgb = x * std + mean
        d = jnp.linalg.norm(rgb[..., None, :] - colors, axis=-1)  # (N,H,W,3)
        return -d

    loader = BatchLoader(EvalPatchDataset(out, patch_size=64), batch_size=8)
    metrics = stitched_validation(oracle, {}, loader, 3, big)
    # oracle predictions are near-perfect on the color-separable set
    assert metrics["patch_miou"] > 0.95
    assert metrics["mask_miou"] > 0.95
    # with TTA the oracle is color-equivariant, still near-perfect
    loader2 = BatchLoader(EvalPatchDataset(out, patch_size=64), batch_size=8)
    metrics_tta = stitched_validation(oracle, {}, loader2, 3, big, tta=True)
    assert metrics_tta["mask_miou"] > 0.95
