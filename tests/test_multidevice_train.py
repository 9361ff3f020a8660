"""8-device data-parallel training == single-device training (VERDICT r1 #6).

Runs the REAL stage-2 (UNet++/b0 + device augmentation + AdamW) and
stage-4 (ResNet38d+RFM + grouped PolySGD) train steps on the full
8-device CPU mesh and on a 1-device mesh with identical seeds and the
same global batch, asserting the loss trajectories and final parameters
agree — i.e. sharding does not change semantics (batch_stats, grouped
optimizer, donated state).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pistoseg_tpu.parallel.mesh import build_mesh, shard_batch
from pistoseg_tpu.train.loop import make_train_step
from pistoseg_tpu.train.state import create_train_state

pytestmark = pytest.mark.heavy  # two compiles of each big model


def _run(mesh_shape, make_model_state, make_batch, steps=2):
    mesh = build_mesh(("data",), mesh_shape)
    model, state, loss_fn = make_model_state()
    step = make_train_step(loss_fn, mesh)
    losses = []
    for i in range(steps):
        batch = shard_batch(make_batch(i), mesh)
        rng = jax.random.fold_in(jax.random.PRNGKey(7), i)
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    params = jax.tree_util.tree_map(np.asarray, state.params)
    return losses, params


def _assert_same(run_a, run_b, tol=2e-4):
    losses_a, params_a = run_a
    losses_b, params_b = run_b
    np.testing.assert_allclose(losses_a, losses_b, rtol=tol, atol=tol)
    flat_a = jax.tree_util.tree_leaves(params_a)
    flat_b = jax.tree_util.tree_leaves(params_b)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-4)


def test_stage2_step_8dev_equals_1dev():
    from pistoseg_tpu.core.config import Config
    from pistoseg_tpu.models.factory import create_segmentation_model
    from pistoseg_tpu.ops.augment import AugmentConfig
    from pistoseg_tpu.stages.stage2_mosaic import build_loss_fn
    from pistoseg_tpu.train.optim import adamw_exponential

    cfg = Config()
    size, batch = 32, 8

    def make_model_state():
        model = create_segmentation_model("unetplusplus", "efficientnet-b0",
                                          cfg.profile.num_classes)
        tx = adamw_exponential(1e-3, 0.05, 0.9, 10)
        state = create_train_state(
            model, jax.random.PRNGKey(0), jnp.zeros((batch, size, size, 3)), tx
        )
        aug = AugmentConfig(out_size=size, rrc_scale=(0.9, 1.0))
        sc = cfg.mosaic
        sc.precision = "fp32"   # fp32 so 1-dev vs 8-dev reductions stay tight
        return model, state, build_loss_fn(model, cfg.profile, sc, aug)

    def make_batch(i):
        rs = np.random.RandomState(100 + i)
        return {
            "image": jnp.asarray(rs.rand(batch, size, size, 3), jnp.float32),
            "mask": jnp.asarray(rs.randint(0, 4, (batch, size, size)), jnp.int32),
            "valid": jnp.ones((batch,), bool),
        }

    _assert_same(_run((1,), make_model_state, make_batch),
                 _run((8,), make_model_state, make_batch))


def test_stage4_step_8dev_equals_1dev():
    from pistoseg_tpu.core.config import Config
    from pistoseg_tpu.models.rfm import ReviseNet
    from pistoseg_tpu.stages.stage4_revise import build_loss_fn
    from pistoseg_tpu.train.optim import (
        RFM_MULTIPLIERS, poly_sgd_grouped, rfm_group_fn,
    )

    cfg = Config()
    size, batch = 32, 8
    n_ch = cfg.profile.num_classes + 1

    def make_model_state():
        model = ReviseNet(num_classes=n_ch, use_pallas=False)
        tx = poly_sgd_grouped(1e-3, 10, rfm_group_fn, RFM_MULTIPLIERS)
        sample = (
            jnp.zeros((batch, size, size, 3)),
            jnp.zeros((batch, 4, 4, n_ch)),
            jnp.zeros((batch, 4, 4, n_ch)),
        )
        state = create_train_state(model, jax.random.PRNGKey(0), sample, tx)
        return model, state, build_loss_fn(model, size, 0.2, "fp32")

    def make_batch(i):
        rs = np.random.RandomState(200 + i)
        return {
            "image": jnp.asarray(rs.rand(batch, size, size, 3), jnp.float32),
            "pmask": jnp.asarray(rs.randn(batch, 4, 4, n_ch - 1), jnp.float32),
            "cam": jnp.asarray(rs.rand(batch, 4, 4, n_ch - 1), jnp.float32),
            "label": jnp.ones((batch, n_ch - 1), jnp.float32),
            "valid": jnp.ones((batch,), bool),
        }

    _assert_same(_run((1,), make_model_state, make_batch),
                 _run((8,), make_model_state, make_batch))
