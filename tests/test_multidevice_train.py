"""8-device data-parallel training == single-device training (VERDICT r1 #6).

Runs the REAL stage-2 (UNet++/b0 + device augmentation + Dice) and
stage-4 (ResNet38d+RFM + three-part loss) computations on the full
8-device CPU mesh and on a 1-device mesh with identical params, seeds and
global batch, asserting that sharding does not change semantics:

* the loss value agrees (proves all pools/reductions are global),
* the BatchNorm batch-statistics updates agree,
* gradients agree on every substantial leaf (structurally-cancelling
  near-zero-gradient leaves are noise-dominated and excluded — see
  _assert_semantics_match),
* and a full optimizer step executes under sharding with params moving.

Multi-STEP trajectory equality is deliberately NOT asserted: measured on
this model, two numerically-equivalent executions (1-dev vs 8-dev fp32,
reduction order the only difference) diverge to ~1e-3 in loss within two
steps — at batch 8 some BN channels have near-zero batch variance, so the
normalization amplifies 1e-7 parameter perturbations chaotically.  Loss,
gradients and stats at fixed params are the well-posed equality.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pistoseg_tpu.parallel.mesh import (
    batch_sharding,
    build_mesh,
    replicated,
    shard_batch,
)
from pistoseg_tpu.train.loop import make_train_step
from pistoseg_tpu.train.state import create_train_state

# multidev sub-lane: run just these with `pytest -m multidev --override-ini=addopts=`
pytestmark = [pytest.mark.heavy, pytest.mark.multidev]


def _leaves(tree):
    return {
        jax.tree_util.keystr(p): np.asarray(v)
        for p, v in jax.tree_util.tree_leaves_with_path(tree)
    }


def _forward_grads(mesh_shape, state, loss_fn, batch, rng):
    mesh = build_mesh(("data",), mesh_shape)
    repl, data = replicated(mesh), batch_sharding(mesh)
    gfn = jax.value_and_grad(loss_fn, has_aux=True)
    f = jax.jit(lambda p, bs, b, r: gfn(p, bs, b, r),
                in_shardings=(repl, repl, data, repl), out_shardings=repl)
    params = jax.device_put(state.params, repl)
    bs = jax.device_put(state.batch_stats, repl)
    sharded = shard_batch(dict(batch), mesh)
    (loss, (_, new_bs)), grads = f(params, bs, sharded, rng)
    return float(loss), _leaves(grads), _leaves(new_bs)


def _assert_semantics_match(state, loss_fn, batch, rng):
    l1, g1, s1 = _forward_grads((1,), state, loss_fn, batch, rng)
    l8, g8, s8 = _forward_grads((8,), state, loss_fn, batch, rng)

    # 1. loss equality proves the forward — including every global pool
    #    (BN batch stats, scSE/SE means, loss reductions) — is computed
    #    over the GLOBAL batch: a per-shard pool shifts the loss at ≥1e-3.
    assert abs(l1 - l8) < 1e-5 * max(abs(l1), 1.0), (l1, l8)

    # 2. BatchNorm running-stat updates computed under sharding equal the
    #    single-device ones — the direct check for per-shard statistics.
    for k, v in s1.items():
        np.testing.assert_allclose(v, s8[k], atol=1e-4, rtol=1e-4, err_msg=k)

    # 3. Gradient agreement on substantial leaves.  Leaves whose true
    #    gradient is structural cancellation (BN biases: downstream
    #    normalization is shift-invariant, so their gradient is a ~0 sum
    #    of large ± terms) amplify fp32 reduction-order noise to O(1)
    #    relative — measured up to 150% on this random-init toy — and are
    #    excluded by the norm threshold.  A real backward-wiring bug (e.g.
    #    a missing or double gradient reduction) scales ALL leaves ~8x
    #    (700%); the 8% cap on large leaves catches that with ~90x margin
    #    while riding above the measured few-percent noise on SE-gate
    #    kernels (saturated sigmoids: tiny cancelling derivative products;
    #    measured up to 5.1% once the on-device augmentation's f32 warp
    #    einsums — whose reduction order legitimately differs between the
    #    1-dev and 8-dev compilations — joined the fp32 reduction noise).
    dens = {k: float(np.linalg.norm(v)) for k, v in g1.items()}
    big = {k for k, d in dens.items() if d >= 1e-2 * max(dens.values())}
    assert len(big) >= 10  # the check must cover a meaningful set
    for k in big:
        num = float(np.linalg.norm(g1[k] - g8[k]))
        assert num <= 8e-2 * dens[k], (k, num, dens[k], num / dens[k])


def _assert_sharded_step_runs(state, loss_fn, batch, rng):
    mesh = build_mesh(("data",), (8,))
    step = make_train_step(loss_fn, mesh)
    before = _leaves(state.params)
    state2, metrics = step(state, shard_batch(dict(batch), mesh), rng)
    assert np.isfinite(float(metrics["loss"]))
    after = _leaves(state2.params)
    assert any(not np.array_equal(before[k], after[k]) for k in before)
    assert int(np.asarray(state2.step)) == 1


def test_stage2_semantics_8dev_equals_1dev():
    from pistoseg_tpu.core.config import Config
    from pistoseg_tpu.models.factory import create_segmentation_model
    from pistoseg_tpu.ops.augment import AugmentConfig
    from pistoseg_tpu.stages.stage2_mosaic import build_loss_fn
    from pistoseg_tpu.train.optim import adamw_exponential

    cfg = Config()
    size, batch = 32, 8
    model = create_segmentation_model("unetplusplus", "efficientnet-b0",
                                      cfg.profile.num_classes)
    tx = adamw_exponential(1e-3, 0.05, 0.9, 10)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((batch, size, size, 3)), tx
    )
    sc = cfg.mosaic
    sc.precision = "fp32"   # fp32 so reductions are the only difference
    loss_fn = build_loss_fn(model, cfg.profile, sc,
                            AugmentConfig(out_size=size, rrc_scale=(0.9, 1.0)))
    rs = np.random.RandomState(100)
    b = {
        "image": jnp.asarray(rs.rand(batch, size, size, 3), jnp.float32),
        "mask": jnp.asarray(rs.randint(0, 4, (batch, size, size)), jnp.int32),
        "valid": jnp.ones((batch,), bool),
    }
    rng = jax.random.PRNGKey(7)
    _assert_semantics_match(state, loss_fn, b, rng)
    _assert_sharded_step_runs(state, loss_fn, b, rng)


def test_stage4_semantics_8dev_equals_1dev():
    from pistoseg_tpu.core.config import Config
    from pistoseg_tpu.models.rfm import ReviseNet
    from pistoseg_tpu.stages.stage4_revise import build_loss_fn
    from pistoseg_tpu.train.optim import (
        RFM_MULTIPLIERS, poly_sgd_grouped, rfm_group_fn,
    )

    cfg = Config()
    size, batch = 32, 8
    n_ch = cfg.profile.num_classes + 1
    model = ReviseNet(num_classes=n_ch, use_pallas=False)
    tx = poly_sgd_grouped(1e-3, 10, rfm_group_fn, RFM_MULTIPLIERS)
    sample = (
        jnp.zeros((batch, size, size, 3)),
        jnp.zeros((batch, 4, 4, n_ch)),
        jnp.zeros((batch, 4, 4, n_ch)),
    )
    state = create_train_state(model, jax.random.PRNGKey(0), sample, tx)
    loss_fn = build_loss_fn(model, size, 0.2, "fp32")
    rs = np.random.RandomState(200)
    b = {
        "image": jnp.asarray(rs.rand(batch, size, size, 3), jnp.float32),
        "pmask": jnp.asarray(rs.randn(batch, 4, 4, n_ch - 1), jnp.float32),
        "cam": jnp.asarray(rs.rand(batch, 4, 4, n_ch - 1), jnp.float32),
        "label": jnp.ones((batch, n_ch - 1), jnp.float32),
        "valid": jnp.ones((batch,), bool),
    }
    rng = jax.random.PRNGKey(7)
    _assert_semantics_match(state, loss_fn, b, rng)
    _assert_sharded_step_runs(state, loss_fn, b, rng)


def test_stage2_full_main_on_8dev_mesh(tmp_path):
    """VERDICT r2 #9: a full stage main() (loader → Trainer → checkpointing
    → stitched validation) on the REAL 8-device mesh — the integration seam
    between the proven 8-dev step semantics and the 1-dev-only stage e2e
    tests."""
    import sys
    from pathlib import Path as _P
    sys.path.insert(0, str(_P(__file__).parent))
    from util_synthetic import make_big_eval_set, make_training_patches

    from pistoseg_tpu.core.config import Config, DATASET_PROFILES
    from pistoseg_tpu.data.mosaic import MosaicSynthesizer
    from pistoseg_tpu.stages.stage1_split import split_images
    from pistoseg_tpu.stages.stage2_mosaic import train_stage2

    root = tmp_path
    train = root / "train"
    make_training_patches(train, "wsss4luad", n_per_class=3, size=64)
    big = make_big_eval_set(root / "valid", "wsss4luad", n_images=1, size=96)
    profile = DATASET_PROFILES["wsss4luad"]
    synth = MosaicSynthesizer(train, profile, patch_num=2, tile_size=16)
    mosaic_dir = root / "mosaic"
    synth.write_range(mosaic_dir, 0, 16)

    cfg = Config()
    cfg.mesh.shape = (8,)          # the real virtual mesh — not (1,)
    cfg.mosaic.patch_size = 32
    cfg.mosaic.batch_size = 16     # 2 per device
    cfg.mosaic.epochs = 1
    cfg.mosaic.tta = False
    cfg.infer.batch_size = 8
    cfg.infer.tta = False
    patches = root / "val_patches"
    split_images(cfg, big, patches, patch_size=64, stride=32, scales=(1.0,))

    log_dir = root / "s2"
    r = train_stage2(cfg, str(mosaic_dir), val_data=str(patches),
                     val_big_root=str(big), log_dir=str(log_dir),
                     max_steps_per_epoch=2)
    ckpt_dir = log_dir / "checkpoints"
    assert (ckpt_dir / "last").exists()
    assert (ckpt_dir / "best").exists()
    assert 0.0 <= r["best_metric"] <= 1.0
