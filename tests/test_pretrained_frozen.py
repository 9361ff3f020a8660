"""Pretrained-weight wiring + frozen-parameter semantics (VERDICT r1 #1, #2).

Reference trainable sets:
* stage 4 (``revise_net.py:26-27`` + ``resnet38d.py:191-213``): conv1a,
  b2/b2_1/b2_2 and every BatchNorm weight/bias frozen; remaining convs in
  4 LR groups.
* stage 0 (``wide_resnet.py:133,192-208``): conv1a + all BN frozen, one
  group for the rest.
"""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pistoseg_tpu.core.config import Config
from pistoseg_tpu.models.rfm import ReviseNet
from pistoseg_tpu.models.wide_resnet import WideResNetClassifier
from pistoseg_tpu.train.optim import (
    RFM_MULTIPLIERS,
    WIDERESNET_MULTIPLIERS,
    poly_sgd_grouped,
    rfm_group_fn,
    wideresnet_group_fn,
)

from util_synthetic import make_training_patches


def _leaf_paths(tree):
    return {
        "/".join(str(getattr(k, "key", k)) for k in path): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree)
    }


def test_rfm_group_labels():
    model = ReviseNet(num_classes=4)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 4, 4, 4)), jnp.zeros((1, 4, 4, 4)),
    )
    labels = {p: rfm_group_fn(p) for p in _leaf_paths(dict(variables["params"]))}
    # every BN affine frozen
    for p, lab in labels.items():
        if "/bn/" in p or p.endswith("bn/scale") or p.endswith("bn/bias"):
            assert lab == "frozen", p
    assert labels["backbone/conv1a/kernel"] == "frozen"
    assert labels["backbone/b2/conv_branch2a/kernel"] == "frozen"
    assert labels["backbone/b2_1/conv_branch2b1/kernel"] == "frozen"
    assert labels["backbone/b2_2/conv_branch2a/kernel"] == "frozen"
    assert labels["backbone/b3/conv_branch2a/kernel"] == "pre_w"
    assert labels["backbone/b7/conv_branch2b2/kernel"] == "pre_w"
    assert labels["fc8/kernel"] == "scratch_w"
    assert labels["f9_1/kernel"] == "scratch_w"


def test_wideresnet_group_labels():
    model = WideResNetClassifier(num_classes=3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    labels = {p: wideresnet_group_fn(p) for p in _leaf_paths(dict(variables["params"]))}
    assert labels["trunk/conv1a/kernel"] == "frozen"
    for p, lab in labels.items():
        if "/bn/" in p:
            assert lab == "frozen", p
    assert labels["trunk/b2/conv_branch2a/kernel"] == "train"
    assert labels["trunk/b7/conv_branch2b2/kernel"] == "train"
    assert labels["fc_cls/kernel"] == "train"
    assert labels["fc_cls/bias"] == "train"


@pytest.mark.heavy
def test_stage4_step_freezes_reference_set():
    """One real grouped-optimizer step: frozen leaves bit-identical,
    trainable backbone + scratch leaves move."""
    from pistoseg_tpu.losses.revise import revise_losses
    from pistoseg_tpu.stages.stage4_revise import build_loss_fn
    from pistoseg_tpu.train.loop import make_train_step
    from pistoseg_tpu.train.state import create_train_state

    model = ReviseNet(num_classes=4, use_pallas=False)
    tx = poly_sgd_grouped(1e-2, 10, rfm_group_fn, RFM_MULTIPLIERS)
    rng = jax.random.PRNGKey(0)
    sample = (
        jnp.zeros((2, 32, 32, 3)),
        jnp.zeros((2, 4, 4, 4)),
        jnp.zeros((2, 4, 4, 4)),
    )
    state = create_train_state(model, rng, sample, tx)
    before = _leaf_paths(state.params)

    loss_fn = build_loss_fn(model, 32, 0.2, "fp32")
    step = make_train_step(loss_fn)
    rs = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rs.rand(2, 32, 32, 3), jnp.float32),
        "pmask": jnp.asarray(rs.randn(2, 4, 4, 3), jnp.float32),
        "cam": jnp.asarray(rs.rand(2, 4, 4, 3), jnp.float32),
        "label": jnp.ones((2, 3), jnp.float32),
        "valid": jnp.ones((2,), bool),
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    after = _leaf_paths(state.params)

    frozen = [p for p in before if rfm_group_fn(p) == "frozen"]
    moving = [p for p in before if rfm_group_fn(p) != "frozen"]
    assert frozen and moving
    for p in frozen:
        np.testing.assert_array_equal(before[p], after[p], err_msg=p)
    changed = [p for p in moving if not np.array_equal(before[p], after[p])]
    # every non-frozen group must have movement (grads flow everywhere here)
    assert any(p.startswith("backbone/b3") or p.startswith("backbone/b4")
               for p in changed)
    assert any(p.startswith("fc8") for p in changed)


def _synth_res38d_pth(tmp_path) -> Path:
    """Synthesize an ImageNet-style res38d.pth key-compatible with the
    reference converter output (``resnet38d.py:215-263`` naming)."""
    torch = pytest.importorskip("torch")
    from pistoseg_tpu.models.resnet38d import ResNet38d

    # reuse the flax→torch inverse mapping helper from the importer tests
    import test_import_profiling as tip

    model = ResNet38d()
    variables = model.init(jax.random.PRNGKey(42), jnp.zeros((1, 32, 32, 3)))
    params = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
    stats = jax.tree_util.tree_map(np.asarray, dict(variables["batch_stats"]))
    # perturb so "imported" is distinguishable from the stage's own init
    params = jax.tree_util.tree_map(lambda a: a + 0.01, params)
    sd = tip._flax_to_torch_sd(params, stats)
    path = tmp_path / "res38d.pth"
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, path)
    return path, params, stats


@pytest.mark.heavy
def test_stage0_pretrained_flag_e2e(tmp_path):
    """train_stage0 --pretrained: trunk initialized from the .pth; after a
    step the frozen leaves still equal the imported values exactly."""
    pytest.importorskip("torch")
    from pistoseg_tpu.core.checkpoint import CheckpointManager
    from pistoseg_tpu.stages.stage0_cam import train_stage0

    path, imp_params, imp_stats = _synth_res38d_pth(tmp_path)
    train = tmp_path / "train"
    make_training_patches(train, "wsss4luad", n_per_class=2, size=32)

    cfg = Config()
    cfg.mesh.shape = (1,)
    cfg.cam.batch_size = 2
    cfg.cam.epochs = 1
    cfg.cam.crop_size = 32
    log_dir = tmp_path / "s0"
    train_stage0(cfg, str(train), log_dir=str(log_dir),
                 max_steps_per_epoch=2, pretrained=str(path))

    ckpt = CheckpointManager(log_dir / "checkpoints")
    tree = ckpt.restore("last")
    trunk = _leaf_paths(tree["params"]["trunk"])
    imp = _leaf_paths(imp_params)
    # frozen-by-reference leaves survive training bit-identically
    np.testing.assert_array_equal(trunk["conv1a/kernel"], imp["conv1a/kernel"])
    np.testing.assert_array_equal(
        trunk["b2/bn_branch2a/bn/scale"], imp["b2/bn_branch2a/bn/scale"]
    )
    np.testing.assert_array_equal(
        trunk["bn7/bn/scale"], imp["bn7/bn/scale"]
    )
    # trainable convs started from the import (not the stage init) and moved
    assert not np.array_equal(
        trunk["b4/conv_branch2a/kernel"], imp["b4/conv_branch2a/kernel"]
    )
    # batch_stats are the imported running stats (FrozenBN never updates)
    stats = _leaf_paths(tree["batch_stats"]["trunk"])
    np.testing.assert_array_equal(
        stats["b4/bn_branch2a/bn/mean"],
        _leaf_paths(imp_stats)["b4/bn_branch2a/bn/mean"],
    )


def test_stage4_pretrained_stage0_warm_start(tmp_path):
    """train_stage4(pretrained_stage0=...) overlays the stage-0 classifier
    trunk onto the ReviseNet backbone exactly (the in-pipeline substitute
    for the published res38d init — stages/common.py::apply_stage0_trunk)."""
    from pistoseg_tpu.core.checkpoint import CheckpointManager
    from pistoseg_tpu.stages.common import apply_stage0_trunk
    from pistoseg_tpu.stages.stage0_cam import train_stage0
    from pistoseg_tpu.train.state import create_train_state
    import optax

    train = tmp_path / "train"
    make_training_patches(train, "wsss4luad", n_per_class=2, size=32)
    cfg = Config()
    cfg.mesh.shape = (1,)
    cfg.cam.batch_size = 2
    cfg.cam.epochs = 1
    cfg.cam.crop_size = 32
    r0 = train_stage0(cfg, str(train), log_dir=str(tmp_path / "s0"),
                      max_steps_per_epoch=2)

    model = ReviseNet(num_classes=4)
    rng = jax.random.PRNGKey(0)
    sample = (jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 16, 16, 4)),
              jnp.zeros((1, 16, 16, 4)))
    state = create_train_state(model, rng, sample, optax.sgd(0.1))
    before = _leaf_paths(state.params["backbone"])
    state = apply_stage0_trunk(state, r0["checkpoint_dir"])

    tree = CheckpointManager(r0["checkpoint_dir"]).restore("last")
    trunk_p = _leaf_paths(tree["params"]["trunk"])
    trunk_s = _leaf_paths(tree["batch_stats"]["trunk"])
    after_p = _leaf_paths(jax.device_get(state.params)["backbone"])
    after_s = _leaf_paths(jax.device_get(state.batch_stats)["backbone"])
    # strict_cover: EVERY backbone leaf replaced by the trained trunk leaf
    assert set(after_p) == set(trunk_p)
    for k in trunk_p:
        np.testing.assert_array_equal(after_p[k], trunk_p[k])
    for k in trunk_s:
        np.testing.assert_array_equal(after_s[k], trunk_s[k])
    # and the warm start actually changed the random init
    assert any(not np.array_equal(before[k], after_p[k]) for k in before)
