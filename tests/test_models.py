"""Shape/behavior tests for the model zoo on tiny inputs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pistoseg_tpu.models import (
    EfficientNetEncoder,
    UnetPlusPlus,
    ResNet38d,
    WideResNetClassifier,
    ReviseNet,
    create_segmentation_model,
)
from pistoseg_tpu.models.efficientnet import encoder_out_channels
from pistoseg_tpu.models.rfm import get_norm_cam_d


def test_encoder_channels_match_smp():
    assert encoder_out_channels("efficientnet-b0") == (32, 24, 40, 112, 320)
    assert encoder_out_channels("efficientnet-b3") == (40, 32, 48, 136, 384)


def test_efficientnet_feature_pyramid():
    m = EfficientNetEncoder("efficientnet-b0")
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(vars_, x)
    shapes = [f.shape for f in feats]
    assert shapes == [
        (1, 32, 32, 32),
        (1, 16, 16, 24),
        (1, 8, 8, 40),
        (1, 4, 4, 112),
        (1, 2, 2, 320),
    ]


def test_unetpp_output_shape_and_jit():
    m = UnetPlusPlus(num_classes=3, encoder_name="efficientnet-b0")
    x = jnp.zeros((2, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    out = jax.jit(lambda v, x: m.apply(v, x))(vars_, x)
    assert out.shape == (2, 64, 64, 3)


def test_unetpp_train_mode_updates_batch_stats():
    m = UnetPlusPlus(num_classes=3)
    x = jnp.ones((1, 32, 32, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    out, updates = m.apply(
        vars_, x, train=True, mutable=["batch_stats"], rngs={"droppath": jax.random.PRNGKey(1)}
    )
    assert out.shape == (1, 32, 32, 3)
    assert "batch_stats" in updates


def test_unet_factory():
    m = create_segmentation_model("Unet", "efficientnet-b0", 4)
    x = jnp.zeros((1, 32, 32, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(vars_, x).shape == (1, 32, 32, 4)
    with pytest.raises(ValueError):
        create_segmentation_model("nope", "efficientnet-b0", 3)


def test_resnet38d_feature_dict():
    m = ResNet38d()
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    d = m.apply(vars_, x)
    # /8 with dilation beyond b4; channels 512/1024/4096
    assert d["conv4"].shape == (1, 8, 8, 512)
    assert d["conv5"].shape == (1, 8, 8, 1024)
    assert d["conv6"].shape == (1, 8, 8, 4096)
    assert d["conv3"].shape == (1, 16, 16, 256)


def test_wide_resnet_classifier_heads_consistent():
    m = WideResNetClassifier(num_classes=3)
    x = jnp.zeros((1, 64, 64, 3)) + 0.5
    vars_ = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(vars_, x)
    assert out["logits"].shape == (1, 3)
    assert out["cam"].shape == (1, 8, 8, 3)
    # GAP(cam) must equal logits (single shared head)
    np.testing.assert_allclose(
        np.asarray(jnp.mean(out["cam"], axis=(1, 2))), np.asarray(out["logits"]), rtol=2e-2, atol=1e-4
    )


def test_get_norm_cam_d_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    cam = rng.randn(2, 4, 8, 8).astype(np.float32)  # NCHW torch layout
    t = torch.from_numpy(cam.copy())
    n, c, h, w = t.shape
    d_min = t.view(n, c, -1).min(-1)[0].view(n, c, 1, 1)
    d_max = t.view(n, c, -1).max(-1)[0].view(n, c, 1, 1) + 1e-5
    norm = (t - d_min) / (d_max - d_min)
    norm[:, 0] = 1 - norm[:, 1:].max(1)[0]
    mx = norm[:, 1:].max(1, keepdim=True)[0]
    norm[:, 1:][norm[:, 1:] < mx] = 0
    ref = norm.numpy()
    got = np.asarray(get_norm_cam_d(jnp.asarray(cam.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_revise_net_outputs():
    m = ReviseNet(num_classes=4)
    x = jnp.zeros((1, 64, 64, 3)) + 0.3
    pmask = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 4), jnp.float32)
    pcam = jnp.asarray(np.random.RandomState(1).rand(1, 8, 8, 4), jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x, pmask, pcam)
    cam, cam_rv, pmask_rv, pcam_rv = m.apply(vars_, x, pmask, pcam)
    for t in (cam, cam_rv, pmask_rv, pcam_rv):
        assert t.shape == (1, 64, 64, 4)
        assert bool(jnp.isfinite(t).all())


def test_deeplabv3plus():
    m = create_segmentation_model("DeepLabV3Plus", "efficientnet-b0", 3)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(vars_, x)
    assert out.shape == (1, 64, 64, 3)
    out_t, upd = m.apply(vars_, x, train=True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(1),
                               "droppath": jax.random.PRNGKey(2)})
    assert out_t.shape == (1, 64, 64, 3)
