"""Numerical forward parity vs the reference architecture in torch
(VERDICT r1 #5): random-init flax weights are exported to a torch
state_dict, the reference forward is re-executed functionally in torch
(from the architecture spec in ``/root/reference/models/resnet38d.py`` and
``revise_net.py`` — no code copied), and activations must agree ≤1e-4.

Covers: ResBlock (stride/dilation variants), ResBlock_bot, the full
ResNet38d feature dict (conv3..conv6, both b7 dilations), and the RFM
forward including the 1024-token affinity attention.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from pistoseg_tpu.models.resnet38d import ResBlock, ResBlockBot, ResNet38d
from pistoseg_tpu.models.rfm import ReviseNet

from test_import_profiling import _flax_to_torch_sd


def _t(x_nhwc: np.ndarray) -> "torch.Tensor":
    return torch.tensor(np.transpose(x_nhwc, (0, 3, 1, 2)), dtype=torch.float32)


def _nhwc(x: "torch.Tensor") -> np.ndarray:
    return np.transpose(x.detach().numpy(), (0, 2, 3, 1))


def t_conv(x, w, stride=1, dilation=1):
    k = w.shape[2]
    pad = dilation * (k - 1) // 2
    return F.conv2d(x, w, stride=stride, padding=pad, dilation=dilation)


def t_bn(x, sd, p):
    return F.batch_norm(
        x, sd[f"{p}.running_mean"], sd[f"{p}.running_var"],
        sd[f"{p}.weight"], sd[f"{p}.bias"], training=False, eps=1e-5,
    )


def t_resblock(x, sd, name, stride=1, first_dilation=1, dilation=1,
               get_branch=False):
    """Reference ResBlock forward (resnet38d.py:6-51), functional."""
    branch2 = F.relu(t_bn(x, sd, f"{name}.bn_branch2a"))
    x_bn_relu = branch2
    if f"{name}.conv_branch1.weight" in sd:
        branch1 = F.conv2d(branch2, sd[f"{name}.conv_branch1.weight"], stride=stride)
    else:
        branch1 = x
    branch2 = t_conv(branch2, sd[f"{name}.conv_branch2a.weight"], stride, first_dilation)
    branch2 = F.relu(t_bn(branch2, sd, f"{name}.bn_branch2b1"))
    branch2 = t_conv(branch2, sd[f"{name}.conv_branch2b1.weight"], 1, dilation)
    out = branch1 + branch2
    return (out, x_bn_relu) if get_branch else out


def t_resblock_bot(x, sd, name, stride=1, dilation=1, get_branch=False):
    """Reference ResBlock_bot forward (resnet38d.py:53-101), eval mode."""
    branch2 = F.relu(t_bn(x, sd, f"{name}.bn_branch2a"))
    x_bn_relu = branch2
    branch1 = F.conv2d(branch2, sd[f"{name}.conv_branch1.weight"], stride=stride)
    branch2 = F.conv2d(branch2, sd[f"{name}.conv_branch2a.weight"], stride=stride)
    branch2 = F.relu(t_bn(branch2, sd, f"{name}.bn_branch2b1"))
    branch2 = t_conv(branch2, sd[f"{name}.conv_branch2b1.weight"], 1, dilation)
    branch2 = F.relu(t_bn(branch2, sd, f"{name}.bn_branch2b2"))
    branch2 = F.conv2d(branch2, sd[f"{name}.conv_branch2b2.weight"])
    out = branch1 + branch2
    return (out, x_bn_relu) if get_branch else out


def t_resnet38d(x, sd, b7_dilation=4):
    """Reference Net.forward_as_dict (resnet38d.py:119-188), eval mode."""
    x = t_conv(x, sd["conv1a.weight"])
    x = t_resblock(x, sd, "b2", stride=2)
    x = t_resblock(x, sd, "b2_1")
    x = t_resblock(x, sd, "b2_2")
    x = t_resblock(x, sd, "b3", stride=2)
    x = t_resblock(x, sd, "b3_1")
    x = t_resblock(x, sd, "b3_2")
    x, conv3 = t_resblock(x, sd, "b4", stride=2, get_branch=True)
    for n in ("b4_1", "b4_2", "b4_3", "b4_4", "b4_5"):
        x = t_resblock(x, sd, n)
    x, conv4 = t_resblock(x, sd, "b5", first_dilation=1, dilation=2, get_branch=True)
    x = t_resblock(x, sd, "b5_1", dilation=2)
    x = t_resblock(x, sd, "b5_2", dilation=2)
    x, conv5 = t_resblock_bot(x, sd, "b6", dilation=4, get_branch=True)
    x = t_resblock_bot(x, sd, "b7", dilation=b7_dilation)
    conv6 = F.relu(t_bn(x, sd, "bn7"))
    return {"conv3": conv3, "conv4": conv4, "conv5": conv5, "conv6": conv6}


def _torch_sd_from_variables(variables):
    params = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
    stats = jax.tree_util.tree_map(np.asarray, dict(variables["batch_stats"]))
    sd = _flax_to_torch_sd(params, stats)
    # non-trivial running stats so BN actually does something
    rng = np.random.RandomState(3)
    for k in list(sd):
        if k.endswith("running_mean"):
            sd[k] = rng.randn(*sd[k].shape).astype(np.float32) * 0.1
        elif k.endswith("running_var"):
            sd[k] = (rng.rand(*sd[k].shape).astype(np.float32) + 0.5)
    return {k: torch.tensor(v) for k, v in sd.items()}, sd


def _merge_stats(variables, sd_np):
    """Push the synthesized running stats back into the flax tree."""
    from flax.core import unfreeze

    stats = unfreeze(dict(variables["batch_stats"]))

    def walk(node, prefix):
        for k, v in list(node.items()):
            if isinstance(v, dict):
                walk(v, prefix + [k])
            else:
                path = prefix + [k]
                block = path[0]
                torch_name = "bn7" if block == "bn7" else f"{block}.{path[1]}"
                leaf = {"mean": "running_mean", "var": "running_var"}[path[-1]]
                node[k] = jnp.asarray(sd_np[f"{torch_name}.{leaf}"])

    walk(stats, [])
    return {"params": variables["params"], "batch_stats": stats}


@pytest.mark.parametrize("stride,dilation", [(1, 1), (2, 1), (1, 2)])
def test_resblock_forward_parity(stride, dilation):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 12, 12, 16).astype(np.float32)
    block = ResBlock(24, 24, stride=stride, first_dilation=dilation,
                     dilation=dilation)
    variables = block.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # wrap single-block params as a pseudo-tree for the sd exporter
    wrapped = {"params": {"bX": dict(variables["params"])},
               "batch_stats": {"bX": dict(variables["batch_stats"])}}
    sd_t, sd_np = _torch_sd_from_variables(wrapped)
    merged = _merge_stats(wrapped, sd_np)
    got = block.apply(
        {"params": merged["params"]["bX"], "batch_stats": merged["batch_stats"]["bX"]},
        jnp.asarray(x),
    )
    ref = t_resblock(_t(x), sd_t, "bX", stride=stride,
                     first_dilation=dilation, dilation=dilation)
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), atol=1e-4, rtol=1e-4)


def test_resblock_bot_forward_parity():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 8, 8, 24).astype(np.float32)
    block = ResBlockBot(32, dilation=2)
    variables = block.init(jax.random.PRNGKey(0), jnp.asarray(x))
    wrapped = {"params": {"bX": dict(variables["params"])},
               "batch_stats": {"bX": dict(variables["batch_stats"])}}
    sd_t, sd_np = _torch_sd_from_variables(wrapped)
    merged = _merge_stats(wrapped, sd_np)
    got = block.apply(
        {"params": merged["params"]["bX"], "batch_stats": merged["batch_stats"]["bX"]},
        jnp.asarray(x),
    )
    ref = t_resblock_bot(_t(x), sd_t, "bX", dilation=2)
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), atol=1e-4, rtol=1e-4)


@pytest.mark.heavy
@pytest.mark.parametrize("b7_dilation", [2, 4])
def test_resnet38d_full_forward_parity(b7_dilation):
    rng = np.random.RandomState(2)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    model = ResNet38d(b7_dilation=b7_dilation)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd_t, sd_np = _torch_sd_from_variables(variables)
    merged = _merge_stats(variables, sd_np)
    got = model.apply(merged, jnp.asarray(x))
    ref = t_resnet38d(_t(x), sd_t, b7_dilation=b7_dilation)
    for key in ("conv3", "conv4", "conv5", "conv6"):
        np.testing.assert_allclose(
            np.asarray(got[key]), _nhwc(ref[key]), atol=2e-4, rtol=2e-4,
            err_msg=key,
        )


def t_get_norm_cam_d(cam):
    """Reference revise_net.py:29-41 (eval semantics)."""
    n, c, h, w = cam.shape
    d = cam.detach().clone()
    mn = d.view(n, c, -1).min(dim=-1)[0].view(n, c, 1, 1)
    mx = d.view(n, c, -1).max(dim=-1)[0].view(n, c, 1, 1) + 1e-5
    norm = (cam - mn) / (mx - mn)
    norm[:, 0] = 1 - norm[:, 1:].max(dim=1)[0]
    fg_max = norm[:, 1:].max(dim=1, keepdim=True)[0]
    fg = norm[:, 1:].clone()
    fg[fg < fg_max] = 0
    norm[:, 1:] = fg
    return norm


def t_rfm_forward(x, pmask, pcam, feats, heads):
    """Reference revise_net.py:43-96 forward (eval), given backbone feats."""
    H, W = x.shape[2:]
    cam = F.conv2d(feats["conv6"], heads["fc8"])
    h, w = cam.shape[2:]
    cam_d = t_get_norm_cam_d(cam)
    pmask_d = t_get_norm_cam_d(pmask)
    pcam_d = t_get_norm_cam_d(pcam)
    f8_3 = F.relu(F.conv2d(feats["conv4"], heads["f8_3"]))
    f8_4 = F.relu(F.conv2d(feats["conv5"], heads["f8_4"]))
    x_s = F.interpolate(x, (h, w), mode="bilinear", align_corners=True)
    f = torch.cat([x_s, f8_3, f8_4], dim=1)
    n = f.shape[0]
    q = F.conv2d(f, heads["f9_1"]).view(n, -1, h * w)
    k = F.conv2d(f, heads["f9_2"]).view(n, -1, h * w)
    A = torch.softmax(torch.matmul(q.transpose(1, 2), k), dim=1)

    def rfm(m):
        m = F.interpolate(m, (h, w), mode="bilinear", align_corners=True)
        out = torch.matmul(m.view(n, -1, h * w), A).view(n, -1, h, w)
        return F.interpolate(out, (H, W), mode="bilinear", align_corners=True)

    cam_up = F.interpolate(cam, (H, W), mode="bilinear", align_corners=True)
    return cam_up, rfm(cam_d), rfm(pmask_d), rfm(pcam_d)


@pytest.mark.heavy
def test_rfm_full_forward_parity():
    """Full ReviseNet forward (backbone + affinity + RFM + upsamples) vs the
    functional torch reference, shared weights, eval mode."""
    rng = np.random.RandomState(4)
    n_ch = 4
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    pmask = rng.randn(1, 8, 8, n_ch).astype(np.float32)
    pcam = rng.rand(1, 8, 8, n_ch).astype(np.float32)

    model = ReviseNet(num_classes=n_ch, use_pallas=False)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(pmask), jnp.asarray(pcam)
    )
    params = dict(variables["params"])
    backbone_vars = {"params": params["backbone"],
                     "batch_stats": dict(variables["batch_stats"])["backbone"]}
    sd_t, sd_np = _torch_sd_from_variables(backbone_vars)
    merged_backbone = _merge_stats(backbone_vars, sd_np)

    full = {
        "params": dict(params, backbone=merged_backbone["params"]),
        "batch_stats": {"backbone": merged_backbone["batch_stats"]},
    }
    got = model.apply(full, jnp.asarray(x), jnp.asarray(pmask), jnp.asarray(pcam))

    feats = t_resnet38d(_t(x), sd_t, b7_dilation=4)
    heads = {
        name: torch.tensor(np.transpose(np.asarray(params[name]["kernel"]),
                                        (3, 2, 0, 1)))
        for name in ("fc8", "f8_3", "f8_4", "f9_1", "f9_2")
    }
    ref = t_rfm_forward(_t(x), _t(pmask), _t(pcam), feats, heads)
    names = ("cam", "cam_rv", "pmask_rv", "pcam_rv")
    for name, g, r in zip(names, got, ref):
        np.testing.assert_allclose(
            np.asarray(g), _nhwc(r), atol=5e-4, rtol=5e-4, err_msg=name
        )
