"""EfficientNet pretrained-import tests.

efficientnet_pytorch / timm are not installed in this image, so fixtures
are synthesized key-compatible from :func:`expected_state_dict_shapes`
(the recorded lukemelas layout) — VERDICT round-1 item 1.  Numerical
parity of the mapping itself is proven against a from-scratch torch MBConv
with TF-style SAME padding.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pistoseg_tpu.models.efficientnet import EfficientNetEncoder, MBConv
from pistoseg_tpu.models.import_efficientnet import (
    expected_state_dict_shapes,
    torch_state_dict_to_efficientnet,
)
from pistoseg_tpu.models.pretrained import (
    load_efficientnet_into,
    overlay_subtree,
)


def synth_state_dict(model_name: str, seed: int = 0):
    rng = np.random.RandomState(seed)
    sd = {}
    for key, shape in expected_state_dict_shapes(model_name).items():
        if key.endswith("running_var"):
            sd[key] = rng.rand(*shape).astype(np.float32) + 0.5
        else:
            sd[key] = rng.randn(*shape).astype(np.float32) * 0.05
    return sd


def _paths_shapes(tree):
    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        out[jax.tree_util.keystr(path)] = tuple(np.shape(leaf))
    return out


@pytest.mark.parametrize("name", ["efficientnet-b0", "efficientnet-b3"])
def test_import_matches_flax_tree_exactly(name):
    model = EfficientNetEncoder(name)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    want_p = _paths_shapes(dict(variables["params"]))
    want_s = _paths_shapes(dict(variables["batch_stats"]))

    params, stats = torch_state_dict_to_efficientnet(synth_state_dict(name), name)
    got_p = _paths_shapes(params)
    got_s = _paths_shapes(stats)

    assert got_p == want_p  # exact key sets AND exact shapes
    assert got_s == want_s

    # imported tree runs through the model
    feats = model.apply({"params": params, "batch_stats": stats},
                        jnp.zeros((2, 64, 64, 3)))
    assert len(feats) == 5


def test_unknown_and_missing_keys_fail_loudly():
    sd = synth_state_dict("efficientnet-b0")
    sd["_blocks.0._mystery.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(ValueError, match="unrecognized"):
        torch_state_dict_to_efficientnet(sd, "efficientnet-b0")
    sd2 = synth_state_dict("efficientnet-b0")
    del sd2["_blocks.3._se_reduce.bias"]
    with pytest.raises(ValueError, match="missing"):
        torch_state_dict_to_efficientnet(sd2, "efficientnet-b0")
    # classifier-top keys are tolerated
    sd3 = synth_state_dict("efficientnet-b0")
    sd3["_conv_head.weight"] = np.zeros((1280, 320, 1, 1), np.float32)
    sd3["_fc.weight"] = np.zeros((1000, 1280), np.float32)
    sd3["_bn1.weight"] = np.zeros((1280,), np.float32)
    sd3["_bn0.num_batches_tracked"] = np.zeros((), np.int64)
    torch_state_dict_to_efficientnet(sd3, "efficientnet-b0")


class _TorchMBConv:
    """From-scratch torch MBConv with TF-SAME padding (lukemelas semantics),
    used only to prove the weight-mapping numerically."""

    def __init__(self, sd, prefix, in_ch, out_ch, expand, kernel, stride):
        import torch

        self.t = torch
        self.sd = {k[len(prefix):]: torch.tensor(v) for k, v in sd.items()
                   if k.startswith(prefix)}
        self.in_ch, self.out_ch = in_ch, out_ch
        self.expand, self.kernel, self.stride = expand, kernel, stride

    def _same_pad(self, x, k, s):
        import torch.nn.functional as F
        h, w = x.shape[2], x.shape[3]
        pad_h = max((-h % s) + k - s, k - h if h < k else k - s if h % s == 0 else 0, 0)
        # TF SAME: total pad = max((ceil(h/s)-1)*s + k - h, 0), asymmetric
        pad_h = max((int(np.ceil(h / s)) - 1) * s + k - h, 0)
        pad_w = max((int(np.ceil(w / s)) - 1) * s + k - w, 0)
        return F.pad(x, [pad_w // 2, pad_w - pad_w // 2,
                         pad_h // 2, pad_h - pad_h // 2])

    def _bn(self, x, p):
        import torch.nn.functional as F
        return F.batch_norm(x, self.sd[f"{p}.running_mean"],
                            self.sd[f"{p}.running_var"],
                            self.sd[f"{p}.weight"], self.sd[f"{p}.bias"],
                            training=False, eps=1e-3)

    def __call__(self, x):
        import torch.nn.functional as F
        t = self.t
        x = t.tensor(x)
        inp = x
        c_exp = self.in_ch * self.expand
        if self.expand != 1:
            x = F.conv2d(x, self.sd["_expand_conv.weight"])
            x = F.silu(self._bn(x, "_bn0"))
        x = self._same_pad(x, self.kernel, self.stride)
        x = F.conv2d(x, self.sd["_depthwise_conv.weight"],
                     stride=self.stride, groups=c_exp)
        x = F.silu(self._bn(x, "_bn1"))
        s = x.mean(dim=(2, 3), keepdim=True)
        s = F.conv2d(s, self.sd["_se_reduce.weight"], self.sd["_se_reduce.bias"])
        s = F.silu(s)
        s = F.conv2d(s, self.sd["_se_expand.weight"], self.sd["_se_expand.bias"])
        x = x * t.sigmoid(s)
        x = F.conv2d(x, self.sd["_project_conv.weight"])
        x = self._bn(x, "_bn2")
        if self.stride == 1 and self.in_ch == self.out_ch:
            x = x + inp
        return x.numpy()


@pytest.mark.parametrize("block_idx,in_ch,out_ch,expand,kernel,stride", [
    (0, 32, 16, 1, 3, 1),    # b0 stage0: no expand, residual-less
    (1, 16, 24, 6, 3, 2),    # b0 stage1 first: expand + stride 2
    (3, 24, 40, 6, 5, 2),    # b0 stage2 first: 5×5 kernel
    (5, 40, 80, 6, 3, 2),    # b0 stage3 first
])
def test_mbconv_forward_parity_vs_torch(block_idx, in_ch, out_ch, expand, kernel, stride):
    torch = pytest.importorskip("torch")  # noqa: F841
    name = "efficientnet-b0"
    sd = synth_state_dict(name, seed=block_idx)
    params, stats = torch_state_dict_to_efficientnet(sd, name)

    # locate the flax block name for this flat index
    from pistoseg_tpu.models.import_efficientnet import _block_plan
    bname = _block_plan(name)[block_idx]["name"]

    x = np.random.RandomState(7).randn(2, 17, 17, in_ch).astype(np.float32)
    ref = _TorchMBConv(sd, f"_blocks.{block_idx}.", in_ch, out_ch,
                       expand, kernel, stride)(np.transpose(x, (0, 3, 1, 2)))

    block = MBConv(in_channels=in_ch, out_channels=out_ch, expand_ratio=expand,
                   kernel=kernel, stride=stride)
    got = block.apply(
        {"params": params[bname], "batch_stats": stats[bname]},
        jnp.asarray(x), train=False,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), ref, rtol=2e-5, atol=2e-5
    )


def test_overlay_into_unetpp_and_file_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    from pistoseg_tpu.models.factory import create_segmentation_model

    name = "efficientnet-b0"
    sd = synth_state_dict(name)
    path = tmp_path / "b0.pth"
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, path)

    model = create_segmentation_model("UnetPlusPlus", name, 3)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 64, 3)),
    )
    params0 = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
    stats0 = jax.tree_util.tree_map(np.asarray, dict(variables["batch_stats"]))

    params, stats = load_efficientnet_into(params0, stats0, str(path), name)

    # encoder leaves replaced with the imported values
    np.testing.assert_array_equal(
        params["encoder"]["stem_conv"]["kernel"],
        np.transpose(sd["_conv_stem.weight"], (2, 3, 1, 0)),
    )
    # decoder/head untouched
    dec0 = jax.tree_util.tree_leaves(params0["decoder"])
    dec1 = jax.tree_util.tree_leaves(params["decoder"])
    for a, b in zip(dec0, dec1):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(params0["head"])[0]),
        np.asarray(jax.tree_util.tree_leaves(params["head"])[0]),
    )

    # model still applies
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 64, 64, 3)


def test_overlay_shape_mismatch_raises():
    tree = {"encoder": {"stem_conv": {"kernel": np.zeros((3, 3, 3, 32))}}}
    with pytest.raises(ValueError, match="shape mismatch"):
        overlay_subtree(tree, "encoder",
                        {"stem_conv": {"kernel": np.zeros((3, 3, 3, 40))}})
    with pytest.raises(ValueError, match="not in model"):
        overlay_subtree(tree, "encoder", {"nope": {"kernel": np.zeros((1,))}})
    with pytest.raises(KeyError):
        overlay_subtree(tree, "backbone", {})
