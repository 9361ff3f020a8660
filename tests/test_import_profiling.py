"""Tests for the legacy weight importer and profiling utilities."""

import numpy as np

import jax
import jax.numpy as jnp

from pistoseg_tpu.core.profiling import StepTimer
from pistoseg_tpu.models.import_torch import torch_state_dict_to_resnet38d
from pistoseg_tpu.models.resnet38d import ResNet38d


def _flax_to_torch_sd(params, stats):
    """Inverse mapping (test helper): flax ResNet38d tree → torch-style keys."""
    sd = {}

    def walk(tree, prefix, is_stats):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, prefix + [k], is_stats)
            else:
                path = prefix + [k]
                if path[0] == "conv1a":
                    sd["conv1a.weight"] = np.transpose(np.asarray(v), (3, 2, 0, 1))
                elif "bn" in path and path[0] == "bn7":
                    leaf = path[-1]
                    name = {"scale": "weight", "bias": "bias",
                            "mean": "running_mean", "var": "running_var"}[leaf]
                    sd[f"bn7.{name}"] = np.asarray(v)
                elif path[1].startswith("conv"):
                    sd[f"{path[0]}.{path[1]}.weight"] = np.transpose(
                        np.asarray(v), (3, 2, 0, 1)
                    )
                elif path[1].startswith("bn"):
                    leaf = path[-1]
                    name = {"scale": "weight", "bias": "bias",
                            "mean": "running_mean", "var": "running_var"}[leaf]
                    sd[f"{path[0]}.{path[1]}.{name}"] = np.asarray(v)

    walk(jax.tree_util.tree_map(np.asarray, params), [], False)
    walk(jax.tree_util.tree_map(np.asarray, stats), [], True)
    return sd


def test_torch_import_roundtrip():
    model = ResNet38d()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    params = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
    stats = jax.tree_util.tree_map(np.asarray, dict(variables["batch_stats"]))

    sd = _flax_to_torch_sd(params, stats)
    assert "conv1a.weight" in sd and "b2.conv_branch2a.weight" in sd
    got_params, got_stats = torch_state_dict_to_resnet38d(sd)

    ref_leaves = jax.tree_util.tree_leaves_with_path(params)
    got_flat = jax.tree_util.tree_leaves_with_path(got_params)
    assert len(ref_leaves) == len(got_flat)
    for (pa, va), (pb, vb) in zip(sorted(ref_leaves, key=str), sorted(got_flat, key=str)):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(va, vb)

    # imported tree is structurally valid for the model
    out = model.apply({"params": got_params, "batch_stats": got_stats},
                      jnp.zeros((1, 32, 32, 3)))
    assert out["conv6"].shape == (1, 4, 4, 4096)


def test_step_timer():
    t = StepTimer("x", warmup=1)
    import time
    for _ in range(3):
        with t.step(items=4):
            time.sleep(0.01)
    s = t.summary()
    assert s["steps"] == 2
    assert s["items_per_sec"] > 0
