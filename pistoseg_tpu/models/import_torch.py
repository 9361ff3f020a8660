"""Legacy weight importers: torch ``.pth`` (and mxnet ``.params``) →
our flax parameter trees.

The reference initializes ResNet38d from ImageNet weights in mxnet
``.params`` or converted torch ``.pth`` format
(``models/resnet38d.py:215-263``, ``revise_pseudo_labels.py:179-185``).
This module maps a torch state_dict for that architecture onto the flax
:class:`pistoseg_tpu.models.resnet38d.ResNet38d` tree:

* ``convNa.weight`` (O, I, kH, kW) → ``convNa/kernel`` (kH, kW, I, O)
* ``bX_Y.conv_branchZ.weight`` → ``bX_Y/conv_branchZ/kernel``
* ``bX_Y.bn_branchZ.{weight,bias,running_mean,running_var}`` →
  ``bX_Y/bn_branchZ/bn/{scale,bias}`` + batch_stats ``{mean,var}``

mxnet import is gated: if mxnet is importable we reuse the same naming
translation the reference documents; otherwise a clear error points at
converting with torch first.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    # torch OIHW → flax HWIO
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def torch_state_dict_to_resnet38d(
    state_dict: Dict[str, Any]
) -> Tuple[Dict, Dict]:
    """Return (params, batch_stats) flax trees for ``ResNet38d``.

    Unknown keys (classifier heads etc.) are skipped; the caller merges
    head params from its own initialization.
    """
    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    for key, value in state_dict.items():
        v = np.asarray(value, dtype=np.float32)
        parts = key.split(".")
        if parts[0] == "conv1a" and parts[-1] == "weight":
            put(params, ("conv1a", "kernel"), _conv_kernel(v))
        elif parts[0] == "bn7":
            leaf = parts[-1]
            if leaf == "weight":
                put(params, ("bn7", "bn", "scale"), v)
            elif leaf == "bias":
                put(params, ("bn7", "bn", "bias"), v)
            elif leaf == "running_mean":
                put(stats, ("bn7", "bn", "mean"), v)
            elif leaf == "running_var":
                put(stats, ("bn7", "bn", "var"), v)
        elif parts[0].startswith("b") and len(parts) >= 3:
            block, layer, leaf = parts[0], parts[1], parts[-1]
            if layer.startswith("conv") and leaf == "weight":
                put(params, (block, layer, "kernel"), _conv_kernel(v))
            elif layer.startswith("bn"):
                if leaf == "weight":
                    put(params, (block, layer, "bn", "scale"), v)
                elif leaf == "bias":
                    put(params, (block, layer, "bn", "bias"), v)
                elif leaf == "running_mean":
                    put(stats, (block, layer, "bn", "mean"), v)
                elif leaf == "running_var":
                    put(stats, (block, layer, "bn", "var"), v)
        # else: head weights (fc8 etc.) — caller's responsibility
    return params, stats


def load_torch_pth(path: str) -> Dict[str, Any]:
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k.replace("module.", ""): v.numpy() for k, v in sd.items()}


def load_mxnet_params(path: str) -> Dict[str, Any]:
    """mxnet ``.params`` → torch-style key dict (reference naming,
    ``resnet38d.py:215-263``).  Gated on mxnet availability."""
    try:
        import mxnet  # noqa: F401
    except ImportError as e:  # pragma: no cover - env without mxnet
        raise ImportError(
            "mxnet is not installed in this image; convert the .params file "
            "to .pth with the reference converter on a torch+mxnet host, "
            "then use load_torch_pth()."
        ) from e
    save_dict = mxnet.nd.load(path)
    bn_map = {"beta": "bias", "gamma": "weight", "mean": "running_mean", "var": "running_var"}
    out = {}
    for k, v in save_dict.items():
        arr = v.asnumpy()
        toks = k.split("_")
        if "conv1a" in toks[0]:
            out["conv1a.weight"] = arr
        elif "linear1000" in toks[0]:
            continue
        elif len(toks) > 1 and "branch" in toks[1]:
            if toks[0][-1] != "a":
                prefix = "b" + toks[0][-3] + "_" + toks[0][-1]
            else:
                prefix = "b" + toks[0][-2]
            if "res" in toks[0]:
                out[f"{prefix}.conv_{toks[1]}.weight"] = arr
            else:
                out[f"{prefix}.bn_{toks[1]}.{bn_map[toks[-1]]}"] = arr
        else:
            out[f"bn7.{bn_map[toks[-1]]}"] = arr
    return out


def import_resnet38d(path: str) -> Tuple[Dict, Dict]:
    """One-shot import from ``.pth`` or ``.params`` → (params, batch_stats)."""
    if path.endswith(".params"):
        sd = load_mxnet_params(path)
    else:
        sd = load_torch_pth(path)
    return torch_state_dict_to_resnet38d(sd)
