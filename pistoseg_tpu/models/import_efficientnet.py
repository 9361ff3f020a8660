"""EfficientNet pretrained-weight importer: torch → flax encoder trees.

The reference's stage-2/5 models are ImageNet-pretrained: ``smp.create_model``
defaults to ``encoder_weights='imagenet'`` (``/root/reference/models/
mosaic_module.py:79-86``), and its ``efficientnet-bX`` encoders are
``efficientnet_pytorch`` (lukemelas) modules whose state_dicts use the
layout::

    _conv_stem.weight                     (stem, 3, 3, 3)         OIHW
    _bn0.{weight,bias,running_mean,running_var}
    _blocks.{j}._expand_conv.weight       (absent when expand_ratio == 1)
    _blocks.{j}._bn0.*
    _blocks.{j}._depthwise_conv.weight    (C_exp, 1, k, k)
    _blocks.{j}._bn1.*
    _blocks.{j}._se_reduce.{weight,bias}
    _blocks.{j}._se_expand.{weight,bias}
    _blocks.{j}._project_conv.weight
    _blocks.{j}._bn2.*
    _conv_head.weight / _bn1.* / _fc.*    (classifier top — unused by the
                                           smp encoder pyramid; skipped)

This module maps that layout onto
:class:`pistoseg_tpu.models.efficientnet.EfficientNetEncoder` (NHWC flax):
OIHW→HWIO kernel transpose, BN weight/bias → scale/bias params and
running_mean/var → batch_stats, flat ``_blocks.{j}`` index → the encoder's
``stage{i}_block{r}`` naming via the compound-scaling repeat counts.

:func:`expected_state_dict_shapes` documents the full expected key→shape
contract per model and doubles as the synthesizer for round-trip tests
(timm / efficientnet_pytorch are not installed in this image; fixtures are
recorded key-compatible instead — VERDICT.md round-1 item 1).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Dict, List, Tuple

import numpy as np

from pistoseg_tpu.models.efficientnet import (
    _BASE_STAGES,
    _SCALING,
    _TAP_AFTER_STAGE,  # noqa: F401  (re-exported for docs/tests)
    round_filters,
    round_repeats,
)


def _block_plan(model_name: str) -> List[Dict[str, int]]:
    """Flat block list (lukemelas ``_blocks`` order) with per-block dims
    and the flax module name each block maps to."""
    w, d, _ = _SCALING[model_name]
    plan: List[Dict[str, int]] = []
    in_ch = round_filters(32, w)
    for stage_i, (expand, kernel, stride, base_c, base_r) in enumerate(_BASE_STAGES):
        out_ch = round_filters(base_c, w)
        for r in range(round_repeats(base_r, d)):
            plan.append(
                dict(
                    name=f"stage{stage_i}_block{r}",
                    in_ch=in_ch,
                    out_ch=out_ch,
                    expand=expand,
                    kernel=kernel,
                )
            )
            in_ch = out_ch
    return plan


def expected_state_dict_shapes(model_name: str) -> "OrderedDict[str, Tuple[int, ...]]":
    """Expected torch state_dict (key → shape) for the encoder portion
    (stem + blocks) of an ``efficientnet_pytorch`` EfficientNet."""
    w, _, _ = _SCALING[model_name]
    stem = round_filters(32, w)
    shapes: "OrderedDict[str, Tuple[int, ...]]" = OrderedDict()
    shapes["_conv_stem.weight"] = (stem, 3, 3, 3)
    for leaf in ("weight", "bias", "running_mean", "running_var"):
        shapes[f"_bn0.{leaf}"] = (stem,)
    for j, b in enumerate(_block_plan(model_name)):
        p = f"_blocks.{j}"
        c_exp = b["in_ch"] * b["expand"]
        se = max(1, int(b["in_ch"] * 0.25))
        if b["expand"] != 1:
            shapes[f"{p}._expand_conv.weight"] = (c_exp, b["in_ch"], 1, 1)
            for leaf in ("weight", "bias", "running_mean", "running_var"):
                shapes[f"{p}._bn0.{leaf}"] = (c_exp,)
        shapes[f"{p}._depthwise_conv.weight"] = (c_exp, 1, b["kernel"], b["kernel"])
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            shapes[f"{p}._bn1.{leaf}"] = (c_exp,)
        shapes[f"{p}._se_reduce.weight"] = (se, c_exp, 1, 1)
        shapes[f"{p}._se_reduce.bias"] = (se,)
        shapes[f"{p}._se_expand.weight"] = (c_exp, se, 1, 1)
        shapes[f"{p}._se_expand.bias"] = (c_exp,)
        shapes[f"{p}._project_conv.weight"] = (b["out_ch"], c_exp, 1, 1)
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            shapes[f"{p}._bn2.{leaf}"] = (b["out_ch"],)
    return shapes


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    # torch OIHW → flax HWIO (also correct for depthwise: (C,1,k,k)→(k,k,1,C))
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _put(tree: Dict, path: Tuple[str, ...], leaf: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = leaf


# torch BN leaf → (tree kind, flax leaf name)
_BN_LEAVES = {
    "weight": ("params", "scale"),
    "bias": ("params", "bias"),
    "running_mean": ("stats", "mean"),
    "running_var": ("stats", "var"),
}

# block-local torch module → flax module path inside stage{i}_block{r}
_BLOCK_CONV = {
    "_expand_conv": ("expand_conv",),
    "_depthwise_conv": ("dwconv",),
    "_project_conv": ("project_conv",),
    "_se_reduce": ("se", "reduce"),
    "_se_expand": ("se", "expand"),
}
_BLOCK_BN = {"_bn0": "bn0", "_bn1": "bn1", "_bn2": "bn2"}

# classifier-top keys the smp encoder pyramid never touches
_SKIP_PREFIXES = ("_conv_head", "_fc", "_bn1.", "_avg_pooling", "_dropout")


def torch_state_dict_to_efficientnet(
    state_dict: Dict[str, Any], model_name: str
) -> Tuple[Dict, Dict]:
    """Return ``(params, batch_stats)`` flax trees for
    :class:`EfficientNetEncoder`.

    Every encoder key must be present and shape-correct; classifier-top
    keys (``_conv_head``/top-level ``_bn1``/``_fc``) and
    ``num_batches_tracked`` counters are skipped.  Raises ``ValueError``
    on unknown or missing keys so silent drift is impossible.
    """
    blocks = _block_plan(model_name)
    params: Dict = {}
    stats: Dict = {}
    consumed = set()

    def take(key: str) -> np.ndarray:
        if key not in state_dict:
            raise ValueError(f"{model_name}: missing state_dict key '{key}'")
        consumed.add(key)
        return np.asarray(state_dict[key], dtype=np.float32)

    def take_bn(prefix: str, flax_path: Tuple[str, ...]) -> None:
        for leaf, (kind, name) in _BN_LEAVES.items():
            v = take(f"{prefix}.{leaf}")
            _put(params if kind == "params" else stats, flax_path + (name,), v)

    _put(params, ("stem_conv", "kernel"), _conv_kernel(take("_conv_stem.weight")))
    take_bn("_bn0", ("stem_bn",))

    for j, b in enumerate(blocks):
        t = f"_blocks.{j}"
        f = b["name"]
        for tname, fpath in _BLOCK_CONV.items():
            if tname == "_expand_conv" and b["expand"] == 1:
                continue
            _put(params, (f,) + fpath + ("kernel",),
                 _conv_kernel(take(f"{t}.{tname}.weight")))
            if tname in ("_se_reduce", "_se_expand"):
                _put(params, (f,) + fpath + ("bias",), take(f"{t}.{tname}.bias"))
        for tname, fname in _BLOCK_BN.items():
            if tname == "_bn0" and b["expand"] == 1:
                continue
            take_bn(f"{t}.{tname}", (f, fname))

    # verify nothing meaningful was left behind
    leftovers = []
    for key in state_dict:
        if key in consumed or key.endswith("num_batches_tracked"):
            continue
        if any(key.startswith(s) for s in _SKIP_PREFIXES):
            continue
        leftovers.append(key)
    if leftovers:
        raise ValueError(
            f"{model_name}: unrecognized state_dict keys (layout drift?): "
            f"{sorted(leftovers)[:8]}{'...' if len(leftovers) > 8 else ''}"
        )
    return params, stats


def strip_prefixes(state_dict: Dict[str, Any], prefixes=("module.", "model.", "encoder.")) -> Dict[str, Any]:
    """Strip wrapper prefixes (DataParallel / Lightning / smp nesting)."""
    out = {}
    for k, v in state_dict.items():
        for p in prefixes:
            while k.startswith(p):
                k = k[len(p):]
        out[k] = v
    return out


def import_efficientnet(path: str, model_name: str) -> Tuple[Dict, Dict]:
    """Load a torch ``.pth`` and map it onto the flax encoder trees."""
    import torch

    # plain ImageNet state_dicts never need code execution from the pickle;
    # fall back to full unpickling only with an explicit warning (ADVICE r2)
    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:  # pragma: no cover - legacy pickles only
        print(f"[import_efficientnet] weights_only load failed ({e}); "
              f"retrying with full unpickling — only do this for trusted files")
        sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = strip_prefixes({k: v.numpy() if hasattr(v, "numpy") else v
                         for k, v in sd.items()})
    return torch_state_dict_to_efficientnet(sd, model_name)
