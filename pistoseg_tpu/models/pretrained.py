"""Overlay imported pretrained weights onto freshly-initialized flax trees.

The reference initializes backbones from ImageNet weights while heads stay
fresh (``/root/reference/models/mosaic_module.py:79-86`` via smp defaults;
``revise_pseudo_labels.py:179-185``; ``OEEM/classification/train.py:92-96``
with ``strict=False``).  :func:`overlay_subtree` is the flax equivalent:
replace the leaves of one named subtree (``encoder`` / ``backbone`` /
``trunk``) with imported values under shape-exact assertions, leaving every
other leaf (heads, decoder) at its random init.

Stage CLIs expose this as ``--pretrained=<path.pth>``.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
from flax.core import unfreeze


def _flatten(tree: Dict, prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], Any]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def overlay_subtree(
    tree: Dict,
    subtree_name: str,
    imported: Dict,
    *,
    what: str = "params",
    strict_cover: bool = False,
) -> Dict:
    """Return a copy of ``tree`` with ``tree[subtree_name]`` leaves replaced
    by matching leaves of ``imported``.

    * every imported leaf must exist in the target subtree with the exact
      same shape (layout drift fails loudly);
    * with ``strict_cover=True``, every target leaf must also be covered by
      an import (full-backbone loads, e.g. ResNet38d into stage 0/4).
    """
    tree = unfreeze(tree)
    if subtree_name not in tree:
        raise KeyError(
            f"no subtree '{subtree_name}' in {what} "
            f"(have: {sorted(tree.keys())})"
        )
    target = tree[subtree_name]
    flat_target = _flatten(target)
    flat_import = _flatten(unfreeze(imported))

    missing = [k for k in flat_import if k not in flat_target]
    if missing:
        raise ValueError(
            f"{what}/{subtree_name}: imported leaves not in model: "
            f"{['/'.join(m) for m in sorted(missing)[:8]]}"
        )
    for k, v in flat_import.items():
        tgt = flat_target[k]
        if tuple(np.shape(v)) != tuple(np.shape(tgt)):
            raise ValueError(
                f"{what}/{subtree_name}/{'/'.join(k)}: shape mismatch "
                f"{np.shape(v)} (imported) vs {np.shape(tgt)} (model)"
            )
    if strict_cover:
        uncovered = [k for k in flat_target if k not in flat_import]
        if uncovered:
            raise ValueError(
                f"{what}/{subtree_name}: model leaves not covered by import: "
                f"{['/'.join(m) for m in sorted(uncovered)[:8]]}"
            )

    def merge(node: Dict, imp: Dict) -> None:
        for k, v in imp.items():
            if isinstance(v, dict):
                merge(node[k], v)
            else:
                node[k] = np.asarray(v, dtype=np.float32)

    merge(target, unfreeze(imported))
    return tree


def load_resnet38d_into(
    params: Dict, batch_stats: Dict, path: str, subtree: str
) -> Tuple[Dict, Dict]:
    """ResNet38d ImageNet weights (.pth / .params) → backbone subtree.

    Matches ``revise_pseudo_labels.py:179-185`` (stage 4 backbone) and
    ``OEEM/classification/train.py:92-96`` (stage 0 trunk).
    """
    from pistoseg_tpu.models.import_torch import import_resnet38d

    p, s = import_resnet38d(path)
    params = overlay_subtree(params, subtree, p, what="params")
    batch_stats = overlay_subtree(batch_stats, subtree, s, what="batch_stats")
    return params, batch_stats


def load_efficientnet_into(
    params: Dict, batch_stats: Dict, path: str, encoder_name: str,
    subtree: str = "encoder",
) -> Tuple[Dict, Dict]:
    """EfficientNet ImageNet weights (.pth) → encoder subtree (stages 2/5)."""
    from pistoseg_tpu.models.import_efficientnet import import_efficientnet

    p, s = import_efficientnet(path, encoder_name)
    params = overlay_subtree(params, subtree, p, what="params",
                             strict_cover=True)
    batch_stats = overlay_subtree(batch_stats, subtree, s, what="batch_stats",
                                  strict_cover=True)
    return params, batch_stats
