"""Optimizers via optax.

* :func:`adamw_exponential` — AdamW(wd=0.05) + per-epoch ExponentialLR(γ)
  as used by stages 2/5 (``mosaic_module.py:92-96``: lr decayed by 0.9
  each epoch).
* :func:`poly_sgd` / :func:`poly_sgd_grouped` — the reference's
  ``PolyOptimizer`` (``utils.py:166-187``): SGD with momentum 0.9 and
  per-step lr ×(1−step/max_step)^power; the grouped variant applies the
  stage-4 per-group multipliers 1×/2×/10×/20× (pretrained weights,
  pretrained biases, scratch weights, scratch biases —
  ``revise_pseudo_labels.py:171-177``).

Parity note: torch SGD couples weight decay into the gradient
(g ← g + wd·θ) *before* the momentum buffer — optax's
``optax.sgd`` + ``add_decayed_weights`` ordering is chosen to match.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import optax


def adamw_exponential(
    lr: float,
    weight_decay: float = 0.05,
    gamma: float = 0.9,
    steps_per_epoch: int = 1,
) -> optax.GradientTransformation:
    """AdamW with lr decayed by ``gamma`` at each epoch boundary."""

    def schedule(step):
        epoch = step // steps_per_epoch
        return lr * (gamma ** epoch)

    return optax.adamw(learning_rate=schedule, weight_decay=weight_decay)


def _poly_schedule(lr: float, max_step: int, power: float) -> Callable:
    def schedule(step):
        frac = jax.numpy.clip(step / max_step, 0.0, 1.0)
        return lr * (1.0 - frac) ** power

    return schedule


def poly_sgd(
    lr: float,
    max_step: int,
    power: float = 0.9,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
) -> optax.GradientTransformation:
    """PolyOptimizer: SGD(momentum) with poly lr decay per step.

    torch-style coupled weight decay: g += wd·θ before momentum.
    """
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(
            learning_rate=_poly_schedule(lr, max_step, power), momentum=momentum
        ),
    )


def poly_sgd_grouped(
    lr: float,
    max_step: int,
    group_fn: Callable[[str, tuple], str],
    multipliers: Dict[str, float],
    power: float = 0.9,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
) -> optax.GradientTransformation:
    """Per-parameter-group lr multipliers on top of :func:`poly_sgd`.

    ``group_fn(path_str, leaf_path)`` labels each param; ``multipliers``
    maps label → lr multiplier.  A multiplier of ``0.0`` freezes the group
    entirely (``optax.set_to_zero`` — no update, no weight decay), which is
    how torch's ``requires_grad=False`` params behave (the reference
    optimizer skips them, ``revise_net.py:98-117``).  Implemented with
    ``optax.multi_transform`` so group membership is static (no runtime
    branching under jit).
    """
    transforms = {
        label: (
            optax.set_to_zero()
            if mult == 0.0
            else optax.chain(
                optax.add_decayed_weights(weight_decay),
                optax.sgd(
                    learning_rate=_poly_schedule(lr * mult, max_step, power),
                    momentum=momentum,
                ),
            )
        )
        for label, mult in multipliers.items()
    }

    logged = [False]

    def labeler(params):
        def label_leaf(path, _):
            path_str = "/".join(str(getattr(k, "key", k)) for k in path)
            return group_fn(path_str, path)

        labels = jax.tree_util.tree_map_with_path(label_leaf, params)
        if not logged[0]:
            # surface the resolved groups once so an accidental freeze (e.g.
            # a future non-BN module matching the 'bn*' name heuristic) is
            # visible instead of silent (ADVICE r2)
            logged[0] = True
            counts: Dict[str, int] = {}
            for lbl in jax.tree_util.tree_leaves(labels):
                counts[lbl] = counts.get(lbl, 0) + 1
            print(f"[optim] param groups: {counts}")
        return labels

    return optax.multi_transform(transforms, labeler)


def _is_bn_path(parts) -> bool:
    # FrozenBN nests an nn.BatchNorm named 'bn'; loose BatchNorm modules
    # appear as 'bn*' / 'BatchNorm*' / '*_bn' path components.
    return any(
        p == "bn" or p.startswith("bn") or p.startswith("BatchNorm") or p.endswith("_bn")
        for p in parts
    )


def rfm_group_fn(path: str, _=None) -> str:
    """Stage-4 grouping: scratch layers (fc8, f8_3, f8_4, f9_1, f9_2) vs
    pretrained backbone; weights vs biases/scales; frozen set matching the
    reference exactly.

    Reference semantics: ``revise_net.py:26-27`` freezes conv1a + all of
    b2/b2_1/b2_2, and the ``train()`` override (``resnet38d.py:191-213``)
    freezes every BatchNorm weight/bias; the optimizer then groups only the
    remaining Conv params 1×/2×/10×/20× (``revise_net.py:98-117``).
    """
    parts = path.split("/")
    if _is_bn_path(parts):
        return "frozen"
    if parts[0] == "backbone" and parts[1] in ("conv1a", "b2", "b2_1", "b2_2"):
        return "frozen"
    scratch = any(s in path for s in ("fc8", "f8_3", "f8_4", "f9_1", "f9_2"))
    is_weight = path.endswith("kernel")
    if scratch:
        return "scratch_w" if is_weight else "scratch_b"
    return "pre_w" if is_weight else "pre_b"


RFM_MULTIPLIERS = {
    "pre_w": 1.0, "pre_b": 2.0, "scratch_w": 10.0, "scratch_b": 20.0,
    "frozen": 0.0,
}


def wideresnet_group_fn(path: str, _=None) -> str:
    """Stage-0 grouping: the OEEM classifier passes ALL params to one
    PolyOptimizer group (``OEEM/classification/train.py:101``), but
    ``wideResNet.train()`` (``wide_resnet.py:133,192-208``) has marked
    conv1a and every BatchNorm non-trainable — torch skips grad-less params,
    so they are effectively frozen."""
    parts = path.split("/")
    if _is_bn_path(parts):
        return "frozen"
    if parts[0] == "trunk" and parts[1] == "conv1a":
        return "frozen"
    return "train"


WIDERESNET_MULTIPLIERS = {"train": 1.0, "frozen": 0.0}
