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
    maps label → lr multiplier.  Implemented with ``optax.multi_transform``
    so group membership is static (no runtime branching under jit).
    """
    transforms = {
        label: optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(
                learning_rate=_poly_schedule(lr * mult, max_step, power),
                momentum=momentum,
            ),
        )
        for label, mult in multipliers.items()
    }

    def labeler(params):
        def label_leaf(path, _):
            path_str = "/".join(str(getattr(k, "key", k)) for k in path)
            return group_fn(path_str, path)

        return jax.tree_util.tree_map_with_path(label_leaf, params)

    return optax.multi_transform(transforms, labeler)


def rfm_group_fn(path: str, _=None) -> str:
    """Stage-4 grouping: scratch layers (fc8, f8_3, f8_4, f9_1, f9_2) vs
    pretrained backbone; weights vs biases/scales.

    Reference ``revise_net.py:98-117``: groups over Conv/GroupNorm params
    only — BatchNorm params are frozen there; here BN scale/bias fall in
    the bias groups (they get the bias multiplier; reference parity is
    preserved because frozen-BN layers receive no gradient anyway when
    marked non-trainable).
    """
    scratch = any(s in path for s in ("fc8", "f8_3", "f8_4", "f9_1", "f9_2"))
    is_weight = path.endswith("kernel")
    if scratch:
        return "scratch_w" if is_weight else "scratch_b"
    return "pre_w" if is_weight else "pre_b"


RFM_MULTIPLIERS = {"pre_w": 1.0, "pre_b": 2.0, "scratch_w": 10.0, "scratch_b": 20.0}
