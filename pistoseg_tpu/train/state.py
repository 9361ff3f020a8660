"""Train state: params + batch_stats + optimizer state in one pytree."""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
from flax import struct
from flax.core import FrozenDict
import optax


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
        )


def create_train_state(
    model: nn.Module,
    rng: jax.Array,
    sample_input,
    tx: optax.GradientTransformation,
    init_kwargs: Optional[dict] = None,
) -> TrainState:
    """Initialize variables (host/device agnostic) and wrap into TrainState.

    ``sample_input`` may be a single array or a tuple of positional args.
    """
    args = sample_input if isinstance(sample_input, tuple) else (sample_input,)
    variables = model.init(rng, *args, **(init_kwargs or {}))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        step=jax.numpy.zeros((), jax.numpy.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
    )
