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
    device: Optional[jax.Device] = None,
) -> TrainState:
    """Initialize variables and wrap into TrainState.

    Initialization always runs jitted on the CPU backend, then the tree is
    transferred to ``device`` (default: the first accelerator).  Rationale:
    eager flax init dispatches thousands of tiny ops; through the tunneled
    TPU backend here that takes tens of minutes, while a single CPU-jitted
    init + one bulk transfer takes seconds.  ``device_put`` gets an
    explicit target because it is a no-op for committed arrays otherwise.
    """
    args = sample_input if isinstance(sample_input, tuple) else (sample_input,)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = jax.jit(
            lambda r, *a: model.init(r, *a, **(init_kwargs or {})), backend="cpu"
        )(rng, *args)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    state = TrainState(
        step=jax.numpy.zeros((), jax.numpy.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
    )
    target = device if device is not None else jax.devices()[0]
    return jax.device_put(state, target)
