"""Functional training state (params / batch_stats / opt_state / step) —
replaces the Lightning module state + torch optimizer state of the reference
(supervised_eventID.py / create_trainer.py) with an explicit pytree."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array  # i32 scalar

    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def create_train_state(model, optimizer, rng, example_input, plans=None) -> TrainState:
    # jit the init: eager per-op dispatch at full model scale is minutes-slow
    if plans is not None:
        variables = jax.jit(model.init, static_argnums=(2,))(
            rng, example_input, True, plans
        )
    else:
        variables = jax.jit(model.init, static_argnums=(2,))(
            rng, example_input, True
        )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = optimizer.init(params)
    return TrainState(params, batch_stats, opt_state, jnp.zeros((), jnp.int32))


def param_count(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
