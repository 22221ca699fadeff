"""Minimal train state (params + immutable stats + optimizer state)."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    stats: Any  # frozen collections (BN running stats, dp_mean)
    opt_state: Any
    step: jax.Array

    @property
    def variables(self):
        return {"params": self.params, "stats": self.stats}


def create_train_state(variables, tx: optax.GradientTransformation) -> TrainState:
    import jax.numpy as jnp

    params = variables["params"]
    return TrainState(
        params=params,
        stats=variables.get("stats", {}),
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )
