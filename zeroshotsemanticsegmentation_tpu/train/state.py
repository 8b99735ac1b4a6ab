"""Train state: a pure pytree carried through the jitted step."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray  # iteration counter (reference 'iteration')

    @classmethod
    def create(cls, params, tx) -> "TrainState":
        return cls(params=params, opt_state=tx.init(params),
                   step=jnp.zeros((), jnp.int32))
