"""Train state: one pytree carrying everything the jitted step mutates.

Replaces the reference's Lightning module state (module params + separate
EMA module + optimizer + torch.Generator objects, bsi/tasks/bsi.py:84-153)
with a single immutable pytree: donate it to the jitted step and XLA updates
it in place.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray  # int32 scalar
    params: Any
    ema_params: Any
    opt_state: Any
    rng: jax.Array  # base PRNG key; per-step keys are folded from it

    @classmethod
    def create(cls, *, params, opt_state, rng, ema_params=None) -> "TrainState":
        if ema_params is None:
            # Real copies: aliasing params would make the donated state hold
            # the same buffer twice
            ema_params = jax.tree.map(jnp.copy, params)
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            ema_params=ema_params,
            opt_state=opt_state,
            rng=rng,
        )
