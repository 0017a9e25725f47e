"""Exponential moving average of parameters.

The reference vendors lucidrains/ema-pytorch with `_foreach` batched updates
and python-int step counters to avoid CPU-GPU syncs
(bsi/tasks/ema_pytorch.py). In JAX the whole update is one fused tree lerp
inside the jitted train step — there is no sync point to avoid and no wrapper
module to manage; the EMA parameters are just another leaf of the train
state.

Semantics preserved exactly (bsi/tasks/ema_pytorch.py:308-341):
- step counter increments per update call (one per train batch),
- before ``update_after_step`` the EMA is a copy of the online params,
- afterwards the decay follows the inverse-power warmup
  ``1 - (1 + epoch / inv_gamma) ** -power`` capped at ``beta``
  with ``epoch = step - update_after_step - 1``,
- updates only apply on steps divisible by ``update_every``,
- optional "switch EMA": copy the EMA back into the online params every
  ``update_model_with_ema_every`` steps.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EMAConfig:
    beta: float = 0.9999
    inv_gamma: float = 1.0
    power: float = 2.0 / 3.0
    min_value: float = 0.0
    update_after_step: int = 1000
    update_every: int = 1
    update_model_with_ema_every: Optional[int] = None


def ema_decay(cfg: EMAConfig, step: jnp.ndarray) -> jnp.ndarray:
    """Current decay for the (0-based) update counter ``step``."""
    epoch = step.astype(jnp.float32) - cfg.update_after_step - 1
    value = 1.0 - (1.0 + epoch / cfg.inv_gamma) ** -cfg.power
    value = jnp.clip(value, cfg.min_value, cfg.beta)
    return jnp.where(epoch <= 0, 0.0, value)


def ema_update(cfg: EMAConfig, step: jnp.ndarray, ema_params: Any, params: Any) -> Any:
    """One EMA update; pure tree math, fused by XLA into the train step.

    ``step`` is the number of previous updates (0 on the first batch).
    A decay of 0 degenerates to a copy, which covers both the init-copy and
    the pre-``update_after_step`` phases.
    """
    decay = ema_decay(cfg, step)
    # No update on off-cycle steps: keep the old EMA (decay -> 1)
    if cfg.update_every > 1:
        on_cycle = (step % cfg.update_every) == 0
        decay = jnp.where(on_cycle, decay, 1.0)
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p.astype(e.dtype), ema_params, params)


def maybe_switch_ema(cfg: EMAConfig, step: jnp.ndarray, ema_params: Any, params: Any) -> Any:
    """Switch-EMA: replace the online params with the EMA on the configured cadence."""
    if cfg.update_model_with_ema_every is None:
        return params
    do_switch = (step % cfg.update_model_with_ema_every) == 0
    return jax.tree.map(
        lambda p, e: jnp.where(do_switch, e.astype(p.dtype), p), params, ema_params
    )
