"""Small helpers shared by the denoiser models."""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp

_ACTFNS: dict[str, Callable[[jnp.ndarray], jnp.ndarray]] = {
    "silu": nn.silu,
    "gelu": nn.gelu,
    "relu": nn.relu,
    "softplus": nn.softplus,
    "tanh": jnp.tanh,
}


def actfn_from_str(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Look up an activation function by name (reference: bsi/models/utils.py:4-12)."""
    try:
        return _ACTFNS[name]
    except KeyError:
        raise ValueError(f"Unknown activation {name!r}; options: {sorted(_ACTFNS)}")
