"""Plain MLP block (reference: bsi/nn/mlp.py)."""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp


class MLP(nn.Module):
    """Dense stack: in -> hidden_features... -> out with activations between.

    ``hidden_features`` may be an int (with ``hidden_layers`` copies) or an
    explicit list of widths. Zero hidden layers gives a single Dense.
    """

    out_features: int
    hidden_features: Sequence[int] | int
    hidden_layers: int | None = None
    actfn: Callable[[jnp.ndarray], jnp.ndarray] = lambda x: x
    dtype: jnp.dtype | None = None

    def widths(self) -> list[int]:
        hf = self.hidden_features
        if isinstance(hf, int):
            if self.hidden_layers is None:
                raise ValueError("hidden_layers required when hidden_features is an int")
            return [hf] * self.hidden_layers
        hf = list(hf)
        if self.hidden_layers is not None and len(hf) != self.hidden_layers:
            raise ValueError("len(hidden_features) must equal hidden_layers")
        return hf

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for width in self.widths():
            x = nn.Dense(width, dtype=self.dtype)(x)
            x = self.actfn(x)
        return nn.Dense(self.out_features, dtype=self.dtype)(x)
