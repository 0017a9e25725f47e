"""MLP denoiser for toy / low-dimensional data (reference: bsi/models/mlp.py)."""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from bsi_tpu.nn import MLP, FourierFeatures, NyquistPositionalEmbedding

from .utils import actfn_from_str


class DenoisingMLP(nn.Module):
    """Flattens the data, concatenates the t-embedding (and optional Fourier
    features of the flattened data), and runs an MLP back to the data shape."""

    data_shape: tuple[int, ...]
    pos_emb: NyquistPositionalEmbedding
    hidden_width: int = 256
    layers: int = 2
    actfn: str = "silu"
    zero_init: bool = False
    fourier_features: FourierFeatures | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self, mu: jnp.ndarray, t: jnp.ndarray, *, deterministic: bool = True
    ) -> jnp.ndarray:
        n_dim = math.prod(self.data_shape)
        flat = mu.reshape(mu.shape[0], -1)
        parts = [flat, self.pos_emb(t)]
        if self.fourier_features is not None:
            parts.append(self.fourier_features(flat))
        x = jnp.concatenate(parts, axis=-1)

        act = actfn_from_str(self.actfn)
        x = MLP(
            out_features=self.hidden_width,
            hidden_features=[self.hidden_width] * (self.layers - 1),
            actfn=act,
            dtype=self.dtype,
            name="trunk",
        )(x)
        x = act(x)
        final_init = nn.initializers.zeros if self.zero_init else None
        kwargs = {}
        if final_init is not None:
            kwargs = {"kernel_init": final_init, "bias_init": nn.initializers.zeros}
        out = nn.Dense(n_dim, dtype=self.dtype, name="head", **kwargs)(x)
        return out.reshape(mu.shape[0], *self.data_shape)
