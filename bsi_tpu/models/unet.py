"""VDM-style U-Net denoiser (no down/upsampling).

Reference: bsi/models/vdm_unet.py:20-100. NHWC layout; the t-conditioning is
a Nyquist embedding passed through a 2-layer MLP, broadcast into every
residual block as FiLM scale/shift.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from bsi_tpu.nn import FourierFeatures, NyquistPositionalEmbedding, SimplifiedUNet

from .utils import actfn_from_str


class DenoisingVDMUNet(nn.Module):
    """U-Net as in the VDM paper, without resampling.

    Args:
        data_shape: (H, W, C) image shape.
        pos_emb: Nyquist embedding for the timestep.
        actfn: Activation name (silu/gelu/relu/softplus/tanh).
        dim: Feature width of every block.
        levels: Number of down (= up) residual blocks.
        pos_emb_mult: Conditioning width = pos_emb.size * pos_emb_mult.
    """

    data_shape: tuple[int, int, int]
    pos_emb: NyquistPositionalEmbedding
    actfn: str = "silu"
    dim: int = 128
    levels: int = 32
    pos_emb_mult: int = 4
    n_attention_heads: int = 1
    dropout: float | None = None
    downsampling_attention: bool = False
    fourier_features: FourierFeatures | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self, mu: jnp.ndarray, t: jnp.ndarray, *, deterministic: bool = True
    ) -> jnp.ndarray:
        if len(self.data_shape) != 3:
            raise ValueError("DenoisingVDMUNet only supports 2D image data (H, W, C)")
        act = actfn_from_str(self.actfn)

        x = mu
        if self.fourier_features is not None:
            x = jnp.concatenate([x, self.fourier_features(mu)], axis=-1)

        # Timestep conditioning: Nyquist embedding -> 2-layer MLP
        c_dim = self.pos_emb.size * self.pos_emb_mult
        c = self.pos_emb(t)
        c = act(nn.Dense(c_dim, dtype=self.dtype, name="pos_map_1")(c))
        c = act(nn.Dense(c_dim, dtype=self.dtype, name="pos_map_2")(c))

        h = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype, name="encode")(x)
        h = SimplifiedUNet(
            dim=self.dim,
            levels=self.levels,
            c_dim=c_dim,
            actfn=act,
            dropout=self.dropout,
            downsampling_attention=self.downsampling_attention,
            attention_heads=self.n_attention_heads,
            dtype=self.dtype,
            name="unet",
        )(h, c, deterministic=deterministic)
        return nn.Conv(self.data_shape[-1], (1, 1), dtype=self.dtype, name="decode")(h)
