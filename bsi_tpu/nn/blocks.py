"""Residual conv blocks and the no-resampling U-Net skeleton.

TPU-first re-expression of the reference's building blocks
(bsi/nn/residual_block.py, bsi/nn/simplified_unet.py): NHWC layout so 3x3
convolutions hit XLA:TPU's native conv path, explicit ``c`` conditioning
argument instead of the reference's kwargs-filtering Sequential, FiLM
modulation fused into the elementwise stream by XLA.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp

from .attention import Attention2D


def feature_modulation(x: jnp.ndarray, scale: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    """FiLM: ``shift + (scale + 1) * x`` with per-channel scale/shift ``[B, C]``."""
    return shift[:, None, None, :] + (scale[:, None, None, :] + 1.0) * x


class GroupNormSiLU(nn.Module):
    """GroupNorm followed by SiLU through :func:`bsi_tpu.ops.groupnorm_silu`.

    Parameter names ("scale"/"bias") and semantics match ``nn.GroupNorm``
    exactly, so checkpoints and the torch weight-transfer mapping are
    unchanged. The op runs plain XLA math by default — the Pallas fusion
    was measured as a net LOSS at this model's shapes (PERF_NOTES.md) and
    is opt-in via ``BSI_TPU_FUSED_GN=1``.
    """

    num_groups: int = 32
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from bsi_tpu.ops import groupnorm_silu

        c = x.shape[-1]
        # param_dtype f32 like nn.GroupNorm, independent of compute dtype
        gamma = self.param("scale", lambda k, s: jnp.ones(s, jnp.float32), (c,))
        beta = self.param("bias", lambda k, s: jnp.zeros(s, jnp.float32), (c,))
        dt = self.dtype or x.dtype
        b = x.shape[0]
        x3 = x.reshape(b, -1, c).astype(dt)
        out = groupnorm_silu(x3, gamma.astype(dt), beta.astype(dt), self.num_groups)
        return out.reshape(x.shape)


class ResidualBlock(nn.Module):
    """Norm -> act -> conv3x3 -> FiLM(c) -> act -> dropout -> conv3x3 + skip.

    The conditioning vector ``c`` is projected to per-channel (scale, shift).
    A 1x1 conv aligns the skip when channel counts change; an optional
    residual attention tail follows (reference: bsi/nn/residual_block.py:24-64).
    """

    dim_out: int
    actfn: Callable[[jnp.ndarray], jnp.ndarray] = nn.silu
    groups: int = 32
    dropout: float | None = None
    attention: bool = False
    attention_heads: int = 4
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, c: jnp.ndarray, *, deterministic: bool = True
    ) -> jnp.ndarray:
        scale_shift = nn.Dense(2 * self.dim_out, dtype=self.dtype, name="to_scale_shift")(c)
        scale, shift = jnp.split(scale_shift, 2, axis=-1)

        if self.actfn is nn.silu:
            # fused GroupNorm+SiLU (same params under the same module name)
            h = GroupNormSiLU(
                num_groups=self.groups, dtype=self.dtype, name="GroupNorm_0"
            )(x)
        else:
            h = nn.GroupNorm(num_groups=self.groups, dtype=self.dtype)(x)
            h = self.actfn(h)
        h = nn.Conv(self.dim_out, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(h)
        h = feature_modulation(h, scale, shift)
        h = self.actfn(h)
        if self.dropout is not None:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.dim_out, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(h)

        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype, name="skip")(x)
        out = x + h

        if self.attention:
            a = nn.GroupNorm(num_groups=self.groups, dtype=self.dtype)(out)
            out = out + Attention2D(heads=self.attention_heads, dtype=self.dtype)(a)
        return out


class SimplifiedUNet(nn.Module):
    """U-Net without down/upsampling: ``levels`` residual blocks down (each
    pushing a skip), an attention-centered bottleneck, and ``levels`` blocks
    up consuming ``concat([x, skip])`` (reference: bsi/nn/simplified_unet.py).
    """

    dim: int
    levels: int
    c_dim: int
    actfn: Callable[[jnp.ndarray], jnp.ndarray] = nn.silu
    dropout: float | None = None
    downsampling_attention: bool = False
    attention_heads: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, c: jnp.ndarray, *, deterministic: bool = True
    ) -> jnp.ndarray:
        block = lambda name: ResidualBlock(
            dim_out=self.dim,
            actfn=self.actfn,
            dropout=self.dropout,
            attention=self.downsampling_attention,
            attention_heads=self.attention_heads,
            dtype=self.dtype,
            name=name,
        )

        skips = []
        for i in range(self.levels):
            x = block(f"down_{i}")(x, c, deterministic=deterministic)
            skips.append(x)

        x = block("center_in")(x, c, deterministic=deterministic)
        a = nn.GroupNorm(num_groups=32, dtype=self.dtype)(x)
        x = x + Attention2D(heads=self.attention_heads, dtype=self.dtype)(a)
        x = block("center_out")(x, c, deterministic=deterministic)

        for i in range(self.levels):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = block(f"up_{i}")(x, c, deterministic=deterministic)
        return x
