"""Attention modules.

``TokenAttention`` is the DiT patch-token attention (linear qkv; reference:
bsi/models/dit.py:26-47). ``Attention2D`` is the UNet pixel attention with
3x3 conv qkv/out projections over NHWC feature maps (reference:
bsi/nn/attention.py:22-50). Both route through
:func:`bsi_tpu.ops.multi_head_attention`, which picks the Pallas fused kernel
on TPU when applicable.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from bsi_tpu.ops import multi_head_attention


def _split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    # [B, S, H*D] -> [B, H, S, D]
    b, s, hd = x.shape
    return x.reshape(b, s, heads, hd // heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    # [B, H, S, D] -> [B, S, H*D]
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


class TokenAttention(nn.Module):
    """Multi-head self-attention over a token sequence ``[B, S, F]``."""

    heads: int
    dropout: float = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        dim = x.shape[-1]
        qkv = nn.Dense(3 * dim, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        rate = 0.0 if deterministic else self.dropout
        rng = self.make_rng("dropout") if rate > 0.0 else None
        out = multi_head_attention(
            _split_heads(q, self.heads),
            _split_heads(k, self.heads),
            _split_heads(v, self.heads),
            dropout_rate=rate,
            dropout_rng=rng,
        )
        return nn.Dense(dim, dtype=self.dtype, name="to_out")(_merge_heads(out))


class Attention2D(nn.Module):
    """Self-attention over all pixels of an NHWC feature map.

    qkv and output projections are 3x3 convolutions, so this is attention
    with a local mixing prelude rather than pure linear projections.
    """

    heads: int = 4
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        qkv = nn.Conv(3 * c, (3, 3), padding="SAME", dtype=self.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv.reshape(b, h * w, 3 * c), 3, axis=-1)
        out = multi_head_attention(
            _split_heads(q, self.heads),
            _split_heads(k, self.heads),
            _split_heads(v, self.heads),
        )
        out = _merge_heads(out).reshape(b, h, w, c)
        return nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype, name="to_out")(out)
