"""Attention modules.

``TokenAttention`` is the DiT patch-token attention (linear qkv; reference:
bsi/models/dit.py:26-47). ``Attention2D`` is the UNet pixel attention with
3x3 conv qkv/out projections over NHWC feature maps (reference:
bsi/nn/attention.py:22-50). Both pack the qkv projection's output axis in
the GROUPED layout (see :func:`repack_qkv_grouped`), which feeds the
zero-copy fused Pallas kernels on TPU and keeps tensor-parallel column
shardings head-aligned.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from bsi_tpu.ops import (
    multi_head_attention,
    multi_head_attention_fused_qkv,
    split_qkv_grouped,
)
from bsi_tpu.ops.flash_attention_packed import qkv_heads_per_group


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    # [B, H, S, D] -> [B, S, H*D]
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def repack_qkv_grouped(w, heads: int):
    """Permute a reference-layout packed qkv output axis to the GROUPED layout.

    The torch reference packs the qkv projection's output axis ``(qkv h c)``
    (bsi/models/dit.py:39-41, bsi/nn/attention.py:35-38); our modules use
    ``(g qkv hpg c)`` where a group is the set of heads sharing a 128-lane
    block (a head PAIR at head_dim 64, one head at >= 128 — see
    :func:`bsi_tpu.ops.flash_attention_packed.qkv_heads_per_group`). One
    layout serves both hot consumers:

    - zero-copy kernels: group ``p``'s q|k|v are three adjacent lane blocks
      of the fused projection output, so the Pallas kernels read them via
      offset index maps and write the fused dqkv back contiguously;
    - tensor parallelism: a plain column sharding of the kernel is
      group-aligned, so the per-head q/k/v slices stay local to their model
      rank with no activation reshard (parallel/tensor.py; requires the
      model axis to divide ``heads / heads_per_group`` — true for all DiT
      recipes: 8 pairs vs model axes of 2-8).

    Applies to the LAST axis — Dense kernels ``[in, 3*dim]``, HWIO conv
    kernels ``[kh, kw, in, 3*dim]``, and biases ``[3*dim]`` alike. The
    inverse (for exporting back to the reference layout) is the same
    reshape with the group/qkv axes swapped back.
    """
    shape = w.shape
    d = shape[-1] // (3 * heads)
    hpg = qkv_heads_per_group(d, heads)
    w = w.reshape(shape[:-1] + (3, heads // hpg, hpg * d))
    w = jnp.moveaxis(w, -3, -2)  # (qkv g x) -> (g qkv x)
    return w.reshape(shape)


class TokenAttention(nn.Module):
    """Multi-head self-attention over a token sequence ``[B, S, F]``.

    Runs the zero-copy path end to end: the qkv projection output feeds the
    fused attention kernels DIRECTLY (offset index maps on the single fused
    buffer, fused dqkv gradient) and the kernel output feeds the out
    projection — no split, merge, or head transpose anywhere
    (ops/flash_attention_packed.py).
    """

    heads: int
    dropout: float = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        dim = x.shape[-1]
        qkv = nn.Dense(3 * dim, dtype=self.dtype, name="to_qkv")(x)
        rate = 0.0 if deterministic else self.dropout
        rng = self.make_rng("dropout") if rate > 0.0 else None
        out = multi_head_attention_fused_qkv(
            qkv, heads=self.heads, dropout_rate=rate, dropout_rng=rng
        )
        return nn.Dense(dim, dtype=self.dtype, name="to_out")(out)


class Attention2D(nn.Module):
    """Self-attention over all pixels of an NHWC feature map.

    qkv and output projections are 3x3 convolutions, so this is attention
    with a local mixing prelude rather than pure linear projections. The
    conv's packed output axis uses the same GROUPED layout as
    ``TokenAttention`` (one repacking convention everywhere).
    """

    heads: int = 4
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        qkv = nn.Conv(3 * c, (3, 3), padding="SAME", dtype=self.dtype, name="to_qkv")(x)
        q, k, v = split_qkv_grouped(qkv.reshape(b, h * w, 3 * c), self.heads)
        out = multi_head_attention(q, k, v)
        out = _merge_heads(out).reshape(b, h, w, c)
        return nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype, name="to_out")(out)
