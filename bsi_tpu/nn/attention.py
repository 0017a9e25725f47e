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

from bsi_tpu.ops import multi_head_attention, multi_head_attention_packed


def _split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    # [B, S, H*D] -> [B, H, S, D]
    b, s, hd = x.shape
    return x.reshape(b, s, heads, hd // heads).transpose(0, 2, 1, 3)


def _split_qkv_head_major(qkv: jnp.ndarray, heads: int):
    """Unpack a HEAD-MAJOR packed qkv projection into per-head q, k, v.

    The projection output axis is laid out ``[head0: q|k|v, head1: q|k|v,
    ...]`` (vs the reference's ``[q|k|v]`` packing, bsi/models/dit.py:26-47;
    the torch->flax weight converters repack). Head-major packing makes a
    plain column sharding of the qkv kernel HEAD-ALIGNED, so tensor
    parallelism shards it over the mesh's model axis without GSPMD inserting
    an activation reshard at the q/k/v split (parallel/tensor.py).
    """
    b, s, three_hd = qkv.shape
    qkv = qkv.reshape(b, s, heads, 3, three_hd // (3 * heads))
    # three separate slice+transpose ops (not one 5D transpose): XLA lowers
    # each to a single efficient [B,S,H,D]->[B,H,S,D] copy
    q = qkv[:, :, :, 0].transpose(0, 2, 1, 3)
    k = qkv[:, :, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, :, 2].transpose(0, 2, 1, 3)
    return q, k, v


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    # [B, H, S, D] -> [B, S, H*D]
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def repack_qkv_head_major(w, heads: int):
    """Permute a reference-layout packed qkv output axis to head-major.

    The torch reference packs the qkv projection's output axis ``(qkv h c)``
    (bsi/models/dit.py:39-41, bsi/nn/attention.py:35-38); our modules use
    ``(h qkv c)`` so a column sharding is head-aligned (see
    :func:`_split_qkv_head_major`). Applies to the LAST axis — Dense kernels
    ``[in, 3*dim]``, HWIO conv kernels ``[kh, kw, in, 3*dim]``, and biases
    ``[3*dim]`` alike. The inverse (for exporting back to the reference
    layout) is the same permutation with the roles of qkv/heads swapped.
    """
    shape = w.shape
    hd = shape[-1] // (3 * heads)
    w = w.reshape(shape[:-1] + (3, heads, hd))
    w = jnp.moveaxis(w, -3, -2)  # (qkv h c) -> (h qkv c)
    return w.reshape(shape)


def _extract_qkv_packed(qkv: jnp.ndarray, heads: int):
    """Head-major packed qkv ``[B, S, (h qkv c)]`` -> three ``[B, S, (h c)]``.

    A pure lane gather: no sequence/sublane movement, so XLA lowers it far
    cheaper than the [B,S,H,D]->[B,H,S,D] transposes it replaces. The (h c)
    outputs feed :func:`bsi_tpu.ops.multi_head_attention_packed` directly."""
    b, s, three_hd = qkv.shape
    d = three_hd // (3 * heads)
    qkv5 = qkv.reshape(b, s, heads, 3, d)
    flat = lambda x: x.reshape(b, s, heads * d)
    return flat(qkv5[:, :, :, 0]), flat(qkv5[:, :, :, 1]), flat(qkv5[:, :, :, 2])


class TokenAttention(nn.Module):
    """Multi-head self-attention over a token sequence ``[B, S, F]``.

    Runs in the PACKED layout end to end: qkv projection -> lane-gather
    split -> packed fused attention -> out projection, with no head
    transposes anywhere on the TPU fast path (ops/flash_attention_packed.py).
    """

    heads: int
    dropout: float = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        dim = x.shape[-1]
        qkv = nn.Dense(3 * dim, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = _extract_qkv_packed(qkv, self.heads)
        rate = 0.0 if deterministic else self.dropout
        rng = self.make_rng("dropout") if rate > 0.0 else None
        out = multi_head_attention_packed(
            q, k, v, heads=self.heads, dropout_rate=rate, dropout_rng=rng
        )
        return nn.Dense(dim, dtype=self.dtype, name="to_out")(out)


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
        q, k, v = _split_qkv_head_major(qkv.reshape(b, h * w, 3 * c), self.heads)
        out = multi_head_attention(q, k, v)
        out = _merge_heads(out).reshape(b, h, w, c)
        return nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype, name="to_out")(out)
