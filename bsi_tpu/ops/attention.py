"""Multi-head attention dispatch for TPU.

The reference forces torch SDPA onto its fused CUDA kernels
(bsi/nn/attention.py:8-19). Our equivalent: a Pallas flash-attention kernel
for the no-dropout path (sampling / eval — the throughput-critical path) and
an XLA-fused reference path that supports attention-probability dropout for
training parity.

Sequence lengths in this framework are small (<= 1024 pixel tokens, <= 256
patch tokens), so kernels are tuned for short sequences and large batch*heads
grids rather than long-context tiling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
) -> jnp.ndarray:
    """Plain attention; XLA fuses this well on TPU for short sequences.

    Shapes: q, k, v are [batch, heads, seq, head_dim].
    """
    dim = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dim, jnp.float32)).astype(q.dtype)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires a dropout_rng")
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


@jax.custom_vjp
def _fused_attention(q, k, v):
    from .flash_attention import flash_attention

    return flash_attention(q, k, v)


def _fused_attention_fwd(q, k, v):
    return _fused_attention(q, k, v), (q, k, v)


def _fused_attention_bwd(residuals, g):
    # Backward through the mathematically identical XLA formulation — the
    # fused Pallas kernel stays forward-only (sampling/eval is the hot path;
    # the training backward is XLA-fused and exact).
    q, k, v = residuals
    _, vjp = jax.vjp(_xla_attention, q, k, v)
    return vjp(g)


_fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Scaled dot-product attention over [batch, heads, seq, head_dim].

    Routes to the Pallas flash kernel when available and applicable (no
    dropout, TPU backend, aligned shapes); otherwise to the XLA path.
    Differentiable either way (custom VJP on the fused path).
    """
    if dropout_rate == 0.0:
        if use_pallas is None:
            use_pallas = _pallas_applicable(q)
        if use_pallas:
            return _fused_attention(q, k, v)
    return _xla_attention(q, k, v, dropout_rate=dropout_rate, dropout_rng=dropout_rng)


@functools.cache
def _default_backend() -> str:
    return jax.default_backend()


def _pallas_applicable(q: jnp.ndarray) -> bool:
    if _default_backend() != "tpu":
        return False
    seq, head_dim = q.shape[-2], q.shape[-1]
    # Kernel pads head_dim to a full lane tile; sequence must tile cleanly
    return head_dim in (64, 128, 256) and seq >= 128 and seq % 128 == 0
