"""Fused attention Pallas kernel for TPU.

Replaces the reference's reliance on torch's fused SDPA backends
(bsi/nn/attention.py:8-19). The workloads in this framework are
short-sequence, huge-batch attention (DiT patch tokens <= 1024, UNet pixel
tokens <= 4096, batch x heads in the thousands during sampling), so the
kernel keeps the full K/V for one (batch, head) resident in VMEM and fuses
QK^T -> softmax -> PV into a single pass per query block — no online-softmax
streaming is needed below ~8k sequence, and skipping it removes the rescaling
traffic.

Softmax statistics are computed in f32 regardless of input dtype (bf16 in
the sampling path), with the max-subtraction trick for stability.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q,
        k.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits -= jnp.max(logits, axis=-1, keepdims=True)
    unnorm = jnp.exp(logits)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    probs = (unnorm / denom).astype(v.dtype)
    o_ref[0] = jnp.dot(probs, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_block", "interpret"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    q_block: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused self-attention over ``[batch, heads, seq, head_dim]``.

    Requires ``seq`` divisible by the query block (the caller guarantees
    lane-friendly shapes; see ``ops.attention._pallas_applicable``).
    """
    b, h, seq, d = q.shape
    bh = b * h
    q3 = q.reshape(bh, seq, d)
    k3 = k.reshape(bh, seq, d)
    v3 = v.reshape(bh, seq, d)

    blk = min(q_block, seq)
    while seq % blk:
        blk //= 2
    grid = (bh, seq // blk)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=1.0 / (d**0.5)),
        out_shape=jax.ShapeDtypeStruct((bh, seq, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, seq, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, seq, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, blk, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(q3, k3, v3)
    return out.reshape(b, h, seq, d)
