"""Multi-head attention dispatch for TPU.

The reference forces torch SDPA onto its fused CUDA kernels
(bsi/nn/attention.py:8-19). Our equivalent: Pallas flash-attention kernels
(bsi_tpu/ops/flash_attention.py) covering forward, backward, AND
attention-probability dropout — so both the sampling hot path and the
training hot path run fused — with an XLA-fused reference formulation as
the fallback (non-TPU backends, unaligned shapes, long sequences).

Sequence lengths in this framework are small (<= 1024 pixel tokens, <= 256
patch tokens), so kernels are tuned for short sequences and large batch*heads
grids rather than long-context tiling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .flash_attention import (
    MAX_FUSED_TRAIN_SEQ,
    _partitioned_attention,
    _partitioned_attention_bwd,
)


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


@functools.cache
def _fused_sdpa_fn(rate: float):
    """custom-VJP fused attention for a fixed (static) dropout rate.

    ``seeds`` is int32 [batch, heads]; with rate > 0 the backward kernel
    reseeds the TPU PRNG with the same values and regenerates the forward's
    keep-mask (no mask in HBM). With rate == 0 the q-blocked forward kernel
    is used and seeds are ignored. Both directions carry SPMD partitioning
    rules, so this is safe (and scales) under the sharded train/eval jit.
    """

    @jax.custom_vjp
    def fused(q, k, v, seeds):
        return _partitioned_attention(rate)(q, k, v, seeds)

    def fused_fwd(q, k, v, seeds):
        return fused(q, k, v, seeds), (q, k, v, seeds)

    def fused_bwd(residuals, g):
        q, k, v, seeds = residuals
        if rate == 0.0 and q.shape[-2] > MAX_FUSED_TRAIN_SEQ:
            # Whole-sequence backward would not fit VMEM; fall back to the
            # mathematically identical XLA formulation (no dropout involved).
            _, vjp = jax.vjp(_xla_attention, q, k, v)
            dq, dk, dv = vjp(g)
        else:
            dq, dk, dv = _partitioned_attention_bwd(rate)(q, k, v, g, seeds)
        return dq, dk, dv, np.zeros(seeds.shape, jax.dtypes.float0)

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


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

    Routes to the Pallas flash kernels when applicable (TPU backend, aligned
    shapes; dropout additionally requires seq <= MAX_FUSED_TRAIN_SEQ for the
    whole-sequence kernels); otherwise to the XLA path. Differentiable either
    way (custom VJP with a fused backward kernel on the Pallas path).
    """
    if use_pallas is None:
        use_pallas = _pallas_applicable(q)
    b, h, seq, _ = q.shape
    if dropout_rate == 0.0:
        if use_pallas:
            seeds = jnp.zeros((b, h), jnp.int32)
            return _fused_sdpa_fn(0.0)(q, k, v, seeds)
    elif use_pallas and seq <= MAX_FUSED_TRAIN_SEQ:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires a dropout_rng")
        seeds = jax.random.randint(dropout_rng, (b, h), 0, 2**31 - 1, jnp.int32)
        return _fused_sdpa_fn(float(dropout_rate))(q, k, v, seeds)
    return _xla_attention(q, k, v, dropout_rate=dropout_rate, dropout_rng=dropout_rng)


@functools.cache
def _fused_packed_fn(rate: float, head_dim: int):
    """custom-VJP fused attention over the PACKED layout ``[B, S, H*D]``
    (head-major lanes) — no head transposes on either side of the kernel
    (bsi_tpu/ops/flash_attention_packed.py). Seeds: int32 [batch, heads]."""
    from .flash_attention_packed import _partitioned_packed, _partitioned_packed_bwd

    @jax.custom_vjp
    def fused(q, k, v, seeds):
        return _partitioned_packed(rate, head_dim)(q, k, v, seeds)

    def fused_fwd(q, k, v, seeds):
        return fused(q, k, v, seeds), (q, k, v, seeds)

    def fused_bwd(residuals, g):
        q, k, v, seeds = residuals
        dq, dk, dv = _partitioned_packed_bwd(rate, head_dim)(q, k, v, g, seeds)
        return dq, dk, dv, np.zeros(seeds.shape, jax.dtypes.float0)

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def multi_head_attention_packed(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    heads: int,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Attention over the packed layout ``[B, S, H*D]`` (head-major lanes).

    On TPU with lane-tileable shapes this runs the packed Pallas kernels,
    which consume and produce the natural matmul layout directly — deleting
    the four per-layer head transposes of the strided path (measured
    ~47 ms/step on DiT-L/2 b64). Otherwise it falls back to the strided
    :func:`multi_head_attention` (Pallas or XLA) behind a split/merge."""
    from .flash_attention_packed import packed_applicable

    b, s, hd_total = q.shape
    if hd_total % heads:
        raise ValueError(f"feature dim {hd_total} not divisible by heads={heads}")
    head_dim = hd_total // heads
    if use_pallas is None:
        use_pallas = _default_backend() == "tpu" and packed_applicable(
            hd_total, heads, s
        )
    if use_pallas:
        if dropout_rate > 0.0:
            if dropout_rng is None:
                raise ValueError("dropout_rate > 0 requires a dropout_rng")
            seeds = jax.random.randint(dropout_rng, (b, heads), 0, 2**31 - 1, jnp.int32)
        else:
            seeds = jnp.zeros((b, heads), jnp.int32)
        return _fused_packed_fn(float(dropout_rate), head_dim)(q, k, v, seeds)
    # fallback: strided layout (keeps the q-blocked Pallas kernel for long
    # no-dropout sequences, XLA elsewhere)
    to4 = lambda x: x.reshape(b, s, heads, head_dim).transpose(0, 2, 1, 3)
    out = multi_head_attention(
        to4(q), to4(k), to4(v), dropout_rate=dropout_rate, dropout_rng=dropout_rng
    )
    return out.transpose(0, 2, 1, 3).reshape(b, s, hd_total)


@functools.cache
def _fused_qkv_fn(rate: float, head_dim: int, hpg: int):
    """custom-VJP fused attention consuming the GROUPED qkv projection output
    ``[B, S, 3*H*D]`` directly (zero-copy q/k/v split) and returning the fused
    dqkv gradient (zero-copy merge). Seeds: int32 [batch, heads]."""
    from .flash_attention_packed import _partitioned_fused, _partitioned_fused_bwd

    @jax.custom_vjp
    def fused(qkv, seeds):
        groups = qkv.shape[-1] // (3 * hpg * head_dim)
        return _partitioned_fused(rate, head_dim, hpg, groups)(qkv, seeds)

    def fused_fwd(qkv, seeds):
        return fused(qkv, seeds), (qkv, seeds)

    def fused_bwd(residuals, g):
        qkv, seeds = residuals
        groups = qkv.shape[-1] // (3 * hpg * head_dim)
        dqkv = _partitioned_fused_bwd(rate, head_dim, hpg, groups)(qkv, g, seeds)
        return dqkv, np.zeros(seeds.shape, jax.dtypes.float0)

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def split_qkv_grouped(qkv: jnp.ndarray, heads: int):
    """GROUPED-layout qkv ``[B, S, (g qkv hpg d)]`` -> q, k, v ``[B, H, S, D]``.

    The inverse view of the weight packing in
    :func:`bsi_tpu.nn.attention.repack_qkv_grouped` — used only on the
    fallback (non-Pallas) path and by layout-parity tests; the TPU fast path
    never materializes the split (flash_attention_packed.flash_attention_fused).
    """
    from .flash_attention_packed import qkv_heads_per_group

    b, s, three_hd = qkv.shape
    hd = three_hd // 3
    d = hd // heads
    hpg = qkv_heads_per_group(d, heads)
    x = qkv.reshape(b, s, heads // hpg, 3, hpg, d)
    pick = lambda j: x[:, :, :, j].reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    return pick(0), pick(1), pick(2)


def multi_head_attention_fused_qkv(
    qkv: jnp.ndarray,
    *,
    heads: int,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Attention straight off the fused qkv projection output.

    ``qkv``: ``[B, S, 3*H*D]`` in the GROUPED layout (weights packed by
    :func:`bsi_tpu.nn.attention.repack_qkv_grouped`). On TPU with
    lane-tileable shapes the Pallas kernels read q/k/v via offset index maps
    on this single buffer and the backward writes one fused dqkv — the
    entire attention block runs with ZERO layout copies (the last ~14 ms of
    DiT-L/2 step time the packed 3-tensor path still paid, PERF_NOTES.md).
    Output: ``[B, S, H*D]`` head-major, ready for the out projection."""
    from .flash_attention_packed import packed_applicable, qkv_heads_per_group

    b, s, three_hd = qkv.shape
    if three_hd % (3 * heads):
        raise ValueError(
            f"fused qkv dim {three_hd} not divisible by 3*heads={3 * heads}"
        )
    hd_total = three_hd // 3
    head_dim = hd_total // heads
    if use_pallas is None:
        use_pallas = _default_backend() == "tpu" and packed_applicable(
            hd_total, heads, s
        )
    if use_pallas:
        if dropout_rate > 0.0:
            if dropout_rng is None:
                raise ValueError("dropout_rate > 0 requires a dropout_rng")
            seeds = jax.random.randint(dropout_rng, (b, heads), 0, 2**31 - 1, jnp.int32)
        else:
            seeds = jnp.zeros((b, heads), jnp.int32)
        hpg = qkv_heads_per_group(head_dim, heads)
        return _fused_qkv_fn(float(dropout_rate), head_dim, hpg)(qkv, seeds)
    # fallback: materialize the split and run the strided path
    q, k, v = split_qkv_grouped(qkv, heads)
    out = multi_head_attention(
        q, k, v, dropout_rate=dropout_rate, dropout_rng=dropout_rng
    )
    return out.transpose(0, 2, 1, 3).reshape(b, s, hd_total)


@functools.cache
def _default_backend() -> str:
    return jax.default_backend()


def _pallas_applicable(q: jnp.ndarray) -> bool:
    if _default_backend() != "tpu":
        return False
    seq, head_dim = q.shape[-2], q.shape[-1]
    # Kernel pads head_dim to a full lane tile; sequence must tile cleanly
    return head_dim in (64, 128, 256) and seq >= 128 and seq % 128 == 0
