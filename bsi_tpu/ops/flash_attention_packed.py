"""Packed-layout fused attention: no head transposes, ever.

The kernels in :mod:`bsi_tpu.ops.flash_attention` consume ``[B, H, S, D]``,
which forces four XLA layout copies per attention layer (q/k/v split and
output merge, each exchanging S and H across sublane tiles) — measured at
~47 ms/step on DiT-L/2 b64 v5e, the largest identified gap to the derived
MFU ceiling (PERF_NOTES.md). These kernels instead consume q, k, v in the
NATURAL matmul output layout ``[B, S, H*D]`` (head-major lanes) and write
the output in the same layout, so the qkv projection feeds the kernel and
the kernel feeds the out projection with zero relayouts.

The trick that makes ``head_dim=64`` work despite the TPU's 128-lane tiles:
process head PAIRS. A 128-lane block holds two heads ``[q_h1 | q_h2]``;
per-head logits come from LANE-MASKED contractions —

    logits_h1 = (q * mask_lo) @ k^T     (lanes >= 64 of q zeroed)

which is exact because the masked lanes contribute zero to the dot. A
128-deep masked contraction costs the MXU the same as the 64-deep dot it
replaces (which pads to the 128-deep systolic array anyway), so the pair
formulation adds no MXU time. The two per-head outputs pack back into the
block as ``P_h1 @ (v * mask_lo) + P_h2 @ (v * mask_hi)`` — first/second 64
lanes respectively — which is again the natural layout. ``head_dim`` 128
(one head per block) and 256 (one head per two blocks) need no masking.

Dropout follows the same design as the strided kernels: per-(batch, head)
seeds for the per-core TPU PRNG, regenerated identically in the backward
kernel, no mask in HBM. Forward/backward/seed indexing must agree on the
grouping — both kernels use ``_pick_batch_group``.

The FUSED-qkv variants (`flash_attention_fused`, `flash_attention_fused_bwd`)
go one step further: with the GROUPED weight layout (`qkv_heads_per_group`)
each lane group's q|k|v are three adjacent blocks of the qkv projection's
own output buffer, so the forward reads them via offset BlockSpec index maps
(zero-copy split — the buffer is passed three times, three DMA streams, no
gather) and the backward writes the fused dqkv as one contiguous store per
group (zero-copy merge). The attention block then runs with NO layout ops at
all between the two projections.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import (
    MAX_FUSED_TRAIN_SEQ,
    _dot_precision,
    _keep_mask,
    _make_partition,
)

LANE = 128


def _pick_batch_group(b: int, seq: int) -> int:
    """Batch rows per grid cell: amortize per-cell pipeline overhead while
    keeping the f32 [seq, seq] intermediates of every subhead in VMEM.
    MUST match between forward and backward (seed indexing)."""
    for g in (8, 4, 2):
        if b % g == 0 and g * seq <= 2048:
            return g
    return 1


def _subhead_masks(head_dim: int, dtype) -> list[jnp.ndarray | None]:
    """Lane masks selecting each head inside a 128-lane block (None = the
    whole block is one head)."""
    if head_dim >= LANE:
        return [None]
    n_sub = LANE // head_dim
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    return [
        ((lanes >= j * head_dim) & (lanes < (j + 1) * head_dim)).astype(dtype)
        for j in range(n_sub)
    ]


def _packed_fwd_math(q, k, v, masks, keeps, scale, keep_prob):
    """Attention for all subheads of one [seq, block] tile, packed output."""
    prec = _dot_precision(q.dtype)
    q32 = q.astype(jnp.float32) * scale
    k32 = k.astype(jnp.float32)
    out = None
    for j, mask in enumerate(masks):
        qj = q32 if mask is None else q32 * mask
        logits = jax.lax.dot_general(
            qj, k32, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        logits -= jnp.max(logits, axis=-1, keepdims=True)
        unnorm = jnp.exp(logits)
        probs = unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)
        if keeps is not None:
            probs = jnp.where(keeps[j], probs / keep_prob, 0.0)
        vj = v if mask is None else v * mask.astype(v.dtype)
        oj = jnp.dot(
            probs.astype(v.dtype), vj, preferred_element_type=jnp.float32,
            precision=prec,
        )
        out = oj if out is None else out + oj
    return out


def _packed_bwd_math(q, k, v, do, masks, keeps, scale, keep_prob):
    """VJP of `_packed_fwd_math` wrt (q, k, v), recomputing the softmax."""
    prec = _dot_precision(q.dtype)
    q32 = q.astype(jnp.float32)
    k32 = k.astype(jnp.float32)
    in_dtype = v.dtype
    dq = dk = dv = None
    for j, mask in enumerate(masks):
        qj32 = q32 if mask is None else q32 * mask
        logits = jax.lax.dot_general(
            qj32 * scale, k32, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        logits -= jnp.max(logits, axis=-1, keepdims=True)
        unnorm = jnp.exp(logits)
        probs = unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)
        if keeps is not None:
            probs_dropped = jnp.where(keeps[j], probs / keep_prob, 0.0)
        else:
            probs_dropped = probs

        maskd = None if mask is None else mask.astype(in_dtype)
        doj = do if maskd is None else do * maskd
        vj = v if maskd is None else v * maskd
        dvj = jax.lax.dot_general(  # Pd^T dOj (packed: zero outside lanes j)
            probs_dropped.astype(in_dtype), doj,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dpd = jax.lax.dot_general(  # dOj Vj^T
            doj, vj, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        if keeps is not None:
            dp = jnp.where(keeps[j], dpd / keep_prob, 0.0)
        else:
            dp = dpd
        ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
        ds = ds.astype(in_dtype)
        kj = k if maskd is None else k * maskd
        qj = q if maskd is None else q * maskd
        dqj = jnp.dot(ds, kj, preferred_element_type=jnp.float32, precision=prec) * scale
        dkj = jax.lax.dot_general(  # dS^T Qj
            ds, qj, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ) * scale
        dq = dqj if dq is None else dq + dqj
        dk = dkj if dk is None else dk + dkj
        dv = dvj if dv is None else dv + dvj
    return dq, dk, dv


# --------------------------------------------------------------- kernels


def _packed_kernel(
    seed_ref, q_ref, k_ref, v_ref, o_ref, *, scale, keep_prob, head_dim, heads
):
    """Forward over a [group, seq, 128-lane] block (optionally dropout).

    Grid is (batch/group, heads*head_dim/128); block j of the lane axis
    holds ``128/head_dim`` subheads of every batch row in the group. The
    group loop is a ``fori_loop`` (dynamic ref indexing), NOT an unrolled
    Python loop: unrolling ``group * n_sub`` attention bodies made Mosaic
    compile 4x slower (147 s vs 35 s measured) with no runtime benefit."""
    group, _, blk = q_ref.shape
    seq_q, seq_k = q_ref.shape[1], k_ref.shape[1]
    n_sub = max(1, blk // head_dim)
    masks = _subhead_masks(head_dim, jnp.float32)
    cell_b = pl.program_id(0)
    cell_p = pl.program_id(1)

    def body(g, _):
        keeps = None
        if keep_prob < 1.0:
            # seed index = global (batch, head): batch row cell_b*group+g,
            # heads cell_p*n_sub .. +n_sub
            keeps = []
            for j in range(n_sub):
                row = (cell_b * group + g) * heads + cell_p * n_sub + j
                pltpu.prng_seed(seed_ref[row])
                keeps.append(_keep_mask((seq_q, seq_k), keep_prob))
        out = _packed_fwd_math(
            q_ref[pl.ds(g, 1)][0], k_ref[pl.ds(g, 1)][0], v_ref[pl.ds(g, 1)][0],
            masks, keeps, scale, keep_prob,
        )
        o_ref[pl.ds(g, 1)] = out.astype(o_ref.dtype)[None]
        return 0

    jax.lax.fori_loop(0, group, body, 0)


def _packed_bwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
    *, scale, keep_prob, head_dim, heads,
):
    group, _, blk = q_ref.shape
    seq_q, seq_k = q_ref.shape[1], k_ref.shape[1]
    n_sub = max(1, blk // head_dim)
    masks = _subhead_masks(head_dim, jnp.float32)
    cell_b = pl.program_id(0)
    cell_p = pl.program_id(1)

    def body(g, _):
        keeps = None
        if keep_prob < 1.0:
            keeps = []
            for j in range(n_sub):
                row = (cell_b * group + g) * heads + cell_p * n_sub + j
                pltpu.prng_seed(seed_ref[row])
                keeps.append(_keep_mask((seq_q, seq_k), keep_prob))
        dq, dk, dv = _packed_bwd_math(
            q_ref[pl.ds(g, 1)][0], k_ref[pl.ds(g, 1)][0], v_ref[pl.ds(g, 1)][0],
            do_ref[pl.ds(g, 1)][0], masks, keeps, scale, keep_prob,
        )
        dq_ref[pl.ds(g, 1)] = dq.astype(dq_ref.dtype)[None]
        dk_ref[pl.ds(g, 1)] = dk.astype(dk_ref.dtype)[None]
        dv_ref[pl.ds(g, 1)] = dv.astype(dv_ref.dtype)[None]
        return 0

    jax.lax.fori_loop(0, group, body, 0)


def _fused_bwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, do_ref, dqkv_ref,
    *, scale, keep_prob, head_dim, heads,
):
    """Backward writing the FUSED dqkv block ``[group, seq, 3*blk]`` directly.

    With the grouped qkv layout (see :func:`qkv_heads_per_group`) one grid
    cell's dq/dk/dv land on three adjacent lane blocks of the fused buffer,
    so the gradient of the qkv projection output needs no concatenation in
    HBM — the kernel's single write IS the fused gradient."""
    group, _, blk = q_ref.shape
    seq_q, seq_k = q_ref.shape[1], k_ref.shape[1]
    n_sub = max(1, blk // head_dim)
    masks = _subhead_masks(head_dim, jnp.float32)
    cell_b = pl.program_id(0)
    cell_p = pl.program_id(1)

    def body(g, _):
        keeps = None
        if keep_prob < 1.0:
            keeps = []
            for j in range(n_sub):
                row = (cell_b * group + g) * heads + cell_p * n_sub + j
                pltpu.prng_seed(seed_ref[row])
                keeps.append(_keep_mask((seq_q, seq_k), keep_prob))
        dq, dk, dv = _packed_bwd_math(
            q_ref[pl.ds(g, 1)][0], k_ref[pl.ds(g, 1)][0], v_ref[pl.ds(g, 1)][0],
            do_ref[pl.ds(g, 1)][0], masks, keeps, scale, keep_prob,
        )
        fused = jnp.concatenate([dq, dk, dv], axis=-1)  # in VMEM, one write
        dqkv_ref[pl.ds(g, 1)] = fused.astype(dqkv_ref.dtype)[None]
        return 0

    jax.lax.fori_loop(0, group, body, 0)


# ----------------------------------------------------------- public calls


def qkv_heads_per_group(head_dim: int, heads: int) -> int:
    """Heads per 128-lane group in the GROUPED qkv weight layout.

    The grouped layout packs the qkv projection's output axis as
    ``(group, qkv, heads_per_group, head_dim)`` — e.g. at head_dim 64 a
    group is a head PAIR and its q|k|v are three adjacent 128-lane blocks.
    This single layout serves both consumers:

    - the fused kernels read q/k/v of group ``p`` straight out of the fused
      projection output at lane offsets ``(3p, 3p+1, 3p+2) * block`` —
      zero-copy split — and the backward writes the fused dqkv gradient as
      one contiguous ``3*block`` store per group (`_fused_bwd_kernel`);
    - tensor parallelism's plain column sharding of the weight stays
      HEAD-ALIGNED as long as the model axis divides the group count
      (parallel/tensor.py).

    head_dim >= 128 degenerates to one head per group (grouped == the old
    head-major layout); head dims that don't tile 128 lanes get hpg=1.
    """
    if head_dim < LANE and LANE % head_dim == 0 and heads % (LANE // head_dim) == 0:
        return LANE // head_dim
    return 1


def flash_attention_fused(
    qkv: jnp.ndarray,
    seeds: jnp.ndarray,
    *,
    heads: int,
    rate: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused forward reading q/k/v straight from the GROUPED qkv buffer.

    ``qkv``: ``[B, S, 3*H*D]`` in the grouped layout (`qkv_heads_per_group`).
    The same whole-sequence kernel as :func:`flash_attention_packed` runs —
    the only difference is the BlockSpec index maps, which point the q/k/v
    DMA streams at lane offsets of the single fused buffer (zero-copy split).
    ``seeds``: int32 ``[B * H]``, ignored when ``rate == 0``."""
    b, seq, three_hd = qkv.shape
    hd_total = three_hd // 3
    head_dim = hd_total // heads
    keep_prob = 1.0 - rate
    blk = max(LANE, head_dim)
    group = _pick_batch_group(b, seq)

    def in_spec(off):
        return pl.BlockSpec(
            (group, seq, blk),
            lambda i, p, off=off: (i, 0, 3 * p + off),
            memory_space=pltpu.VMEM,
        )

    out_spec = pl.BlockSpec(
        (group, seq, blk), lambda i, p: (i, 0, p), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(
            _packed_kernel, scale=1.0 / (head_dim**0.5), keep_prob=keep_prob,
            head_dim=head_dim, heads=heads,
        ),
        out_shape=jax.ShapeDtypeStruct((b, seq, hd_total), qkv.dtype),
        grid=(b // group, hd_total // blk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            in_spec(0), in_spec(1), in_spec(2),
        ],
        out_specs=out_spec,
        interpret=interpret,
    )(seeds, qkv, qkv, qkv)


def flash_attention_fused_bwd(
    qkv: jnp.ndarray,
    do: jnp.ndarray,
    seeds: jnp.ndarray,
    *,
    heads: int,
    rate: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused backward: grouped qkv buffer + dO -> fused dqkv ``[B, S, 3*H*D]``.

    Reads q/k/v via the same offset index maps as the forward and writes the
    three gradients of each group as ONE contiguous ``3*block`` lane store,
    so the qkv projection's VJP consumes the result with no concatenation."""
    b, seq, three_hd = qkv.shape
    hd_total = three_hd // 3
    head_dim = hd_total // heads
    keep_prob = 1.0 - rate
    blk = max(LANE, head_dim)
    group = _pick_batch_group(b, seq)

    def in_spec(off):
        return pl.BlockSpec(
            (group, seq, blk),
            lambda i, p, off=off: (i, 0, 3 * p + off),
            memory_space=pltpu.VMEM,
        )

    do_spec = pl.BlockSpec(
        (group, seq, blk), lambda i, p: (i, 0, p), memory_space=pltpu.VMEM
    )
    dqkv_spec = pl.BlockSpec(
        (group, seq, 3 * blk), lambda i, p: (i, 0, p), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(
            _fused_bwd_kernel, scale=1.0 / (head_dim**0.5), keep_prob=keep_prob,
            head_dim=head_dim, heads=heads,
        ),
        out_shape=jax.ShapeDtypeStruct((b, seq, three_hd), qkv.dtype),
        grid=(b // group, hd_total // blk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            in_spec(0), in_spec(1), in_spec(2), do_spec,
        ],
        out_specs=dqkv_spec,
        interpret=interpret,
    )(seeds, qkv, qkv, qkv, do)


def packed_applicable(hd_total: int, heads: int, seq: int) -> bool:
    """Shapes the packed kernels accept: lane blocks hold a whole number of
    heads (64/128/256 head_dim), aligned sequence, fused-train range."""
    if heads <= 0 or hd_total % heads:
        return False
    head_dim = hd_total // heads
    if head_dim not in (64, 128, 256):
        return False
    if head_dim == 64 and heads % 2:
        return False  # pairs must be whole
    return seq >= 128 and seq % 128 == 0 and seq <= MAX_FUSED_TRAIN_SEQ


def flash_attention_packed(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    seeds: jnp.ndarray,
    *,
    heads: int,
    rate: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused forward over the packed layout ``[B, S, H*D]`` (head-major).

    ``seeds``: int32 ``[B * H]`` (one PRNG seed per batch-head), ignored when
    ``rate == 0``. (``interpret`` only works with ``rate == 0``.)"""
    b, seq, hd_total = q.shape
    head_dim = hd_total // heads
    keep_prob = 1.0 - rate
    blk = max(LANE, head_dim)
    group = _pick_batch_group(b, seq)
    spec = pl.BlockSpec(
        (group, seq, blk), lambda i, p: (i, 0, p), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(
            _packed_kernel, scale=1.0 / (head_dim**0.5), keep_prob=keep_prob,
            head_dim=head_dim, heads=heads,
        ),
        out_shape=jax.ShapeDtypeStruct((b, seq, hd_total), q.dtype),
        grid=(b // group, hd_total // blk),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(seeds, q, k, v)


def flash_attention_packed_bwd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    do: jnp.ndarray,
    seeds: jnp.ndarray,
    *,
    heads: int,
    rate: float,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused backward for the packed forward (same seeds -> same mask)."""
    b, seq, hd_total = q.shape
    head_dim = hd_total // heads
    keep_prob = 1.0 - rate
    blk = max(LANE, head_dim)
    group = _pick_batch_group(b, seq)
    spec = pl.BlockSpec(
        (group, seq, blk), lambda i, p: (i, 0, p), memory_space=pltpu.VMEM
    )
    shape = jax.ShapeDtypeStruct((b, seq, hd_total), q.dtype)
    return pl.pallas_call(
        functools.partial(
            _packed_bwd_kernel, scale=1.0 / (head_dim**0.5), keep_prob=keep_prob,
            head_dim=head_dim, heads=heads,
        ),
        out_shape=(shape, shape, shape),
        grid=(b // group, hd_total // blk),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        interpret=interpret,
    )(seeds, q, k, v, do)


# ------------------------------------------------- SPMD partitioning rules
#
# Same rationale as flash_attention.py: a bare pallas_call under a sharded
# jit is replicated. The packed layout shards batch on ``b`` and heads on
# the ``h`` factor of the compound lane dim ``(h e)`` — tensor parallelism
# slices H*D into per-rank head groups, and the seed array's own ``h`` is
# tied to the same factor so each rank gets its heads' seeds. The local
# kernel derives its LOCAL head count from the shapes (global heads would be
# wrong under TP). ``e`` (head_dim) and ``s`` must stay whole.


@functools.cache
def _partitioned_packed(rate: float, head_dim: int):
    from jax.experimental.custom_partitioning import custom_partitioning

    def local_fn(q, k, v, seeds2d):
        heads = q.shape[-1] // head_dim
        return flash_attention_packed(
            q, k, v, seeds2d.reshape(-1), heads=heads, rate=rate
        )

    f = custom_partitioning(local_fn)
    f.def_partition(
        partition=_make_partition(local_fn),
        sharding_rule="b s (h e), b s (h e), b s (h e), b h -> b s (h e)",
        need_replication_factors=("s", "e"),
        e=head_dim,
    )
    return f


@functools.cache
def _partitioned_packed_bwd(rate: float, head_dim: int):
    from jax.experimental.custom_partitioning import custom_partitioning

    def local_fn(q, k, v, do, seeds2d):
        heads = q.shape[-1] // head_dim
        return flash_attention_packed_bwd(
            q, k, v, do, seeds2d.reshape(-1), heads=heads, rate=rate
        )

    f = custom_partitioning(local_fn)
    f.def_partition(
        partition=_make_partition(local_fn),
        sharding_rule=(
            "b s (h e), b s (h e), b s (h e), b s (h e), b h "
            "-> b s (h e), b s (h e), b s (h e)"
        ),
        need_replication_factors=("s", "e"),
        e=head_dim,
    )
    return f


# The fused-qkv variants shard batch on ``b`` and lane GROUPS on ``g`` —
# the grouped layout keeps each group's q|k|v (and its heads' seeds, factor
# ``t``) on one rank, so tensor parallelism over head groups needs no
# resharding at the kernel boundary. ``x``/``y`` (the 3*block / block lane
# widths inside a group) and ``s`` must stay whole.


@functools.cache
def _partitioned_fused(rate: float, head_dim: int, hpg: int, groups: int):
    from jax.experimental.custom_partitioning import custom_partitioning

    def local_fn(qkv, seeds2d):
        heads = qkv.shape[-1] // (3 * head_dim)
        return flash_attention_fused(
            qkv, seeds2d.reshape(-1), heads=heads, rate=rate
        )

    f = custom_partitioning(local_fn)
    f.def_partition(
        partition=_make_partition(local_fn),
        sharding_rule="b s (g x), b (g t) -> b s (g y)",
        need_replication_factors=("s", "x", "t", "y"),
        g=groups,
        x=3 * hpg * head_dim,
        t=hpg,
        y=hpg * head_dim,
    )
    return f


@functools.cache
def _partitioned_fused_bwd(rate: float, head_dim: int, hpg: int, groups: int):
    from jax.experimental.custom_partitioning import custom_partitioning

    def local_fn(qkv, do, seeds2d):
        heads = qkv.shape[-1] // (3 * head_dim)
        return flash_attention_fused_bwd(
            qkv, do, seeds2d.reshape(-1), heads=heads, rate=rate
        )

    f = custom_partitioning(local_fn)
    f.def_partition(
        partition=_make_partition(local_fn),
        sharding_rule="b s (g x), b s (g y), b (g t) -> b s (g x)",
        # NB: must be listed in first-appearance order of the rule string
        # (MLIR verifier: "indices of special factors must be sorted")
        need_replication_factors=("s", "x", "y", "t"),
        g=groups,
        x=3 * hpg * head_dim,
        t=hpg,
        y=hpg * head_dim,
    )
    return f
