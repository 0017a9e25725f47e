"""Fused LayerNorm + adaLN modulate Pallas kernel (forward + backward).

DiT spends its non-matmul time in elementwise fusions; the largest single
contributor is the pre-attention / pre-MLP pattern

    out = shift[:, None, :] + (scale[:, None, :] + 1) * LayerNorm(x)

(reference: bsi/models/dit.py:50-103, the adaLN-Zero ``modulate``). XLA
splits it into a reduce fusion (mean/var) plus an elementwise fusion, reading
the [B, S, D] activation from HBM twice per instance; the Pallas kernel
computes the row statistics in VMEM and writes the modulated output in ONE
read + ONE write. The backward kernel fuses the LayerNorm VJP with the
shift/scale gradient reductions the same way (x is re-read once; the mean/
rstd are recomputed in-register rather than saved to HBM).

The LayerNorm here is statistics-only (no learned scale/bias) — exactly the
``use_scale=False, use_bias=False`` form DiT uses; statistics are computed
in f32 regardless of input dtype.

Like every kernel in this package, the public entry point carries
``custom_partitioning`` rules (batch sharded, feature dim replicated) so a
sharded jit partitions it instead of silently replicating it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6


def _pick_group(b: int, seq: int, d: int, itemsize: int, n_bufs: int) -> int:
    """Batch slices per grid cell: amortize per-cell pipeline overhead while
    keeping the cell's buffers in VMEM. The pipeline DOUBLE-BUFFERS every
    in/out block (2x), and one slice of f32 intermediates lives on the
    compute stack; budget against the ~16 MB scoped VMEM limit."""
    budget = 12 * 2**20
    for g in (8, 4, 2):
        if b % g == 0 and 2 * n_bufs * g * seq * d * itemsize + 3 * seq * d * 4 <= budget:
            return g
    return 1


def _ln(x32):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    return xc * rstd


def _fwd_kernel(x_ref, shift_ref, scale_ref, o_ref):
    # conditioning refs are [group, 1, d] (TPU block shapes need the
    # trailing dims (1, d)); [1, d] broadcasts over the [seq, d] slice
    group = x_ref.shape[0]
    for j in range(group):
        norm = _ln(x_ref[j].astype(jnp.float32))
        out = shift_ref[j].astype(jnp.float32) + (
            scale_ref[j].astype(jnp.float32) + 1.0
        ) * norm
        o_ref[j] = out.astype(o_ref.dtype)


def _bwd_kernel(x_ref, scale_ref, g_ref, dx_ref, dshift_ref, dscale_ref):
    group = x_ref.shape[0]
    inv_d = 1.0 / x_ref.shape[-1]
    for j in range(group):
        x32 = x_ref[j].astype(jnp.float32)
        g32 = g_ref[j].astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        xc = x32 - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + _EPS)
        norm = xc * rstd
        # shift/scale broadcast over seq -> their grads reduce over seq
        dshift_ref[j] = jnp.sum(g32, axis=0, keepdims=True).astype(dshift_ref.dtype)
        dscale_ref[j] = jnp.sum(g32 * norm, axis=0, keepdims=True).astype(dscale_ref.dtype)
        # LayerNorm VJP (no affine): dx = rstd * (dn - mean(dn) - norm * mean(dn * norm))
        dn = g32 * (scale_ref[j].astype(jnp.float32) + 1.0)
        m1 = jnp.sum(dn, axis=-1, keepdims=True) * inv_d
        m2 = jnp.sum(dn * norm, axis=-1, keepdims=True) * inv_d
        dx_ref[j] = (rstd * (dn - m1 - norm * m2)).astype(dx_ref.dtype)


def _fwd_pallas(x, shift, scale, *, interpret: bool = False):
    b, seq, d = x.shape
    group = _pick_group(b, seq, d, x.dtype.itemsize, 2)
    x_spec = pl.BlockSpec((group, seq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((group, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((b, seq, d), x.dtype),
        grid=(b // group,),
        in_specs=[x_spec, c_spec, c_spec],
        out_specs=x_spec,
        interpret=interpret,
    )(x, shift[:, None, :], scale[:, None, :])


def _bwd_pallas(x, scale, g, *, interpret: bool = False):
    b, seq, d = x.shape
    group = _pick_group(b, seq, d, x.dtype.itemsize, 3)
    x_spec = pl.BlockSpec((group, seq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((group, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    dx, dshift, dscale = pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, seq, d), x.dtype),
            jax.ShapeDtypeStruct((b, 1, d), scale.dtype),
            jax.ShapeDtypeStruct((b, 1, d), scale.dtype),
        ),
        grid=(b // group,),
        in_specs=[x_spec, c_spec, x_spec],
        out_specs=(x_spec, c_spec, c_spec),
        interpret=interpret,
    )(x, scale[:, None, :], g)
    return dx, dshift[:, 0, :], dscale[:, 0, :]


# ------------------------------------------------- SPMD partitioning rules
# Each grid cell touches one batch slice of whole rows (tokens); LayerNorm is
# per-token, so BOTH the batch and the sequence dim may shard — the latter is
# what sequence parallelism (bsi_tpu/parallel/sequence.py) relies on: the
# kernel runs on this rank's token slice with no communication in forward.
# Only the feature dim must stay replicated (the statistics reduce over it).
# The backward's dshift/dscale reduce over seq, so under a seq-sharded layout
# the local partials are psum'd over the seq-sharding axes inside the
# partitioned lowering.

# Test hook: route the partitioned lowering through Pallas interpret mode so
# the SPMD rules (incl. the seq-shard psum) run on the CPU test mesh.
_INTERPRET = False


def _seq_axes(sharding):
    """Mesh axes sharding dim 1 (seq) of a [b, s, d] NamedSharding."""
    spec = sharding.spec
    if len(spec) < 2 or spec[1] is None:
        return ()
    s = spec[1]
    return tuple(s) if isinstance(s, tuple) else (s,)


def _cond_sharding(mesh, x_sharding):
    """[b, d] conditioning sharding consistent with x's [b, s, d]: batch dim
    follows x, feature dim replicated (and never the seq axes)."""
    from jax.sharding import NamedSharding, PartitionSpec

    b = x_sharding.spec[0] if len(x_sharding.spec) > 0 else None
    return NamedSharding(mesh, PartitionSpec(b, None))


def _partition_fwd(mesh, arg_shapes, result_shape):
    x_sh = arg_shapes[0].sharding
    cond = _cond_sharding(mesh, x_sh)

    def local_fn(x, shift, scale):
        return _fwd_pallas(x, shift, scale, interpret=_INTERPRET)

    return mesh, local_fn, x_sh, (x_sh, cond, cond)


def _partition_bwd(mesh, arg_shapes, result_shape):
    x_sh = arg_shapes[0].sharding
    cond = _cond_sharding(mesh, x_sh)
    s_axes = _seq_axes(x_sh)

    def local_fn(x, scale, g):
        dx, dshift, dscale = _bwd_pallas(x, scale, g, interpret=_INTERPRET)
        if s_axes:
            # seq-sharded stream: every rank reduced only its own tokens
            dshift = jax.lax.psum(dshift, s_axes)
            dscale = jax.lax.psum(dscale, s_axes)
        return dx, dshift, dscale

    return mesh, local_fn, (x_sh, cond, cond), (x_sh, cond, x_sh)


@functools.cache
def _partitioned_fwd():
    from jax.experimental.custom_partitioning import custom_partitioning

    def wrapped(x, shift, scale):
        return _fwd_pallas(x, shift, scale, interpret=_INTERPRET)

    f = custom_partitioning(wrapped)
    f.def_partition(
        partition=_partition_fwd,
        sharding_rule="b s d, b d, b d -> b s d",
        need_replication_factors=("d",),
    )
    return f


@functools.cache
def _partitioned_bwd():
    from jax.experimental.custom_partitioning import custom_partitioning

    def wrapped(x, scale, g):
        return _bwd_pallas(x, scale, g, interpret=_INTERPRET)

    f = custom_partitioning(wrapped)
    f.def_partition(
        partition=_partition_bwd,
        sharding_rule="b s d, b d, b s d -> b s d, b d, b d",
        need_replication_factors=("d",),
    )
    return f


# ----------------------------------------------------------- public entry


def _reference_math(x, shift, scale):
    """XLA fallback — same semantics (statistics at >= f32 precision)."""
    ct = jnp.promote_types(x.dtype, jnp.float32)
    out = shift.astype(ct)[:, None, :] + (scale.astype(ct)[:, None, :] + 1.0) * _ln(
        x.astype(ct)
    )
    return out.astype(x.dtype)


@jax.custom_vjp
def layernorm_modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray):
    """``shift + (scale + 1) * LayerNorm(x)`` over ``[B, S, D]`` tokens with
    per-batch ``[B, D]`` conditioning — fused on TPU, XLA math elsewhere."""
    return _dispatch_fwd(x, shift, scale)


def _use_pallas(x) -> bool:
    if jax.default_backend() != "tpu":
        return False
    b, seq, d = x.shape
    # lane/sublane-friendly and VMEM-sized; anything else takes the XLA path
    return d % 128 == 0 and seq % 8 == 0 and seq * d * 4 * 3 <= 12 * 2**20


def _dispatch_fwd(x, shift, scale):
    if _use_pallas(x):
        return _partitioned_fwd()(x, shift, scale)
    return _reference_math(x, shift, scale)


def _vjp_fwd(x, shift, scale):
    return _dispatch_fwd(x, shift, scale), (x, scale)


def _vjp_bwd(res, g):
    x, scale = res
    if _use_pallas(x):
        dx, dshift, dscale = _partitioned_bwd()(x, scale, g)
        return dx, dshift, dscale
    # XLA fallback VJP via autodiff of the reference math
    def fwd_ref(x_, shift_, scale_):
        return _reference_math(x_, shift_, scale_)

    _, pullback = jax.vjp(fwd_ref, x, jnp.zeros_like(scale), scale)
    dx, dshift, dscale = pullback(g)
    return dx, dshift, dscale


layernorm_modulate.defvjp(_vjp_fwd, _vjp_bwd)
