"""Fused GroupNorm + SiLU Pallas kernel (forward + backward).

The UNet residual block opens with ``GroupNorm -> silu -> conv3x3``
(reference: bsi/nn/residual_block.py:24-64). TPU convs do not fuse their
input producers, so XLA runs GroupNorm as a reduce fusion plus an
elementwise fusion — three HBM passes over the [B, H, W, C] activation per
instance (x read twice, h written once). This kernel computes the per-group
statistics in VMEM and writes ``silu(xhat * gamma + beta)`` in ONE read +
ONE write; the backward fuses the SiLU/affine/GroupNorm VJP the same way
and emits per-batch-slice partials for dgamma/dbeta (summed by XLA).

MEASURED RESULT (PERF_NOTES.md "GroupNorm fusion on the train path"): at
the CIFAR recipe's shapes ([128, 1024, 128/256]) the kernel LOSES to XLA
end-to-end — 288 vs 241 ms/step — so dispatch is opt-in via
``BSI_TPU_FUSED_GN=1`` and the production default is the XLA formulation.
The kernel, its SPMD rules, and its tests are kept: the theoretical-win
analysis above holds only when the activation slab per instance is large
enough that the saved HBM pass beats the custom-call scheduling cost.

Implementation notes:
- group reductions avoid lane-dimension reshapes (Mosaic-unfriendly) by
  contracting with a compile-time 0/1 channel->group matrix on the MXU;
- statistics are f32 regardless of input dtype;
- the public entry carries custom_partitioning rules (batch sharded,
  spatial/channel replicated) like every kernel in this package.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6


def _pick_group(b: int, rows: int, c: int, itemsize: int, n_bufs: int) -> int:
    budget = 12 * 2**20
    for g in (8, 4, 2):
        if b % g == 0 and 2 * n_bufs * g * rows * c * itemsize + 3 * rows * c * 4 <= budget:
            return g
    return 1


def _group_matrix(c: int, groups: int):
    """[C, G] one-hot channel->group membership, built from iota (constant)."""
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    return (ch // (c // groups) == gr).astype(jnp.float32)


def _stats(xr, m, inv_n):
    """Per-group mean / rstd broadcast back to channels, via MXU contractions.

    Precision.HIGHEST is load-bearing: the MXU's default precision rounds
    dot inputs to bf16, and the channel sums fed in here are large enough
    that the default was measured at 1.9e-2 output error on a v5e.
    """
    csum = jnp.sum(xr, axis=0, keepdims=True)  # [1, C]
    csumsq = jnp.sum(xr * xr, axis=0, keepdims=True)
    gsum = jnp.dot(csum, m, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)  # [1, G]
    gsumsq = jnp.dot(csumsq, m, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    mean_g = gsum * inv_n
    var_g = gsumsq * inv_n - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + _EPS)
    mean_c = jnp.dot(mean_g, m.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)  # [1, C]
    rstd_c = jnp.dot(rstd_g, m.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    return mean_c, rstd_c


def _silu(z):
    return z * jax.nn.sigmoid(z)


def _fwd_kernel(x_ref, gamma_ref, beta_ref, o_ref, *, groups: int):
    grp = x_ref.shape[0]
    c = x_ref.shape[-1]
    m = _group_matrix(c, groups)
    inv_n = 1.0 / (x_ref.shape[1] * (c // groups))
    gamma = gamma_ref[0].astype(jnp.float32)  # [1, C]
    beta = beta_ref[0].astype(jnp.float32)
    for j in range(grp):
        xr = x_ref[j].astype(jnp.float32)  # [rows, C]
        mean_c, rstd_c = _stats(xr, m, inv_n)
        z = (xr - mean_c) * rstd_c * gamma + beta
        o_ref[j] = _silu(z).astype(o_ref.dtype)


def _bwd_kernel(
    x_ref, gamma_ref, beta_ref, g_ref, dx_ref, dgamma_ref, dbeta_ref, *, groups: int
):
    grp = x_ref.shape[0]
    c = x_ref.shape[-1]
    m = _group_matrix(c, groups)
    n = x_ref.shape[1] * (c // groups)
    inv_n = 1.0 / n
    gamma = gamma_ref[0].astype(jnp.float32)
    beta = beta_ref[0].astype(jnp.float32)
    for j in range(grp):
        xr = x_ref[j].astype(jnp.float32)
        go = g_ref[j].astype(jnp.float32)
        mean_c, rstd_c = _stats(xr, m, inv_n)
        xhat = (xr - mean_c) * rstd_c
        z = xhat * gamma + beta
        sig = jax.nn.sigmoid(z)
        dz = go * (sig * (1.0 + z * (1.0 - sig)))  # silu'
        dgamma_ref[j] = jnp.sum(dz * xhat, axis=0, keepdims=True).astype(dgamma_ref.dtype)
        dbeta_ref[j] = jnp.sum(dz, axis=0, keepdims=True).astype(dbeta_ref.dtype)
        dxhat = dz * gamma
        # per-group means of dxhat and dxhat*xhat, broadcast to channels
        m1 = jnp.dot(
            jnp.sum(dxhat, axis=0, keepdims=True), m, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
        )
        m2 = jnp.dot(
            jnp.sum(dxhat * xhat, axis=0, keepdims=True),
            m,
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        )
        m1c = jnp.dot(m1 * inv_n, m.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        m2c = jnp.dot(m2 * inv_n, m.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        dx_ref[j] = (rstd_c * (dxhat - m1c - xhat * m2c)).astype(dx_ref.dtype)


def _fwd_pallas(x3, gamma, beta, *, groups: int, interpret: bool = False):
    b, rows, c = x3.shape
    grp = _pick_group(b, rows, c, x3.dtype.itemsize, 2)
    x_spec = pl.BlockSpec((grp, rows, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((1, 1, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, groups=groups),
        out_shape=jax.ShapeDtypeStruct((b, rows, c), x3.dtype),
        grid=(b // grp,),
        in_specs=[x_spec, p_spec, p_spec],
        out_specs=x_spec,
        interpret=interpret,
    )(x3, gamma.reshape(1, 1, c), beta.reshape(1, 1, c))


def _bwd_pallas(x3, gamma, beta, g3, *, groups: int, interpret: bool = False):
    b, rows, c = x3.shape
    grp = _pick_group(b, rows, c, x3.dtype.itemsize, 3)
    x_spec = pl.BlockSpec((grp, rows, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((1, 1, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((grp, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    dx, dgamma_b, dbeta_b = pl.pallas_call(
        functools.partial(_bwd_kernel, groups=groups),
        out_shape=(
            jax.ShapeDtypeStruct((b, rows, c), x3.dtype),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ),
        grid=(b // grp,),
        in_specs=[x_spec, p_spec, p_spec, x_spec],
        out_specs=(x_spec, s_spec, s_spec),
        interpret=interpret,
    )(x3, gamma.reshape(1, 1, c), beta.reshape(1, 1, c), g3)
    # per-batch partials; the caller sums over b OUTSIDE the partitioned
    # call so a sharded batch axis reduces with proper collectives
    return dx, dgamma_b[:, 0, :], dbeta_b[:, 0, :]


# ------------------------------------------------- SPMD partitioning rules

# Interpret-mode switch for CPU tests of the REAL dispatch/partitioned path
# (monkeypatched together with _use_pallas; see tests/test_groupnorm_silu.py)
_INTERPRET = False


@functools.cache
def _partitioned_fwd(groups: int):
    from jax.experimental.custom_partitioning import custom_partitioning

    def local_fn(x3, gamma, beta):
        return _fwd_pallas(x3, gamma, beta, groups=groups, interpret=_INTERPRET)

    f = custom_partitioning(local_fn)

    def partition(mesh, arg_shapes, result_shape):
        return mesh, local_fn, arg_shapes[0].sharding, tuple(
            a.sharding for a in arg_shapes
        )

    f.def_partition(
        partition=partition,
        sharding_rule="b s c, c, c -> b s c",
        need_replication_factors=("s", "c"),
    )
    return f


@functools.cache
def _partitioned_bwd(groups: int):
    from jax.experimental.custom_partitioning import custom_partitioning

    def local_fn(x3, gamma, beta, g3):
        # returns PER-BATCH dgamma/dbeta partials [b, c]: each shard computes
        # its local rows, and the sum over the (possibly sharded) batch axis
        # happens outside this call where XLA inserts the collective
        return _bwd_pallas(x3, gamma, beta, g3, groups=groups, interpret=_INTERPRET)

    f = custom_partitioning(local_fn)

    def partition(mesh, arg_shapes, result_shape):
        arg_shardings = tuple(a.sharding for a in arg_shapes)
        from jax.sharding import NamedSharding, PartitionSpec as P

        x_sharding = arg_shapes[0].sharding
        batch_axis = x_sharding.spec[0] if x_sharding.spec else None
        partial_sharding = NamedSharding(x_sharding.mesh, P(batch_axis))
        return (
            mesh,
            local_fn,
            (x_sharding, partial_sharding, partial_sharding),
            arg_shardings,
        )

    f.def_partition(
        partition=partition,
        sharding_rule="b s c, c, c, b s c -> b s c, b c, b c",
        need_replication_factors=("s", "c"),
    )
    return f


# ----------------------------------------------------------- public entry


def _reference_math(x3, gamma, beta, groups: int):
    ct = jnp.promote_types(x3.dtype, jnp.float32)
    b, rows, c = x3.shape
    xg = x3.astype(ct).reshape(b, rows, groups, c // groups)
    # One-pass ("fast") variance like flax nn.GroupNorm: E[x^2] - E[x]^2.
    # Both group reductions fuse into a SINGLE read of the activation; the
    # two-pass formulation serializes a second full reduction pass behind
    # the mean (it needs x - mean), which measured as +18% on the whole
    # UNet sampling step (497 ms of convert_reduce fusions, PERF_NOTES.md
    # round 4). Statistics stay f32; the normalize/silu pass reads x once
    # more inside one elementwise fusion and writes in the input dtype.
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = (xg * xg).mean(axis=(1, 3), keepdims=True) - mean * mean
    rstd = jax.lax.rsqrt(var + _EPS)
    gamma_g = gamma.astype(ct).reshape(1, 1, groups, c // groups)
    beta_g = beta.astype(ct).reshape(1, 1, groups, c // groups)
    z = ((xg - mean) * (rstd * gamma_g) + beta_g).reshape(b, rows, c)
    z = z.astype(x3.dtype)  # silu in the input dtype, like GroupNorm->nn.silu
    return z * jax.nn.sigmoid(z)


# Read once at import: the flag gates jit DISPATCH, so flipping it after a
# shape has compiled would silently do nothing for that shape anyway — set
# it before the first compile. '0'/'false'/'off'/'' all mean disabled,
# matching BSI_TPU_CACHE_DIR's convention.
_FUSED_GN_ENABLED = os.environ.get("BSI_TPU_FUSED_GN", "").lower() in (
    "1", "true", "on", "yes",
)


def _use_pallas(x3, groups: int) -> bool:
    # OPT-IN (BSI_TPU_FUSED_GN=1). Measured end-to-end on the CIFAR recipe
    # (UNet dim 128 x 32 levels, b128 bf16 train step, PERF_NOTES.md): the
    # kernel REGRESSES the step 241 -> 288 ms. At these shapes the op is a
    # thin HBM-bound pass XLA already fuses well, and the custom-call
    # boundary costs more scheduling overlap than the saved read; the
    # kernel stays available for larger-C models where the stats reduction
    # dominates, but plain XLA math is the measured default.
    if not _FUSED_GN_ENABLED:
        return False
    if jax.default_backend() != "tpu":
        return False
    b, rows, c = x3.shape
    return (
        c % 128 == 0
        and c % groups == 0
        and rows % 8 == 0
        and rows * c * 4 * 3 <= 12 * 2**20
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def groupnorm_silu(x3, gamma, beta, groups: int):
    """``silu(GroupNorm(x) * gamma + beta)`` over ``[B, rows, C]`` (rows =
    flattened spatial dims) — fused on TPU, XLA math elsewhere."""
    return _dispatch_fwd(x3, gamma, beta, groups)


def _dispatch_fwd(x3, gamma, beta, groups):
    if _use_pallas(x3, groups):
        return _partitioned_fwd(groups)(x3, gamma, beta)
    return _reference_math(x3, gamma, beta, groups)


def _vjp_fwd(x3, gamma, beta, groups):
    return _dispatch_fwd(x3, gamma, beta, groups), (x3, gamma, beta)


def _vjp_bwd(groups, res, g):
    x3, gamma, beta = res
    if _use_pallas(x3, groups):
        dx, dgamma_b, dbeta_b = _partitioned_bwd(groups)(x3, gamma, beta, g)
        return dx, dgamma_b.sum(0).astype(gamma.dtype), dbeta_b.sum(0).astype(beta.dtype)
    _, pullback = jax.vjp(lambda x_, ga, be: _reference_math(x_, ga, be, groups),
                          x3, gamma, beta)
    return pullback(g)


groupnorm_silu.defvjp(_vjp_fwd, _vjp_bwd)
