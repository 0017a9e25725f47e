"""Shared helpers for the algorithm cores (BSI/VDM/BFN).

Covers broadcasting, low-discrepancy time sampling (reference:
bsi/bsi.py:61-64, :422-445), and the uniform "model function" contract.

The algorithm cores are *functional*: they hold hyperparameters only and act
on a ``model_fn(mu, t) -> prediction`` closure. The caller binds parameters,
dropout RNGs, and precision policy into ``model_fn``; the cores stay pure and
jit-compile end to end.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

# Uniform model contract shared by all algorithms:
#   model_fn(mu: [batch, *data_shape], t: [batch]) -> [batch, *data_shape]
ModelFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def protect_const(x: jnp.ndarray) -> jnp.ndarray:
    """Wrap a trace-time-constant array in an optimization barrier.

    Works around an XLA:TPU compiler crash (SIGILL in
    TpuPriorityFusionQueue::NormalizedComputationCost) that triggers when a
    constant timestep vector flows into a network whose parameters are traced
    arguments — e.g. the t=1 decode in the reconstruction loss inside a jitted
    eval step. The barrier keeps the constant as a runtime value so the
    offending constant-propagated fusion never forms; runtime cost is nil.
    """
    return jax.lax.optimization_barrier(x)


def broadcast_right(x: jnp.ndarray, other: jnp.ndarray) -> jnp.ndarray:
    """Append trailing singleton dims to ``x`` so it broadcasts against ``other``."""
    assert other.ndim >= x.ndim, (x.shape, other.shape)
    return x.reshape(x.shape + (1,) * (other.ndim - x.ndim))


def sample_lds_t(
    rng: jax.Array,
    n_samples: int,
    batch_size: int,
    *,
    low_discrepancy: bool = True,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Sample time quantiles ``t in [0, 1)`` of shape ``(n_samples, batch_size)``.

    With ``low_discrepancy=True`` this is the VDM-style stratified sampler: one
    uniform offset shared by an evenly spaced grid ``i / (1 + total)``, randomly
    permuted so a batch element is not evaluated at consecutive noise levels
    (reference: bsi/bsi.py:425-440). Otherwise plain iid uniforms.

    The non-LDS branch of the reference returns a transposed ``(batch, n)``
    array (a latent shape bug, bsi/bsi.py:442-445); we return ``(n, batch)`` in
    both branches.
    """
    total = n_samples * batch_size
    if low_discrepancy:
        rng_offset, rng_perm = jax.random.split(rng)
        offset = jax.random.uniform(rng_offset, (), dtype=dtype)
        grid = jax.random.permutation(rng_perm, total).astype(dtype) / (1 + total)
        return jnp.remainder(grid.reshape(n_samples, batch_size) + offset, 1.0)
    return jax.random.uniform(rng, (n_samples, batch_size), dtype=dtype)


def mc_var(values: jnp.ndarray, n_samples: int) -> jnp.ndarray:
    """Variance of the Monte Carlo mean estimator from per-sample values.

    ``values`` has shape ``(n_samples, batch)``; returns per-batch variance of
    the mean estimate (unbiased sample variance divided by n).
    """
    return jnp.var(values, axis=0, ddof=1) / n_samples
