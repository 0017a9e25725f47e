"""Probability helpers for the algorithm cores.

``LogUniform`` is the noise-precision distribution used by BSI's importance
sampling of the measurement loss (reference: bsi/bsi.py:67-84). The Gaussian
helpers implement the discretized reconstruction likelihoods that both BSI
and VDM need (reference: bsi/bsi.py:231-245, bsi/vdm.py:177-193) — written
directly in terms of erf for f32 stability on TPU.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_INV_SQRT2 = 1.0 / math.sqrt(2.0)


class LogUniform:
    """Log-uniform distribution on ``[low, high]``.

    Density p(x) = 1 / (x * (ln(high) - ln(low))) for x in [low, high].
    """

    def __init__(self, low: float, high: float):
        self.low = float(low)
        self.high = float(high)
        self.ln_low = math.log(self.low)
        self.ln_high = math.log(self.high)
        self.diff_ln_high_ln_low = self.ln_high - self.ln_low

    def reciprocal_pdf(self, value: jnp.ndarray) -> jnp.ndarray:
        """Return the reciprocal probability density at ``value``."""
        return value * self.diff_ln_high_ln_low

    def cdf(self, value: jnp.ndarray) -> jnp.ndarray:
        return (jnp.log(value) - self.ln_low) / self.diff_ln_high_ln_low

    def icdf(self, quantile: jnp.ndarray) -> jnp.ndarray:
        return jnp.exp(self.diff_ln_high_ln_low * quantile + self.ln_low)


def normal_cdf(x: jnp.ndarray, loc: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """CDF of a Normal(loc, scale) evaluated at x."""
    z = (x - loc) / scale
    return 0.5 * (1.0 + jax.lax.erf(z * _INV_SQRT2))


def normal_log_prob(x: jnp.ndarray, loc: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Log density of a Normal(loc, scale) evaluated at x."""
    z = (x - loc) / scale
    return -0.5 * z * z - jnp.log(scale) - 0.5 * math.log(2.0 * math.pi)


def discretized_normal_log_prob(
    x: jnp.ndarray,
    loc: jnp.ndarray,
    scale: jnp.ndarray,
    discretization,
    *,
    min_prob: float = 1e-20,
) -> jnp.ndarray:
    """Per-dimension log-likelihood of ``x`` under a Normal discretized into bins.

    The probability of the bin containing ``x`` is the CDF difference between its
    boundaries; the outermost bins absorb the full tails (reference:
    bsi/bsi.py:237-245).

    Args:
        x: Data values inside ``[discretization.min, discretization.max]``.
        loc: Mean of the Normal, broadcastable against ``x``.
        scale: Scale of the Normal, broadcastable against ``x``.
        discretization: A :class:`~bsi_tpu.core.discretization.Discretization`.

    Returns:
        Elementwise log probability with the broadcast shape of ``x`` and ``loc``.
    """
    boundaries = discretization.bin_boundaries(dtype=x.dtype)
    x_idx = discretization.bucketize(x)
    cdf_left = normal_cdf(boundaries[x_idx], loc, scale)
    cdf_right = normal_cdf(boundaries[x_idx + 1], loc, scale)
    cdf_left = jnp.where(x_idx == 0, 0.0, cdf_left)
    cdf_right = jnp.where(x_idx == discretization.k - 1, 1.0, cdf_right)
    return jnp.log(jnp.clip(cdf_right - cdf_left, min=min_prob))
