"""Closed-form and parity tests for LogUniform and Gaussian likelihood helpers."""

import math

import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from bsi_tpu.core import (
    Discretization,
    LogUniform,
    discretized_normal_log_prob,
    normal_cdf,
    normal_log_prob,
)


def test_loguniform_cdf_icdf_roundtrip():
    lu = LogUniform(1e-2, 1e-2 + 1e6)
    q = jnp.asarray(np.linspace(0, 1, 101), dtype=jnp.float64)
    npt.assert_allclose(np.asarray(lu.cdf(lu.icdf(q))), np.asarray(q), atol=1e-12)


def test_loguniform_endpoints():
    lu = LogUniform(0.5, 32.0)
    npt.assert_allclose(float(lu.icdf(jnp.float64(0.0))), 0.5, rtol=1e-12)
    npt.assert_allclose(float(lu.icdf(jnp.float64(1.0))), 32.0, rtol=1e-12)


def test_loguniform_reciprocal_pdf():
    # p(x) = 1 / (x ln(high/low)); reciprocal_pdf(x) = x ln(high/low)
    lu = LogUniform(2.0, 8.0)
    x = jnp.asarray([2.0, 4.0, 8.0], dtype=jnp.float64)
    npt.assert_allclose(
        np.asarray(lu.reciprocal_pdf(x)),
        np.asarray(x) * math.log(4.0),
        rtol=1e-12,
    )


def test_loguniform_parity_with_reference():
    torch = pytest.importorskip("torch")
    from bsi.bsi import LogUniform as RefLogUniform

    lu = LogUniform(1e-2, 1e-2 + 1e6)
    ref = RefLogUniform(1e-2, 1e-2 + 1e6)
    q = np.linspace(0.001, 0.999, 57)
    npt.assert_allclose(
        np.asarray(lu.icdf(jnp.asarray(q))),
        ref.icdf(torch.tensor(q)).numpy(),
        rtol=1e-12,
    )
    v = np.asarray(lu.icdf(jnp.asarray(q)))
    npt.assert_allclose(
        np.asarray(lu.cdf(jnp.asarray(v))),
        ref.cdf(torch.tensor(v)).numpy(),
        rtol=1e-10,
    )
    npt.assert_allclose(
        np.asarray(lu.reciprocal_pdf(jnp.asarray(v))),
        ref.reciprocal_pdf(torch.tensor(v)).numpy(),
        rtol=1e-12,
    )


def test_normal_cdf_and_log_prob():
    scipy_stats = pytest.importorskip("scipy.stats")
    x = jnp.asarray(np.linspace(-4, 4, 33), dtype=jnp.float64)
    loc, scale = 0.3, 1.7
    npt.assert_allclose(
        np.asarray(normal_cdf(x, loc, scale)),
        scipy_stats.norm.cdf(np.asarray(x), loc, scale),
        atol=1e-12,
    )
    npt.assert_allclose(
        np.asarray(normal_log_prob(x, loc, scale)),
        scipy_stats.norm.logpdf(np.asarray(x), loc, scale),
        atol=1e-12,
    )


def test_discretized_normal_sums_to_one():
    # Total probability over all bins must be exactly 1 thanks to tail clamping
    d = Discretization(-1.0, 1.0, 16)
    centers = d.bin_centers(dtype=jnp.float64)
    log_p = discretized_normal_log_prob(centers, jnp.float64(0.1), jnp.float64(0.8), d)
    total = float(jnp.exp(log_p).sum())
    npt.assert_allclose(total, 1.0, rtol=1e-10)


def test_discretized_normal_parity_with_reference():
    """Compare against the reference's CDF-difference likelihood (bsi/bsi.py:237-245)."""
    torch = pytest.importorskip("torch")
    import torch.distributions as td
    from bsi.bsi import Discretization as RefDiscretization

    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, size=(64,))
    x_hat = x + rng.normal(0, 0.01, size=(64,))
    scale = 1.0 / math.sqrt(2e6)

    d = Discretization.image_8bit()
    ours = np.asarray(
        discretized_normal_log_prob(
            jnp.asarray(x), jnp.asarray(x_hat), jnp.float64(scale), d
        )
    )

    ref_d = RefDiscretization.image_8bit()
    tx, txh = torch.tensor(x), torch.tensor(x_hat)
    p = td.Normal(txh, torch.full_like(txh, scale), validate_args=False)
    boundaries = ref_d.bin_boundaries(tx.device, tx.dtype)
    x_idx = ref_d.bucketize(tx)
    cdf_left = torch.where(x_idx == 0, 0, p.cdf(boundaries[x_idx]))
    cdf_right = torch.where(x_idx == ref_d.k - 1, 1, p.cdf(boundaries[x_idx + 1]))
    ref = torch.log(torch.clamp(cdf_right - cdf_left, min=1e-20)).numpy()

    npt.assert_allclose(ours, ref, rtol=1e-7, atol=1e-9)
