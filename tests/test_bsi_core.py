"""Numerics tests for the BSI algorithm core.

Strategy (SURVEY.md §4/§7): the torch reference is executed as a golden oracle
for deterministic parts (EDM preconditioning, likelihoods); stochastic parts
are validated against closed forms / quadrature at f64 and against the
reference statistically, since PRNG streams cannot be bit-matched across
frameworks.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from bsi_tpu.core import BSI, Discretization
from bsi_tpu.core.common import sample_lds_t

DATA_SHAPE = (4,)


def make_bsi(**kwargs):
    defaults = dict(
        data_shape=DATA_SHAPE,
        lambda_0=1e-2,
        alpha_M=1e6,
        alpha_R=2e6,
        k=50,
        preconditioning=None,
        discretization=None,
    )
    defaults.update(kwargs)
    return BSI(**defaults)


def identity_model(mu, t):
    return mu


def test_edm_preconditioning_parity_with_reference():
    torch = pytest.importorskip("torch")
    from bsi.bsi import BSI as RefBSI

    bsi = make_bsi(preconditioning="edm")
    # Construct under double default dtype so the reference's hyperparameter
    # buffers hold the exact f64 constants (it builds LogUniform from them)
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.double)
    try:
        ref = RefBSI(
            torch.nn.Identity(),
            data_shape=DATA_SHAPE,
            lambda_0=1e-2,
            alpha_M=1e6,
            alpha_R=2e6,
            k=50,
            preconditioning="edm",
        )
    finally:
        torch.set_default_dtype(prev)

    t = np.linspace(0.0, 1.0, 41)
    ours = bsi._edm_preconditioning(jnp.asarray(t))
    theirs = ref._edm_preconditioning(torch.tensor(t))
    for o, r in zip(ours, theirs):
        npt.assert_allclose(np.asarray(o), r.numpy(), rtol=1e-10, atol=1e-14)


def test_sample_scan_matches_python_loop():
    """The lax.scan sampler must agree exactly with an unrolled Python loop."""
    bsi = make_bsi(k=8, preconditioning="edm")

    def model(mu, t):
        # A fixed nonlinear function so the test exercises predict_x
        return jnp.tanh(mu) * (1.0 + t.reshape((-1,) + (1,) * (mu.ndim - 1)))

    rng = jax.random.key(42)
    n = 3
    got = bsi.sample(model, rng, n, dtype=jnp.float64)

    # Manual unrolled replication of the same key schedule
    t = bsi.default_schedule(jnp.float64)
    lam = bsi.p_lambda.icdf(t)
    alpha = jnp.diff(lam)
    rng0, rng_steps = jax.random.split(rng)
    mu = jax.lax.rsqrt(lam[0]) * jax.random.normal(rng0, (n,) + DATA_SHAPE, jnp.float64)
    keys = jax.random.split(rng_steps, bsi.k)
    for i in range(bsi.k):
        x_hat = bsi._predict_x(model, mu, jnp.full((n,), t[i], jnp.float64))
        y = x_hat + jax.lax.rsqrt(alpha[i]) * jax.random.normal(
            keys[i], (n,) + DATA_SHAPE, jnp.float64
        )
        mu = (alpha[i] * y + lam[i] * mu) / lam[i + 1]
    want = bsi._predict_x(model, mu, jnp.ones((n,), jnp.float64))

    npt.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12)


def test_sample_history_consistent_with_sample():
    bsi = make_bsi(k=6, preconditioning="edm")
    rng = jax.random.key(7)
    mus, x_hats, ys = bsi.sample_history(identity_model, rng, 2, dtype=jnp.float64)
    assert mus.shape == (7, 2) + DATA_SHAPE
    assert x_hats.shape == (7, 2) + DATA_SHAPE
    assert ys.shape == (6, 2) + DATA_SHAPE
    final = bsi.sample(identity_model, rng, 2, dtype=jnp.float64)
    npt.assert_allclose(np.asarray(x_hats[-1]), np.asarray(final), rtol=1e-12)
    # Belief update identity must hold along the trajectory
    t = bsi.default_schedule(jnp.float64)
    lam = np.asarray(bsi.p_lambda.icdf(t))
    alpha = np.diff(lam)
    for i in range(6):
        want = (alpha[i] * np.asarray(ys[i]) + lam[i] * np.asarray(mus[i])) / lam[i + 1]
        npt.assert_allclose(np.asarray(mus[i + 1]), want, rtol=1e-9)


def test_perfect_model_has_tiny_bpd():
    """A model that decodes x exactly should achieve near-zero bits per dim."""
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, size=(8,) + DATA_SHAPE)
    )
    x = Discretization.image_8bit().bin_centers(jnp.float64)[
        Discretization.image_8bit().bucketize(x)
    ]
    bsi = make_bsi(discretization=Discretization.image_8bit())

    def perfect_model(mu, t):
        reps = mu.shape[0] // x.shape[0]
        return jnp.tile(x, (reps,) + (1,) * (x.ndim - 1))

    elbo, bpd, extra = bsi.elbo(perfect_model, jax.random.key(0), x, 4, 4)
    assert bpd.shape == (8,)
    assert float(jnp.abs(bpd).max()) < 0.01


def test_inf_measurement_loss_matches_quadrature():
    """For the identity model the expected loss has a closed-form integrand.

    E_mu[ (x - mu)^2 ] = (lambda_0 * x / lambda)^2 + 1/lambda, so
    E[loss] = E_lambda[ 0.5 / p(lambda) * sum_d ((lambda_0 x_d / lambda)^2 + 1/lambda) ]
            = integral over lambda of 0.5 * sum_d (...) d lambda.
    """
    from scipy.integrate import quad

    bsi = make_bsi()
    rng_data = np.random.default_rng(3)
    x_np = rng_data.uniform(-1, 1, size=(4,) + DATA_SHAPE)
    x = jnp.asarray(x_np)

    lam0, lamM = bsi.lambda_0, bsi.lambda_0 + bsi.alpha_M
    want = np.empty(4)
    for b in range(4):
        sq = np.sum(x_np[b] ** 2)
        integrand = lambda lam: 0.5 * ((lam0 / lam) ** 2 * sq + len(x_np[b]) / lam)
        want[b], _ = quad(integrand, lam0, lamM, limit=400)

    n = 20000
    loss = bsi.inf_measurement_loss(identity_model, jax.random.key(11), x, n)
    got = np.asarray(loss.mean(axis=0))
    se = np.asarray(loss.std(axis=0, ddof=1)) / math.sqrt(n)
    # 5-sigma statistical tolerance
    assert np.all(np.abs(got - want) < 5 * se + 1e-9), (got, want, se)


def test_elbo_statistical_parity_with_reference():
    """Full-ELBO parity with the executed torch reference, within MC error."""
    torch = pytest.importorskip("torch")
    from bsi.bsi import BSI as RefBSI
    from bsi.bsi import Discretization as RefDiscretization

    x_np = np.random.default_rng(5).uniform(-0.99, 0.99, size=(4,) + DATA_SHAPE)
    # snap to bin centers so discretized likelihoods are well-conditioned
    d = Discretization.image_8bit()
    x_np = np.asarray(d.bin_centers(jnp.float64))[np.asarray(d.bucketize(jnp.asarray(x_np)))]

    ours = make_bsi(preconditioning="edm", discretization=d)
    n = 8192
    elbo_j, bpd_j, extra_j = ours.elbo(identity_model, jax.random.key(1), jnp.asarray(x_np), n, n, estimate_var=True)

    class Identity(torch.nn.Module):
        def forward(self, mu, t):
            return mu

    ref = RefBSI(
        Identity(),
        data_shape=DATA_SHAPE,
        lambda_0=1e-2,
        alpha_M=1e6,
        alpha_R=2e6,
        k=50,
        preconditioning="edm",
        discretization=RefDiscretization.image_8bit(),
    ).double()
    gen = torch.Generator().manual_seed(123)
    elbo_t, bpd_t, extra_t = ref.elbo(
        torch.tensor(x_np), n, n, gen, estimate_var=True
    )

    sigma = np.sqrt(np.asarray(extra_j["bpd_var"]) + extra_t["bpd_var"].numpy())
    diff = np.abs(np.asarray(bpd_j) - bpd_t.numpy())
    assert np.all(diff < 6 * sigma + 1e-6), (diff, sigma)


def test_finite_elbo_approaches_inf_elbo():
    bsi = make_bsi(preconditioning="edm", discretization=Discretization.image_8bit())
    x = jnp.asarray(np.random.default_rng(9).uniform(-1, 1, size=(4,) + DATA_SHAPE))
    n = 4096
    _, bpd_inf, ex_i = bsi.elbo(identity_model, jax.random.key(2), x, n, n, estimate_var=True)
    t = jnp.linspace(0.0, 1.0, 2001, dtype=jnp.float64)
    _, bpd_fin, ex_f = bsi.finite_elbo(
        identity_model, jax.random.key(3), x, n, n, t=t, estimate_var=True
    )
    sigma = np.sqrt(np.asarray(ex_i["bpd_var"]) + np.asarray(ex_f["bpd_var"]))
    # finite-k ELBO is a lower bound approaching the continuous one from above
    # in loss (below in elbo); with k=2000 they should be statistically close
    assert np.all(np.abs(np.asarray(bpd_inf - bpd_fin)) < 6 * sigma + 5e-3)


def test_train_loss_shape_and_finite():
    bsi = make_bsi(preconditioning="edm")
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, size=(16,) + DATA_SHAPE))
    loss = bsi.train_loss(identity_model, jax.random.key(0), x)
    assert loss.shape == (16,)
    assert bool(jnp.isfinite(loss).all())
    # jit-compiles cleanly
    jitted = jax.jit(lambda r, x: bsi.train_loss(identity_model, r, x))
    loss2 = jitted(jax.random.key(0), x)
    npt.assert_allclose(np.asarray(loss), np.asarray(loss2), rtol=1e-10)


def test_lds_sampling_stratification():
    t = sample_lds_t(jax.random.key(0), 4, 64, dtype=jnp.float64)
    assert t.shape == (4, 64)
    flat = np.sort(np.asarray(t).reshape(-1))
    total = flat.size
    # Stratified: consecutive order statistics are one grid cell apart (the
    # grid i/(1+total) for i < total leaves one double-width gap at the wrap)
    gaps = np.diff(flat)
    assert np.all(gaps <= 2.0 / (1 + total) + 1e-12)
    assert np.sum(gaps > 1.0 / (1 + total) + 1e-12) <= 1
    # Non-LDS branch returns the fixed (n, batch) shape
    t2 = sample_lds_t(jax.random.key(0), 4, 64, low_discrepancy=False, dtype=jnp.float64)
    assert t2.shape == (4, 64)


def test_sample_q_mu_lambda_moments():
    bsi = make_bsi()
    x = jnp.asarray(np.full((2,) + DATA_SHAPE, 0.5))
    lam = jnp.full((5000, 2), 100.0, jnp.float64)
    mu = bsi._sample_q_mu_lambda(jax.random.key(4), x, lam)
    assert mu.shape == (5000, 2) + DATA_SHAPE
    want_mean = (100.0 - bsi.lambda_0) / 100.0 * 0.5
    npt.assert_allclose(np.asarray(mu.mean(axis=0)), want_mean, atol=4 * 0.1 / math.sqrt(5000))
    npt.assert_allclose(np.asarray(mu.std(axis=0)), 0.1, rtol=0.1)
