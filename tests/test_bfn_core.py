"""Numerics tests for the BFN baseline core."""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from bsi_tpu.core import BFN, Discretization

DATA_SHAPE = (4,)


def make_bfn(**kwargs):
    defaults = dict(data_shape=DATA_SHAPE, sigma_1=1e-3, k=50, discretization=None)
    defaults.update(kwargs)
    return BFN(**defaults)


def make_ref(torch, discretization=None):
    from bsi.bfn import BFN as RefBFN

    class EpsModel(torch.nn.Module):
        def forward(self, mu, t):
            return torch.tanh(mu)

    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.double)
    try:
        return RefBFN(
            EpsModel(),
            data_shape=DATA_SHAPE,
            sigma_1=1e-3,
            k=50,
            discretization=discretization,
        )
    finally:
        torch.set_default_dtype(prev)


def eps_model(mu, t):
    return jnp.tanh(mu)


def test_sigma_1_validation():
    with pytest.raises(ValueError):
        make_bfn(sigma_1=1.5)


def test_predict_x_parity_with_reference():
    torch = pytest.importorskip("torch")
    ref = make_ref(torch)
    bfn = make_bfn()
    rng = np.random.default_rng(1)
    mu = rng.normal(size=(8,) + DATA_SHAPE)
    # include t below t_min and t=1 extremes
    t = np.array([0.0, 1e-7, 1e-5, 0.1, 0.3, 0.5, 0.9, 1.0])
    ours = np.asarray(bfn._predict_x(eps_model, jnp.asarray(mu), jnp.asarray(t)))
    theirs = ref._predict_x(torch.tensor(mu), torch.tensor(t)).numpy()
    npt.assert_allclose(ours, theirs, rtol=1e-9, atol=1e-12)


def test_flow_distribution_moments():
    bfn = make_bfn()
    x = jnp.asarray(np.full((2,) + DATA_SHAPE, 0.5))
    t = jnp.full((4000, 2), 0.5, jnp.float64)
    mu = bfn._sample_flow_distribution(jax.random.key(0), x, t)
    gamma = 1 - 1e-3 ** (2 * 0.5)
    npt.assert_allclose(np.asarray(mu.mean(axis=0)), gamma * 0.5, atol=5e-3)
    npt.assert_allclose(
        np.asarray(mu.std(axis=0)), np.sqrt(gamma * (1 - gamma)), rtol=0.1
    )


def test_elbo_statistical_parity_with_reference():
    torch = pytest.importorskip("torch")
    from bsi.bsi import Discretization as RefDiscretization

    d = Discretization.image_8bit()
    x_np = np.random.default_rng(5).uniform(-0.99, 0.99, size=(4,) + DATA_SHAPE)
    x_np = np.asarray(d.bin_centers(jnp.float64))[np.asarray(d.bucketize(jnp.asarray(x_np)))]

    ours = make_bfn(discretization=d)
    n = 8192
    _, bpd_j, extra_j = ours.elbo(
        eps_model, jax.random.key(1), jnp.asarray(x_np), n, n, estimate_var=True
    )

    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.double)
    try:
        ref = make_ref(torch, discretization=RefDiscretization.image_8bit())
        gen = torch.Generator().manual_seed(77)
        _, bpd_t, extra_t = ref.elbo(torch.tensor(x_np), n, n, gen, estimate_var=True)
    finally:
        torch.set_default_dtype(prev)

    sigma = np.sqrt(np.asarray(extra_j["bpd_var"]) + extra_t["bpd_var"].numpy())
    diff = np.abs(np.asarray(bpd_j) - bpd_t.numpy())
    assert np.all(diff < 6 * sigma + 1e-6), (diff, sigma)


def test_discrete_time_loss_default_schedule_works():
    """The reference crashes on t=None (bsi/bfn.py:165 calls self.linspace);
    our implementation must handle the default schedule."""
    bfn = make_bfn()
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, size=(8,) + DATA_SHAPE))
    loss = bfn.discrete_time_loss(eps_model, jax.random.key(0), x, 3)
    assert loss.shape == (3, 8)
    assert bool(jnp.isfinite(loss).all())


def test_finite_elbo_approaches_inf_elbo():
    bfn = make_bfn(discretization=Discretization.image_8bit())
    x = jnp.asarray(np.random.default_rng(9).uniform(-1, 1, size=(4,) + DATA_SHAPE))
    n = 4096
    _, bpd_inf, ex_i = bfn.elbo(eps_model, jax.random.key(2), x, n, n, estimate_var=True)
    t = jnp.linspace(0.0, 1.0, 2001, dtype=jnp.float64)
    _, bpd_fin, ex_f = bfn.finite_elbo(
        eps_model, jax.random.key(3), x, n, n, t=t, estimate_var=True
    )
    sigma = np.sqrt(np.asarray(ex_i["bpd_var"]) + np.asarray(ex_f["bpd_var"]))
    assert np.all(np.abs(np.asarray(bpd_inf - bpd_fin)) < 6 * sigma + 5e-3)


def test_sample_scan_matches_python_loop():
    bfn = make_bfn(k=6)
    rng = jax.random.key(3)
    n = 2
    got = bfn.sample(eps_model, rng, n, dtype=jnp.float64)

    t = bfn.default_schedule(jnp.float64)
    mu = jnp.zeros((n,) + DATA_SHAPE, jnp.float64)
    rho = 1.0
    keys = jax.random.split(rng, bfn.k)
    s1 = bfn.sigma_1
    for i in range(bfn.k):
        x_hat = bfn._predict_x(eps_model, mu, jnp.full((n,), t[i], jnp.float64))
        alpha = s1 ** (-2 * t[i + 1]) * (1 - s1 ** (2 * (t[i + 1] - t[i])))
        y = x_hat + jax.lax.rsqrt(alpha) * jax.random.normal(
            keys[i], (n,) + DATA_SHAPE, jnp.float64
        )
        mu = (rho * mu + alpha * y) / (rho + alpha)
        rho = rho + alpha
    want = bfn._predict_x(eps_model, mu, jnp.ones((n,), jnp.float64))
    npt.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-10)


def test_sample_history_consistency():
    bfn = make_bfn(k=5)
    mus, x_hats, ys = bfn.sample_history(eps_model, jax.random.key(0), 3, dtype=jnp.float64)
    assert mus.shape == (6, 3) + DATA_SHAPE
    assert x_hats.shape == (6, 3) + DATA_SHAPE
    assert ys.shape == (5, 3) + DATA_SHAPE
    final = bfn.sample(eps_model, jax.random.key(0), 3, dtype=jnp.float64)
    npt.assert_allclose(np.asarray(x_hats[-1]), np.asarray(final), rtol=1e-12)


def test_train_loss_shape_and_jit():
    bfn = make_bfn()
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, size=(16,) + DATA_SHAPE))
    loss = jax.jit(lambda r, x: bfn.train_loss(eps_model, r, x))(jax.random.key(0), x)
    assert loss.shape == (16,)
    assert bool(jnp.isfinite(loss).all())
