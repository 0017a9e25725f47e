"""Numerics tests for the VDM baseline core."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from bsi_tpu.core import VDM, Discretization

DATA_SHAPE = (4,)
SNR_MIN = 6.73794699909e-3
SNR_MAX = 597195.613793


def make_vdm(**kwargs):
    defaults = dict(
        data_shape=DATA_SHAPE,
        snr_min=SNR_MIN,
        snr_max=SNR_MAX,
        k=50,
        discretization=None,
    )
    defaults.update(kwargs)
    return VDM(**defaults)


def make_ref(torch, discretization=None):
    from bsi.vdm import VDM as RefVDM

    class EpsIdentity(torch.nn.Module):
        def forward(self, z, t):
            return z

    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.double)
    try:
        return RefVDM(
            EpsIdentity(),
            data_shape=DATA_SHAPE,
            snr_min=SNR_MIN,
            snr_max=SNR_MAX,
            k=50,
            discretization=discretization,
        )
    finally:
        torch.set_default_dtype(prev)


def eps_identity(z, t):
    return z


def test_schedule_parity_with_reference():
    torch = pytest.importorskip("torch")
    ref = make_ref(torch)
    vdm = make_vdm()
    t = np.linspace(0, 1, 41)
    tt = torch.tensor(t)
    npt.assert_allclose(np.asarray(vdm.gamma(jnp.asarray(t))), ref.gamma(tt).numpy(), rtol=1e-12)
    npt.assert_allclose(np.asarray(vdm.sigma2(jnp.asarray(t))), ref.sigma2(tt).numpy(), rtol=1e-12)
    npt.assert_allclose(np.asarray(vdm.alpha(jnp.asarray(t))), ref.alpha(tt).numpy(), rtol=1e-12)
    npt.assert_allclose(np.asarray(vdm.snr(jnp.asarray(t))), ref.snr(tt).numpy(), rtol=1e-10)


def test_prior_loss_parity_with_reference():
    torch = pytest.importorskip("torch")
    ref = make_ref(torch)
    vdm = make_vdm()
    x = np.random.default_rng(0).uniform(-1, 1, size=(8,) + DATA_SHAPE)
    ours = np.asarray(vdm.prior_loss(jnp.asarray(x)))
    theirs = ref.prior_loss(torch.tensor(x)).numpy()
    npt.assert_allclose(ours, theirs, rtol=1e-10)


def test_predict_x_parity_with_reference():
    torch = pytest.importorskip("torch")
    ref = make_ref(torch)
    vdm = make_vdm()
    rng = np.random.default_rng(1)
    z = rng.normal(size=(8,) + DATA_SHAPE)
    t = rng.uniform(0, 1, size=(8,))
    ours = np.asarray(vdm._predict_x(eps_identity, jnp.asarray(z), jnp.asarray(t)))
    theirs = ref._predict_x(torch.tensor(z), torch.tensor(t)).numpy()
    npt.assert_allclose(ours, theirs, rtol=1e-9)


def test_ancestral_step_mean_std_parity():
    """Compare one ancestral step against the reference with the noise removed.

    Both implementations compute mean + std * eps; evaluating the reference
    twice with two known eps values recovers its mean and std exactly.
    """
    torch = pytest.importorskip("torch")
    ref = make_ref(torch)
    vdm = make_vdm()
    rng = np.random.default_rng(2)
    n = 6
    z_t = rng.normal(size=(n,) + DATA_SHAPE)
    x = rng.uniform(-1, 1, size=(n,) + DATA_SHAPE)
    t = np.full((n,), 0.7)
    s = np.full((n,), 0.65)

    class FixedGen:
        pass

    # Reference: run with eps forced to 0 and to 1 via monkeypatched randn
    orig_randn = torch.randn

    def randn_zero(*args, **kwargs):
        kwargs.pop("generator", None)
        return torch.zeros(*args[:1], **kwargs) if False else torch.zeros(args[0], **kwargs)

    ts, ss, zs, xs = map(torch.tensor, (t, s, z_t, x))
    try:
        torch.randn = lambda shape, **kw: torch.zeros(shape, dtype=kw.get("dtype", torch.double))
        ref_mean = ref._sample_zs_given_zt_x(ss, zs, ts, xs).numpy()
        torch.randn = lambda shape, **kw: torch.ones(shape, dtype=kw.get("dtype", torch.double))
        ref_mean_plus_std = ref._sample_zs_given_zt_x(ss, zs, ts, xs).numpy()
    finally:
        torch.randn = orig_randn
    ref_std = ref_mean_plus_std - ref_mean

    # Ours: mean/std recovered the same way by fixing the normal draw
    import bsi_tpu.core.vdm as vdm_mod

    orig_normal = jax.random.normal
    try:
        jax.random.normal = lambda key, shape, dtype=jnp.float64: jnp.zeros(shape, dtype)
        our_mean = np.asarray(
            vdm._sample_zs_given_zt_x(jax.random.key(0), jnp.asarray(s), jnp.asarray(z_t), jnp.asarray(t), jnp.asarray(x))
        )
        jax.random.normal = lambda key, shape, dtype=jnp.float64: jnp.ones(shape, dtype)
        our_mean_plus_std = np.asarray(
            vdm._sample_zs_given_zt_x(jax.random.key(0), jnp.asarray(s), jnp.asarray(z_t), jnp.asarray(t), jnp.asarray(x))
        )
    finally:
        jax.random.normal = orig_normal

    npt.assert_allclose(our_mean, ref_mean, rtol=1e-9)
    npt.assert_allclose(our_mean_plus_std - our_mean, ref_std, rtol=1e-9)


def test_elbo_statistical_parity_with_reference():
    torch = pytest.importorskip("torch")
    from bsi.bsi import Discretization as RefDiscretization

    d = Discretization.image_8bit()
    x_np = np.random.default_rng(5).uniform(-0.99, 0.99, size=(4,) + DATA_SHAPE)
    x_np = np.asarray(d.bin_centers(jnp.float64))[np.asarray(d.bucketize(jnp.asarray(x_np)))]

    ours = make_vdm(discretization=d)
    n = 8192
    _, bpd_j, extra_j = ours.elbo(
        eps_identity, jax.random.key(1), jnp.asarray(x_np), n, n, estimate_var=True
    )

    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.double)
    try:
        ref = make_ref(torch, discretization=RefDiscretization.image_8bit())
        gen = torch.Generator().manual_seed(99)
        _, bpd_t, extra_t = ref.elbo(torch.tensor(x_np), n, n, gen, estimate_var=True)
    finally:
        torch.set_default_dtype(prev)

    sigma = np.sqrt(np.asarray(extra_j["bpd_var"]) + extra_t["bpd_var"].numpy())
    diff = np.abs(np.asarray(bpd_j) - bpd_t.numpy())
    assert np.all(diff < 6 * sigma + 1e-6), (diff, sigma)


def test_sample_scan_matches_python_loop():
    vdm = make_vdm(k=6)

    def model(z, t):
        return jnp.tanh(z) * 0.9

    rng = jax.random.key(3)
    n = 2
    got = vdm.sample(model, rng, n, dtype=jnp.float64)

    ts = vdm.default_schedule(jnp.float64)
    rng0, rng_steps = jax.random.split(rng)
    z = jax.random.normal(rng0, (n,) + DATA_SHAPE, jnp.float64)
    keys = jax.random.split(rng_steps, vdm.k)
    for i in range(vdm.k):
        tb = jnp.full((n,), ts[i], jnp.float64)
        sb = jnp.full((n,), ts[i + 1], jnp.float64)
        x_hat = vdm._predict_x(model, z, tb)
        z = vdm._sample_zs_given_zt_x(keys[i], sb, z, tb, x_hat)
    want = z / vdm.alpha(jnp.zeros((), jnp.float64))
    npt.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12)


def test_sample_history_shape():
    vdm = make_vdm(k=5)
    hist = vdm.sample_history(eps_identity, jax.random.key(0), 3, dtype=jnp.float64)
    assert hist.shape == (6, 3) + DATA_SHAPE
    assert bool(jnp.isfinite(hist).all())


def test_train_loss_shape_and_jit():
    vdm = make_vdm()
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, size=(16,) + DATA_SHAPE))
    loss = jax.jit(lambda r, x: vdm.train_loss(eps_identity, r, x))(jax.random.key(0), x)
    assert loss.shape == (16,)
    assert bool(jnp.isfinite(loss).all())
