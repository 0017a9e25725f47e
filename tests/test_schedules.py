"""Tests for the lambda-variance-space sampling schedules."""

import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from bsi_tpu.core import BSI, VDM, get_schedule


@pytest.fixture(scope="module")
def bsi():
    return BSI(data_shape=(4,), lambda_0=1e-2, alpha_M=1e6, alpha_R=2e6, k=50)


def test_linear_schedules(bsi):
    t = np.asarray(get_schedule("linear", 10, bsi, dtype=jnp.float64))
    npt.assert_allclose(t, np.linspace(0, 1, 11))
    vdm = VDM(data_shape=(4,), snr_min=1e-2, snr_max=1e5)
    t = np.asarray(get_schedule("linear", 10, vdm, dtype=jnp.float64))
    npt.assert_allclose(t, np.linspace(1, 0, 11))


@pytest.mark.parametrize("name", ["cosine", "edm", "edm7"])
def test_variance_schedules_match_reference_formula(bsi, name):
    """Transcription of the reference formulas (scripts/eval_fid.py:52-87)
    as an independent oracle."""
    k = 20
    got = np.asarray(get_schedule(name, k, bsi, dtype=jnp.float64))

    max_var = 1 / bsi.lambda_0
    min_var = 1 / (bsi.lambda_0 + bsi.alpha_M)
    if name == "cosine":
        variance = (max_var - min_var) * np.cos(np.linspace(0, 1, k) * np.pi / 2) ** 2 + min_var
    elif name == "edm":
        variance = np.linspace(np.sqrt(max_var), np.sqrt(min_var), k) ** 2
    else:
        t = np.linspace(0, 1, k)
        rho = 7
        stds = (max_var**0.5) ** (1 / rho) + t * (
            (min_var**0.5) ** (1 / rho) - (max_var**0.5) ** (1 / rho)
        )
        variance = (stds**rho) ** 2
    want = np.asarray(bsi.p_lambda.cdf(jnp.asarray(1 / variance)))

    assert got.shape == (k,)  # variance schedules return k points (reference semantics)
    npt.assert_allclose(got, want, rtol=1e-10)
    # monotonically increasing in t, i.e. decreasing variance
    assert np.all(np.diff(got) > 0)
    npt.assert_allclose(got[0], 0.0, atol=1e-9)
    npt.assert_allclose(got[-1], 1.0, atol=1e-9)


def test_variance_schedule_rejected_for_vdm():
    vdm = VDM(data_shape=(4,), snr_min=1e-2, snr_max=1e5)
    with pytest.raises(ValueError):
        get_schedule("cosine", 10, vdm)


def test_unknown_schedule_rejected(bsi):
    with pytest.raises(ValueError):
        get_schedule("quadratic", 10, bsi)


def test_schedules_drive_sampler(bsi):
    import jax

    model = lambda mu, t: jnp.tanh(mu)
    for name in ("cosine", "edm", "edm7"):
        t = get_schedule(name, 8, bsi)
        s = bsi.sample(model, jax.random.key(0), 2, t=t)
        assert s.shape == (2, 4)
        assert bool(jnp.isfinite(s).all())


def test_mu_dtype_bf16_optimizer():
    """optimizer.mu_dtype stores the Adam first moment in bf16 (state-memory
    lever for large models) while keeping params/updates f32."""
    import jax
    import jax.numpy as jnp
    import optax

    from bsi_tpu.train import make_optimizer

    tx = make_optimizer(1e-3, mu_dtype="bfloat16")
    params = {"w": jnp.ones((8, 8), jnp.float32)}
    state = tx.init(params)
    adam_state = [s for s in jax.tree.leaves(state) if hasattr(s, "dtype")]
    assert any(s.dtype == jnp.bfloat16 for s in adam_state), [s.dtype for s in adam_state]
    grads = {"w": jnp.full((8, 8), 0.1, jnp.float32)}
    updates, state = tx.update(grads, state, params)
    new_params = optax.apply_updates(params, updates)
    assert jax.tree.leaves(new_params)[0].dtype == jnp.float32


def test_scale_by_adam_cast_matches_optax_at_f32():
    """With both dtypes None, scale_by_adam_cast is numerically identical to
    optax.scale_by_adam over a multi-step trajectory."""
    import jax
    import jax.numpy as jnp
    import numpy.testing as npt
    import optax

    from bsi_tpu.train.optim import scale_by_adam_cast

    params = {"w": jnp.linspace(-1, 1, 16).reshape(4, 4), "b": jnp.ones(4)}
    ours, ref = scale_by_adam_cast(), optax.scale_by_adam()
    s_o, s_r = ours.init(params), ref.init(params)
    key = jax.random.key(0)
    for i in range(5):
        key, sub = jax.random.split(key)
        grads = jax.tree.map(
            lambda p: jax.random.normal(sub, p.shape, p.dtype), params
        )
        u_o, s_o = ours.update(grads, s_o)
        u_r, s_r = ref.update(grads, s_r)
        for a, b in zip(jax.tree.leaves(u_o), jax.tree.leaves(u_r)):
            npt.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_nu_dtype_bf16_optimizer():
    """optimizer.nu_dtype stores the Adam second moment in bf16; the update
    direction stays within bf16-rounding distance of the f32 optimizer and
    params stay f32."""
    import jax
    import jax.numpy as jnp
    import numpy.testing as npt
    import optax

    from bsi_tpu.train import make_optimizer

    params = {"w": jnp.ones((8, 8), jnp.float32)}
    grads = {"w": jnp.full((8, 8), 0.1, jnp.float32)}

    tx = make_optimizer(1e-3, mu_dtype="bfloat16", nu_dtype="bfloat16")
    state = tx.init(params)
    adam = [s for s in jax.tree.leaves(state) if hasattr(s, "dtype")]
    assert sum(s.dtype == jnp.bfloat16 for s in adam) >= 2, [s.dtype for s in adam]

    tx32 = make_optimizer(1e-3)
    state32 = tx32.init(params)
    p_bf, p_32 = params, params
    for _ in range(3):
        u, state = tx.update(grads, state, p_bf)
        p_bf = optax.apply_updates(p_bf, u)
        u32, state32 = tx32.update(grads, state32, p_32)
        p_32 = optax.apply_updates(p_32, u32)
    assert p_bf["w"].dtype == jnp.float32
    # preconditioner jitter from the bf16 nu is bounded by its 2^-9 mantissa
    npt.assert_allclose(p_bf["w"], p_32["w"], rtol=3e-3, atol=3e-6)
