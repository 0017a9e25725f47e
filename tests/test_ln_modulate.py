"""Fused LayerNorm+modulate kernel: math, VJP, and dispatch (ops/ln_modulate).

Kernel bodies run under Pallas interpret mode on CPU; the public entry's XLA
fallback is checked against an independent flax-LayerNorm composition, and
the custom VJP against autodiff of that composition.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from bsi_tpu.ops import layernorm_modulate
from bsi_tpu.ops.ln_modulate import _bwd_pallas, _fwd_pallas

B, S, D = 4, 16, 128


def _inputs(dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, S, D)) * 2 + 0.5, dtype)
    shift = jnp.asarray(rng.normal(size=(B, D)), dtype)
    scale = jnp.asarray(rng.normal(size=(B, D)) * 0.1, dtype)
    return x, shift, scale


def _flax_reference(x, shift, scale):
    norm = nn.LayerNorm(use_scale=False, use_bias=False)
    normed = norm.apply({"params": {}}, x)
    return shift[:, None, :] + (scale[:, None, :] + 1.0) * normed


def test_fwd_kernel_matches_flax_layernorm():
    x, shift, scale = _inputs()
    got = _fwd_pallas(x, shift, scale, interpret=True)
    want = _flax_reference(x, shift, scale)
    npt.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_bwd_kernel_matches_autodiff():
    x, shift, scale = _inputs(seed=1)
    g = jnp.asarray(np.random.default_rng(2).normal(size=(B, S, D)), jnp.float32)

    _, pullback = jax.vjp(_flax_reference, x, shift, scale)
    dx_w, dshift_w, dscale_w = pullback(g)
    dx, dshift, dscale = _bwd_pallas(x, scale, g, interpret=True)

    npt.assert_allclose(np.asarray(dx), np.asarray(dx_w), atol=2e-5)
    npt.assert_allclose(np.asarray(dshift), np.asarray(dshift_w), atol=2e-5)
    npt.assert_allclose(np.asarray(dscale), np.asarray(dscale_w), atol=2e-5)


def test_public_entry_value_and_grad():
    # On CPU the public entry takes the XLA fallback; its custom VJP must
    # match autodiff of the flax composition exactly
    x, shift, scale = _inputs(seed=3)

    def loss_ours(x, shift, scale):
        return (layernorm_modulate(x, shift, scale) ** 2).sum()

    def loss_ref(x, shift, scale):
        return (_flax_reference(x, shift, scale) ** 2).sum()

    v1, g1 = jax.value_and_grad(loss_ours, argnums=(0, 1, 2))(x, shift, scale)
    v2, g2 = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(x, shift, scale)
    npt.assert_allclose(float(v1), float(v2), rtol=1e-6)
    for a, b in zip(g1, g2):
        npt.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_grouped_grid_covers_all_batches():
    # batch 8 exercises group > 1 in the kernel's static inner loop
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(8, 8, 128)), jnp.float32)
    shift = jnp.asarray(rng.normal(size=(8, 128)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(8, 128)), jnp.float32)
    got = _fwd_pallas(x, shift, scale, interpret=True)
    want = _flax_reference(x, shift, scale)
    npt.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
