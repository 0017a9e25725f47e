"""Gradient support of the fused attention path (regression: the Pallas
kernel has no native reverse-mode rule — a custom VJP routes the backward
through the XLA formulation; caught on real TPU training)."""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

import importlib

# bsi_tpu.ops re-exports the flash_attention *function*, shadowing the
# submodule attribute; resolve the module explicitly
fa_mod = importlib.import_module("bsi_tpu.ops.flash_attention")
from bsi_tpu.ops.attention import _fused_attention, _xla_attention


def test_fused_attention_grad_matches_xla(monkeypatch):
    # Force the Pallas kernel to run in interpret mode so the fused forward
    # executes on CPU inside this test
    orig = fa_mod.flash_attention
    monkeypatch.setattr(
        fa_mod, "flash_attention", lambda q, k, v, **kw: orig(q, k, v, interpret=True)
    )

    rng = jax.random.key(0)
    kq, kk, kv = jax.random.split(rng, 3)
    shape = (2, 2, 128, 64)
    q = jax.random.normal(kq, shape)
    k = jax.random.normal(kk, shape)
    v = jax.random.normal(kv, shape)

    def loss_fused(q, k, v):
        return (_fused_attention(q, k, v) ** 2).sum()

    def loss_xla(q, k, v):
        return (_xla_attention(q, k, v) ** 2).sum()

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_xla):
        npt.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
