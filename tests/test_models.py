"""Tests for the denoiser models: shapes, jit, dropout rng, and exact
parameter-count parity with the torch reference architectures."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bsi_tpu.models import DenoisingDiT, DenoisingMLP, DenoisingVDMUNet
from bsi_tpu.nn import FourierFeatures, NyquistPositionalEmbedding

H = W = 8
C = 3
DATA_SHAPE = (H, W, C)  # NHWC (reference uses (C, H, W))


def n_params(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def torch_n_params(module):
    return sum(p.numel() for p in module.parameters())


@pytest.fixture(scope="module")
def ff():
    return FourierFeatures(n_min=6, n_max=8)


def test_dit_shapes_and_param_parity(ff):
    torch = pytest.importorskip("torch")
    from bsi.models.dit import DenoisingDiT as RefDiT
    from bsi.nn import FourierFeatures as RefFF

    model = DenoisingDiT(
        data_shape=DATA_SHAPE, patch_size=2, dim=64, depth=2, heads=2,
        dropout=0.1, fourier_features=ff,
    )
    mu = jnp.zeros((4,) + DATA_SHAPE)
    t = jnp.linspace(0, 1, 4)
    params = model.init(jax.random.key(0), mu, t)
    out = model.apply(params, mu, t)
    assert out.shape == (4,) + DATA_SHAPE

    ref = RefDiT(
        data_shape=(C, H, W), patch_size=2, dim=64, depth=2, heads=2,
        dropout=0.1, fourier_features=RefFF(n_min=6, n_max=8),
    )
    assert n_params(params) == torch_n_params(ref)

    # dropout path needs an rng and gives different outputs across keys.
    # Perturb the params first: adaLN-Zero gates are 0 at init, which would
    # mask the dropped activations entirely.
    perturbed = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(jax.random.key(7), p.shape, p.dtype),
        params,
    )
    mu_r = jax.random.normal(jax.random.key(8), mu.shape)
    out1 = model.apply(perturbed, mu_r, t, deterministic=False, rngs={"dropout": jax.random.key(1)})
    out2 = model.apply(perturbed, mu_r, t, deterministic=False, rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_unet_shapes_and_param_parity(ff):
    torch = pytest.importorskip("torch")
    from bsi.models.pos_emb import NyquistPositionalEmbedding as RefEmb
    from bsi.models.vdm_unet import DenoisingVDMUNet as RefUNet
    from bsi.nn import FourierFeatures as RefFF

    pos_emb = NyquistPositionalEmbedding(32, 100)
    model = DenoisingVDMUNet(
        data_shape=DATA_SHAPE, pos_emb=pos_emb, actfn="silu", dim=64, levels=3,
        pos_emb_mult=4, dropout=0.1, fourier_features=ff,
    )
    mu = jnp.zeros((2,) + DATA_SHAPE)
    t = jnp.linspace(0, 1, 2)
    params = model.init(jax.random.key(0), mu, t)
    out = model.apply(params, mu, t)
    assert out.shape == (2,) + DATA_SHAPE

    ref = RefUNet(
        data_shape=(C, H, W), pos_emb=RefEmb(32, 100), actfn="silu", dim=64,
        levels=3, pos_emb_mult=4, dropout=0.1, fourier_features=RefFF(n_min=6, n_max=8),
    )
    assert n_params(params) == torch_n_params(ref)


def test_mlp_shapes_and_param_parity(ff):
    torch = pytest.importorskip("torch")
    from bsi.models.mlp import DenoisingMLP as RefMLP
    from bsi.models.pos_emb import NyquistPositionalEmbedding as RefEmb
    from bsi.nn import FourierFeatures as RefFF

    pos_emb = NyquistPositionalEmbedding(32, 100)
    model = DenoisingMLP(
        data_shape=DATA_SHAPE, pos_emb=pos_emb, hidden_width=128, layers=2,
        actfn="silu", zero_init=True, fourier_features=ff,
    )
    mu = jnp.ones((2,) + DATA_SHAPE)
    t = jnp.linspace(0, 1, 2)
    params = model.init(jax.random.key(0), mu, t)
    out = model.apply(params, mu, t)
    assert out.shape == (2,) + DATA_SHAPE
    # zero_init makes the initial output exactly zero
    assert np.allclose(np.asarray(out), 0.0)

    ref = RefMLP(
        data_shape=(C, H, W), pos_emb=RefEmb(32, 100), hidden_width=128, layers=2,
        actfn="silu", zero_init=True, fourier_features=RefFF(n_min=6, n_max=8),
    )
    assert n_params(params) == torch_n_params(ref)


def test_dit_jit_and_grad(ff):
    model = DenoisingDiT(
        data_shape=DATA_SHAPE, patch_size=2, dim=32, depth=1, heads=2,
        fourier_features=ff,
    )
    mu = jnp.ones((2,) + DATA_SHAPE)
    t = jnp.linspace(0, 1, 2)
    params = model.init(jax.random.key(0), mu, t)

    @jax.jit
    def loss(p):
        return (model.apply(p, mu, t) ** 2).mean()

    g = jax.grad(loss)(params)
    flat = jax.tree.leaves(g)
    assert all(bool(jnp.isfinite(x).all()) for x in flat)
    # adaLN-Zero: blocks start as identity, so gradients flow to the decoder
    assert float(loss(params)) >= 0.0


def test_unet_jit_forward(ff):
    pos_emb = NyquistPositionalEmbedding(32, 100)
    model = DenoisingVDMUNet(
        data_shape=DATA_SHAPE, pos_emb=pos_emb, dim=32, levels=2, fourier_features=ff
    )
    mu = jnp.ones((2,) + DATA_SHAPE)
    t = jnp.linspace(0, 1, 2)
    params = model.init(jax.random.key(0), mu, t)
    out = jax.jit(lambda p, m, tt: model.apply(p, m, tt))(params, mu, t)
    assert out.shape == (2,) + DATA_SHAPE
    assert bool(jnp.isfinite(out).all())
