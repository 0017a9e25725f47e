"""Tests for nn building blocks: Fourier features, Nyquist embedding, attention."""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from bsi_tpu.nn import FourierFeatures, NyquistPositionalEmbedding
from bsi_tpu.ops import flash_attention
from bsi_tpu.ops.attention import _xla_attention


def test_fourier_features_values():
    ff = FourierFeatures(n_min=0, n_max=1)
    assert ff.n_features() == 4
    x = jnp.asarray([[0.25, 0.5]], dtype=jnp.float64)
    out = np.asarray(ff(x))
    # ordering: (channel, frequency n, phase)
    two_pi = 2 * np.pi
    want = []
    for c in [0.25, 0.5]:
        for n in [0, 1]:
            arg = two_pi * (2**n) * c
            want += [np.sin(arg), np.cos(arg)]
    npt.assert_allclose(out[0], want, atol=1e-12)
    assert out.shape == (1, 2 * ff.n_features())


def test_fourier_features_parity_with_reference():
    torch = pytest.importorskip("torch")
    from bsi.nn import FourierFeatures as RefFF

    ff = FourierFeatures(n_min=6, n_max=8)
    ref = RefFF(n_min=6, n_max=8)
    assert ff.n_features() == ref.n_features()

    x = np.random.default_rng(0).uniform(-1, 1, size=(2, 5)).astype(np.float64)
    ours = np.asarray(ff(jnp.asarray(x)))
    # both use (channel, frequency, phase) ordering when applied at dim=1.
    # The reference's frequency constants are f32-rounded; at arguments up to
    # 2*pi*2^8 that rounding shifts the phase by ~1e-4 rad, hence the tolerance.
    theirs = ref(torch.tensor(x), dim=1).numpy()
    npt.assert_allclose(ours, theirs, atol=3e-4)


def test_nyquist_embedding_parity_with_reference():
    torch = pytest.importorskip("torch")
    from bsi.models.pos_emb import NyquistPositionalEmbedding as RefEmb

    emb = NyquistPositionalEmbedding(32, 100)
    ref = RefEmb(32, 100)
    t = np.linspace(0, 1, 17)
    ours = np.asarray(emb(jnp.asarray(t, dtype=jnp.float32)))
    theirs = ref(torch.tensor(t, dtype=torch.float32)).numpy()
    npt.assert_allclose(ours, theirs, atol=1e-5)
    assert ours.shape == (17, 32)


def test_nyquist_embedding_size_validation():
    with pytest.raises(ValueError):
        NyquistPositionalEmbedding(33, 100)


@pytest.mark.parametrize("seq,d", [(128, 64), (256, 128)])
def test_flash_attention_matches_xla(seq, d):
    rng = jax.random.key(0)
    kq, kk, kv = jax.random.split(rng, 3)
    shape = (2, 3, seq, d)
    q = jax.random.normal(kq, shape, jnp.float32)
    k = jax.random.normal(kk, shape, jnp.float32)
    v = jax.random.normal(kv, shape, jnp.float32)
    want = _xla_attention(q, k, v)
    got = flash_attention(q, k, v, interpret=True)
    npt.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_xla_attention_parity_with_torch_sdpa():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    q = rng.normal(size=(2, 4, 16, 8)).astype(np.float32)
    k = rng.normal(size=(2, 4, 16, 8)).astype(np.float32)
    v = rng.normal(size=(2, 4, 16, 8)).astype(np.float32)
    want = torch.nn.functional.scaled_dot_product_attention(
        torch.tensor(q), torch.tensor(k), torch.tensor(v)
    ).numpy()
    got = np.asarray(_xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    npt.assert_allclose(got, want, atol=2e-6)


def test_attention_dropout_requires_rng():
    q = jnp.zeros((1, 1, 4, 8))
    with pytest.raises(ValueError):
        _xla_attention(q, q, q, dropout_rate=0.5)
