"""Tests for FID statistics, Frechet distance, and the Inception network."""

import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from bsi_tpu.metrics import (
    FeatureStats,
    FIDScore,
    fid_from_stats,
    frechet_distance,
    images_to_uint8,
    random_params,
)
from bsi_tpu.metrics.inception import inception_features


def test_feature_stats_streaming_matches_direct():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(100, 8))
    s = FeatureStats(8)
    for i in range(0, 100, 7):
        s.update(x[i : i + 7])
    mean, cov = s.mean_cov()
    npt.assert_allclose(mean, x.mean(axis=0), atol=1e-12)
    npt.assert_allclose(cov, np.cov(x.T, ddof=1), atol=1e-12)


def test_feature_stats_npz_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    s = FeatureStats(4)
    s.update(rng.normal(size=(50, 4)))
    s.save_npz(tmp_path / "stats.npz")
    s2 = FeatureStats.from_npz(tmp_path / "stats.npz")
    assert s2.n == 50
    npt.assert_allclose(s2.sum, s.sum)
    npt.assert_allclose(s2.cov_sum, s.cov_sum)


def test_frechet_distance_closed_form():
    # identical Gaussians -> 0
    m = np.array([1.0, -2.0])
    c = np.array([[2.0, 0.3], [0.3, 1.0]])
    assert abs(frechet_distance(m, c, m, c)) < 1e-8
    # diagonal case: |m1-m2|^2 + sum (s1 + s2 - 2 sqrt(s1 s2))
    m1, m2 = np.array([0.0, 0.0]), np.array([1.0, 2.0])
    c1, c2 = np.diag([1.0, 4.0]), np.diag([9.0, 1.0])
    want = 5.0 + (1 + 9 - 2 * 3) + (4 + 1 - 2 * 2)
    npt.assert_allclose(frechet_distance(m1, c1, m2, c2), want, rtol=1e-10)


def test_frechet_distance_parity_with_torchmetrics_formula():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    a = rng.normal(size=(500, 16))
    b = rng.normal(size=(400, 16)) * 1.3 + 0.2
    s1, s2 = FeatureStats(16), FeatureStats(16)
    s1.update(a)
    s2.update(b)
    got = fid_from_stats(s1, s2)

    # torchmetrics _compute_fid formula, transcribed
    m1, c1 = s1.mean_cov()
    m2, c2 = s2.mean_cov()
    t = lambda x: torch.tensor(x, dtype=torch.double)
    diff = t(m1) - t(m2)
    eig = torch.linalg.eigvals(t(c1) @ t(c2))
    want = float(
        diff @ diff + torch.trace(t(c1)) + torch.trace(t(c2)) - 2 * eig.sqrt().real.sum()
    )
    npt.assert_allclose(got, want, rtol=1e-8)


def test_fid_score_stub_embedder():
    rng = np.random.default_rng(3)

    def embed(imgs):
        flat = imgs.reshape(len(imgs), -1).astype(np.float64) / 255.0
        return flat[:, :16]

    real = FeatureStats(16)
    real_data = rng.integers(0, 256, size=(512, 4, 4, 3), dtype=np.uint8)
    real.update(embed(real_data))

    score = FIDScore(embed, real, block_size=100)
    score.update(real_data)  # same distribution -> tiny FID
    assert score.compute() < 1e-6
    score.reset()
    score.update(rng.integers(128, 256, size=(512, 4, 4, 3), dtype=np.uint8))
    assert score.compute() > 1e-3


def test_images_to_uint8():
    x = np.array([[-0.5, 0.0], [0.5, 1.5]])
    out = images_to_uint8(x)
    npt.assert_array_equal(out, [[0, 0], [127, 255]])


def test_inception_forward_structure():
    """Forward with random weights validates every declared channel count:
    any block-input mismatch fails the conv shape check."""
    params = {k: jnp.asarray(v) for k, v in random_params(0).items()}
    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3)), jnp.float32)
    feats = inception_features(params, x)
    assert feats.shape == (2, 2048)
    assert bool(jnp.isfinite(feats).all())


def test_resize_matches_torch_bilinear():
    torch = pytest.importorskip("torch")
    import jax

    x = np.random.default_rng(1).random((2, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(
        jax.image.resize(jnp.asarray(x), (2, 299, 299, 3), method="bilinear")
    )
    want = (
        torch.nn.functional.interpolate(
            torch.tensor(x).permute(0, 3, 1, 2),
            size=(299, 299),
            mode="bilinear",
            align_corners=False,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    npt.assert_allclose(ours, want, atol=2e-5)


def test_conv_bn_matches_torch():
    torch = pytest.importorskip("torch")
    from bsi_tpu.metrics.inception import _conv

    rng = np.random.default_rng(4)
    w = rng.normal(0, 0.1, size=(16, 3, 3, 3)).astype(np.float32)  # OIHW
    gamma = rng.normal(1, 0.1, 16).astype(np.float32)
    beta = rng.normal(0, 0.1, 16).astype(np.float32)
    mean = rng.normal(0, 0.1, 16).astype(np.float32)
    var = rng.uniform(0.5, 2.0, 16).astype(np.float32)
    x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)

    params = {
        "m.conv.weight": jnp.asarray(w.transpose(2, 3, 1, 0)),
        "m.bn.weight": jnp.asarray(gamma),
        "m.bn.bias": jnp.asarray(beta),
        "m.bn.running_mean": jnp.asarray(mean),
        "m.bn.running_var": jnp.asarray(var),
    }
    got = np.asarray(_conv(params, "m", jnp.asarray(x), stride=2, padding=((1, 1), (1, 1))))

    tx = torch.tensor(x).permute(0, 3, 1, 2)
    conv = torch.nn.functional.conv2d(tx, torch.tensor(w), stride=2, padding=1)
    bn = torch.nn.functional.batch_norm(
        conv,
        torch.tensor(mean),
        torch.tensor(var),
        torch.tensor(gamma),
        torch.tensor(beta),
        training=False,
        eps=1e-3,
    )
    want = torch.relu(bn).permute(0, 2, 3, 1).numpy()
    npt.assert_allclose(got, want, atol=1e-5)


def test_avg_pool_count_include_pad_matches_torch():
    torch = pytest.importorskip("torch")
    from bsi_tpu.metrics.inception import _avg3

    x = np.random.default_rng(5).normal(size=(1, 7, 7, 4)).astype(np.float32)
    got = np.asarray(_avg3(jnp.asarray(x)))
    want = (
        torch.nn.functional.avg_pool2d(
            torch.tensor(x).permute(0, 3, 1, 2), 3, stride=1, padding=1,
            count_include_pad=False,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    npt.assert_allclose(got, want, atol=1e-6)
