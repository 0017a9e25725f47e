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


# --------------------------------------------------------- full-graph parity


def _torch_pt_inception_mirror(torch):
    """An independent torch transcription of the pt_inception FID network
    (pytorch-fid's InceptionA/B/C/D/E_1/E_2 wiring over torchvision's stem),
    with submodule names matching the official state-dict keys. Shapes come
    from the shared ``_conv_specs`` table; strides/paddings/branch orders are
    written here from the torch network definitions, so a wiring mistake in
    ``bsi_tpu.metrics.inception`` shows up as a feature mismatch."""
    from torch import nn
    import torch.nn.functional as F

    from bsi_tpu.metrics.inception import _conv_specs

    spec = {name: (cin, cout, k) for name, cin, cout, k in _conv_specs()}

    class BasicConv2d(nn.Module):
        def __init__(self, name, stride=1, padding=0):
            super().__init__()
            cin, cout, k = spec[name]
            self.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=padding, bias=False)
            self.bn = nn.BatchNorm2d(cout, eps=0.001)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)))

    class InceptionA(nn.Module):
        def __init__(self, n):
            super().__init__()
            self.branch1x1 = BasicConv2d(f"{n}.branch1x1")
            self.branch5x5_1 = BasicConv2d(f"{n}.branch5x5_1")
            self.branch5x5_2 = BasicConv2d(f"{n}.branch5x5_2", padding=2)
            self.branch3x3dbl_1 = BasicConv2d(f"{n}.branch3x3dbl_1")
            self.branch3x3dbl_2 = BasicConv2d(f"{n}.branch3x3dbl_2", padding=1)
            self.branch3x3dbl_3 = BasicConv2d(f"{n}.branch3x3dbl_3", padding=1)
            self.branch_pool = BasicConv2d(f"{n}.branch_pool")

        def forward(self, x):
            b1 = self.branch1x1(x)
            b5 = self.branch5x5_2(self.branch5x5_1(x))
            bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
            bp = self.branch_pool(
                F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)
            )
            return torch.cat([b1, b5, bd, bp], 1)

    class InceptionB(nn.Module):
        def __init__(self, n):
            super().__init__()
            self.branch3x3 = BasicConv2d(f"{n}.branch3x3", stride=2)
            self.branch3x3dbl_1 = BasicConv2d(f"{n}.branch3x3dbl_1")
            self.branch3x3dbl_2 = BasicConv2d(f"{n}.branch3x3dbl_2", padding=1)
            self.branch3x3dbl_3 = BasicConv2d(f"{n}.branch3x3dbl_3", stride=2)

        def forward(self, x):
            b3 = self.branch3x3(x)
            bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
            return torch.cat([b3, bd, F.max_pool2d(x, 3, stride=2)], 1)

    class InceptionC(nn.Module):
        def __init__(self, n):
            super().__init__()
            self.branch1x1 = BasicConv2d(f"{n}.branch1x1")
            self.branch7x7_1 = BasicConv2d(f"{n}.branch7x7_1")
            self.branch7x7_2 = BasicConv2d(f"{n}.branch7x7_2", padding=(0, 3))
            self.branch7x7_3 = BasicConv2d(f"{n}.branch7x7_3", padding=(3, 0))
            self.branch7x7dbl_1 = BasicConv2d(f"{n}.branch7x7dbl_1")
            self.branch7x7dbl_2 = BasicConv2d(f"{n}.branch7x7dbl_2", padding=(3, 0))
            self.branch7x7dbl_3 = BasicConv2d(f"{n}.branch7x7dbl_3", padding=(0, 3))
            self.branch7x7dbl_4 = BasicConv2d(f"{n}.branch7x7dbl_4", padding=(3, 0))
            self.branch7x7dbl_5 = BasicConv2d(f"{n}.branch7x7dbl_5", padding=(0, 3))
            self.branch_pool = BasicConv2d(f"{n}.branch_pool")

        def forward(self, x):
            b1 = self.branch1x1(x)
            b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
            bd = self.branch7x7dbl_5(
                self.branch7x7dbl_4(
                    self.branch7x7dbl_3(self.branch7x7dbl_2(self.branch7x7dbl_1(x)))
                )
            )
            bp = self.branch_pool(
                F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)
            )
            return torch.cat([b1, b7, bd, bp], 1)

    class InceptionD(nn.Module):
        def __init__(self, n):
            super().__init__()
            self.branch3x3_1 = BasicConv2d(f"{n}.branch3x3_1")
            self.branch3x3_2 = BasicConv2d(f"{n}.branch3x3_2", stride=2)
            self.branch7x7x3_1 = BasicConv2d(f"{n}.branch7x7x3_1")
            self.branch7x7x3_2 = BasicConv2d(f"{n}.branch7x7x3_2", padding=(0, 3))
            self.branch7x7x3_3 = BasicConv2d(f"{n}.branch7x7x3_3", padding=(3, 0))
            self.branch7x7x3_4 = BasicConv2d(f"{n}.branch7x7x3_4", stride=2)

        def forward(self, x):
            b3 = self.branch3x3_2(self.branch3x3_1(x))
            b7 = self.branch7x7x3_4(
                self.branch7x7x3_3(self.branch7x7x3_2(self.branch7x7x3_1(x)))
            )
            return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)

    class InceptionE(nn.Module):
        def __init__(self, n, pool):
            super().__init__()
            self.pool = pool
            self.branch1x1 = BasicConv2d(f"{n}.branch1x1")
            self.branch3x3_1 = BasicConv2d(f"{n}.branch3x3_1")
            self.branch3x3_2a = BasicConv2d(f"{n}.branch3x3_2a", padding=(0, 1))
            self.branch3x3_2b = BasicConv2d(f"{n}.branch3x3_2b", padding=(1, 0))
            self.branch3x3dbl_1 = BasicConv2d(f"{n}.branch3x3dbl_1")
            self.branch3x3dbl_2 = BasicConv2d(f"{n}.branch3x3dbl_2", padding=1)
            self.branch3x3dbl_3a = BasicConv2d(f"{n}.branch3x3dbl_3a", padding=(0, 1))
            self.branch3x3dbl_3b = BasicConv2d(f"{n}.branch3x3dbl_3b", padding=(1, 0))
            self.branch_pool = BasicConv2d(f"{n}.branch_pool")

        def forward(self, x):
            b1 = self.branch1x1(x)
            b3 = self.branch3x3_1(x)
            b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
            bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
            bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
            if self.pool == "avg":
                pooled = F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)
            else:
                pooled = F.max_pool2d(x, 3, stride=1, padding=1)
            return torch.cat([b1, b3, bd, self.branch_pool(pooled)], 1)

    class Mirror(nn.Module):
        def __init__(self):
            super().__init__()
            self.Conv2d_1a_3x3 = BasicConv2d("Conv2d_1a_3x3", stride=2)
            self.Conv2d_2a_3x3 = BasicConv2d("Conv2d_2a_3x3")
            self.Conv2d_2b_3x3 = BasicConv2d("Conv2d_2b_3x3", padding=1)
            self.Conv2d_3b_1x1 = BasicConv2d("Conv2d_3b_1x1")
            self.Conv2d_4a_3x3 = BasicConv2d("Conv2d_4a_3x3")
            self.Mixed_5b = InceptionA("Mixed_5b")
            self.Mixed_5c = InceptionA("Mixed_5c")
            self.Mixed_5d = InceptionA("Mixed_5d")
            self.Mixed_6a = InceptionB("Mixed_6a")
            self.Mixed_6b = InceptionC("Mixed_6b")
            self.Mixed_6c = InceptionC("Mixed_6c")
            self.Mixed_6d = InceptionC("Mixed_6d")
            self.Mixed_6e = InceptionC("Mixed_6e")
            self.Mixed_7a = InceptionD("Mixed_7a")
            self.Mixed_7b = InceptionE("Mixed_7b", pool="avg")
            self.Mixed_7c = InceptionE("Mixed_7c", pool="max")

        def forward(self, x01):
            # pytorch-fid wrapper: bilinear 299 resize + [0,1] -> [-1,1]
            x = F.interpolate(x01, size=(299, 299), mode="bilinear", align_corners=False)
            x = 2 * x - 1
            x = self.Conv2d_1a_3x3(x)
            x = self.Conv2d_2a_3x3(x)
            x = self.Conv2d_2b_3x3(x)
            x = F.max_pool2d(x, 3, stride=2)
            x = self.Conv2d_3b_1x1(x)
            x = self.Conv2d_4a_3x3(x)
            x = F.max_pool2d(x, 3, stride=2)
            for name in [
                "Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
                "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a", "Mixed_7b",
                "Mixed_7c",
            ]:
                x = getattr(self, name)(x)
            return F.adaptive_avg_pool2d(x, 1).flatten(1)

    import torch

    return Mirror()


def _rich_random_params(seed=0):
    """Random weights with non-trivial BN statistics (unlike
    ``random_params``, whose identity BN would mask affine-fold mistakes)."""
    from bsi_tpu.metrics.inception import _conv_specs

    rng = np.random.default_rng(seed)
    params = {}
    for name, cin, cout, (kh, kw) in _conv_specs():
        fan_in = cin * kh * kw
        params[f"{name}.conv.weight"] = rng.normal(
            0, fan_in**-0.5, size=(kh, kw, cin, cout)
        )
        params[f"{name}.bn.weight"] = rng.uniform(0.5, 1.5, cout)
        params[f"{name}.bn.bias"] = rng.normal(0, 0.2, cout)
        params[f"{name}.bn.running_mean"] = rng.normal(0, 0.1, cout)
        params[f"{name}.bn.running_var"] = rng.uniform(0.5, 1.5, cout)
    return {k: v.astype(np.float64) for k, v in params.items()}


def test_inception_full_graph_matches_torch_mirror():
    """End-to-end 2048-d feature parity (resize + stem + all 11 mixed blocks +
    pooling) between the JAX network and an independent torch transcription of
    pt_inception, under identical random weights. Closes the wiring risk the
    leaf tests (conv/BN, resize, pooling) cannot see: branch order, stride
    placement, padding orientation, concat layout."""
    torch = pytest.importorskip("torch")

    from bsi_tpu.metrics.inception import convert_torch_state_dict

    params = _rich_random_params(0)
    mirror = _torch_pt_inception_mirror(torch).double().eval()
    state = {}
    for key, value in params.items():
        if key.endswith("conv.weight"):
            state[key] = torch.tensor(value.transpose(3, 2, 0, 1))
        else:
            state[key] = torch.tensor(value)
    missing, unexpected = mirror.load_state_dict(state, strict=False)
    assert not unexpected, unexpected
    assert all(m.endswith("num_batches_tracked") for m in missing), missing

    x01 = np.random.default_rng(7).random((2, 67, 53, 3))  # odd dims stress padding
    feats_jax = np.asarray(
        inception_features({k: jnp.asarray(v) for k, v in params.items()}, jnp.asarray(x01))
    )
    with torch.no_grad():
        feats_torch = mirror(torch.tensor(x01.transpose(0, 3, 1, 2))).numpy()
    assert feats_jax.shape == feats_torch.shape == (2, 2048)
    npt.assert_allclose(feats_jax, feats_torch, rtol=1e-6, atol=1e-7)

    # and the state-dict converter (used for the real pt_inception weights)
    # inverts the torch layout (exactly, up to its float32 storage cast)
    roundtrip = convert_torch_state_dict(mirror.state_dict())
    for key, value in params.items():
        npt.assert_array_equal(roundtrip[key], value.astype(np.float32))


# ------------------------------------------------- full FID pipeline parity


def test_fid_full_pipeline_matches_executed_torch_oracle():
    """The ENTIRE FID pipeline — uint8 images -> bilinear resize -> Inception
    embed -> streaming (n, sum, cov_sum) stats -> Frechet distance — against
    an EXECUTED torch oracle at the same random weights: the independent
    torch transcription of pt_inception for features plus torchmetrics'
    update/compute semantics transcribed in torch ops. This is the
    FID-readiness guarantee: the day real pt_inception weights and data
    exist, only the inputs change (scripts/convert_inception.py +
    compute_fid_stats.py), not any code this test exercises.

    Full 2048-d statistics are compared exactly; the distance itself is
    cross-checked on a 256-d slice (a 2048-d nonsymmetric eig is minutes of
    CPU; the formula is dimension-independent code either way)."""
    torch = pytest.importorskip("torch")

    from bsi_tpu.metrics.inception import make_embed_fn

    params = _rich_random_params(3)
    f32 = {k: v.astype(np.float32) for k, v in params.items()}
    embed = make_embed_fn(f32)

    rng = np.random.default_rng(11)
    real_u8 = rng.integers(0, 256, size=(12, 32, 32, 3), dtype=np.uint8)
    fake_u8 = rng.integers(32, 224, size=(10, 32, 32, 3), dtype=np.uint8)

    # ---- ours: the production objects (block_size < n exercises streaming)
    real_stats = FeatureStats(2048)
    real_stats.update(np.asarray(embed(real_u8)))
    score = FIDScore(embed, real_stats, block_size=4)
    score.update(fake_u8)

    # ---- oracle: torch mirror + torchmetrics state/compute semantics
    mirror = _torch_pt_inception_mirror(torch).eval()
    state = {}
    for key, value in f32.items():
        if key.endswith("conv.weight"):
            state[key] = torch.tensor(value.transpose(3, 2, 0, 1))
        else:
            state[key] = torch.tensor(value)
    mirror.load_state_dict(state, strict=False)

    def torch_feats(u8):
        x01 = torch.tensor(u8.transpose(0, 3, 1, 2)).float() / 255.0
        with torch.no_grad():
            return mirror(x01).double()

    tr, tf = torch_feats(real_u8), torch_feats(fake_u8)
    # torchmetrics FrechetInceptionDistance state: sum, outer-product sum, n
    for ours, feats in ((real_stats, tr), (score.fake_stats, tf)):
        npt.assert_allclose(ours.sum, feats.sum(0).numpy(), rtol=1e-4, atol=1e-4)
        npt.assert_allclose(
            ours.cov_sum, (feats.T @ feats).numpy(), rtol=1e-4, atol=1e-4
        )
        assert ours.n == len(feats)

    def torchmetrics_fid(f_real, f_fake, dim):
        f_real, f_fake = f_real[:, :dim], f_fake[:, :dim]
        m1, m2 = f_fake.mean(0), f_real.mean(0)
        c1 = (f_fake - m1).T @ (f_fake - m1) / (len(f_fake) - 1)
        c2 = (f_real - m2).T @ (f_real - m2) / (len(f_real) - 1)
        diff = m1 - m2
        eig = torch.linalg.eigvals(c1 @ c2)
        return float(
            diff @ diff + torch.trace(c1) + torch.trace(c2)
            - 2 * eig.sqrt().real.sum()
        )

    def sliced(u8, dim=256):
        return np.asarray(embed(u8))[:, :dim]

    real256, fake256 = FeatureStats(256), FeatureStats(256)
    real256.update(sliced(real_u8))
    fake256.update(sliced(fake_u8))
    got = fid_from_stats(fake256, real256)
    want = torchmetrics_fid(tr, tf, 256)
    npt.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_fid_full_pipeline_matches_installed_torchmetrics():
    """Same pipeline against the REAL torchmetrics package when available
    (absent in this image — the transcription oracle above carries the load;
    this test activates automatically the day torchmetrics is installed)."""
    torch = pytest.importorskip("torch")
    tm = pytest.importorskip("torchmetrics.image.fid")

    from bsi_tpu.metrics.inception import make_embed_fn

    f32 = {k: v.astype(np.float32) for k, v in _rich_random_params(3).items()}
    mirror = _torch_pt_inception_mirror(torch).eval()
    state = {
        k: torch.tensor(v.transpose(3, 2, 0, 1) if k.endswith("conv.weight") else v)
        for k, v in f32.items()
    }
    mirror.load_state_dict(state, strict=False)

    class Wrapped(torch.nn.Module):  # torchmetrics feature-extractor protocol
        def forward(self, u8):
            return mirror(u8.float() / 255.0)

    metric = tm.FrechetInceptionDistance(feature=Wrapped())
    rng = np.random.default_rng(11)
    real_u8 = rng.integers(0, 256, size=(12, 32, 32, 3), dtype=np.uint8)
    fake_u8 = rng.integers(32, 224, size=(10, 32, 32, 3), dtype=np.uint8)
    metric.update(torch.tensor(real_u8.transpose(0, 3, 1, 2)), real=True)
    metric.update(torch.tensor(fake_u8.transpose(0, 3, 1, 2)), real=False)
    want = float(metric.compute())

    embed = make_embed_fn(f32)
    real_stats = FeatureStats(2048)
    real_stats.update(np.asarray(embed(real_u8)))
    score = FIDScore(embed, real_stats, block_size=4)
    score.update(fake_u8)
    npt.assert_allclose(score.compute(), want, rtol=1e-3, atol=1e-3)


def test_convert_inception_script_roundtrip(tmp_path, monkeypatch):
    """scripts/convert_inception.py end-to-end: torch .pth -> verified .npz
    whose embeddings match the source checkpoint exactly."""
    torch = pytest.importorskip("torch")
    import importlib
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    try:
        convert_inception = importlib.import_module("convert_inception")
    finally:
        sys.path.pop(0)

    from bsi_tpu.metrics.inception import load_params, make_embed_fn

    mirror = _torch_pt_inception_mirror(torch).eval()
    # the real checkpoint also carries an fc head + BN bookkeeping, which the
    # converter must drop
    sd = dict(mirror.state_dict())
    sd["fc.weight"] = torch.zeros(1008, 2048)
    sd["fc.bias"] = torch.zeros(1008)
    pth = tmp_path / "pt_inception-test.pth"
    torch.save(sd, pth)

    out = convert_inception.convert(pth, tmp_path / "pt_inception.npz")
    npz_params = load_params(out)
    assert not any(k.startswith("fc.") for k in npz_params)
    direct_params = load_params(pth)

    imgs = np.random.default_rng(1).integers(0, 256, (3, 32, 32, 3), dtype=np.uint8)
    a = np.asarray(make_embed_fn(npz_params)(imgs))
    b = np.asarray(make_embed_fn(direct_params)(imgs))
    npt.assert_array_equal(a, b)
    assert a.shape == (3, 2048) and np.isfinite(a).all()
