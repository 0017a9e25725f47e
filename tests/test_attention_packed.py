"""Packed-layout fused attention (no head transposes).

Pins the packed kernels (bsi_tpu/ops/flash_attention_packed.py) against the
strided/XLA formulations: the masked head-pair math, the pallas_call wiring
(interpret mode), gradients, the TokenAttention module path, and the SPMD
sharding rules (batch + head-group sharding). TPU-only dropout-consistency
lives in the on-hardware test at the bottom (the TPU PRNG has no CPU
emulation)."""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

fap = importlib.import_module("bsi_tpu.ops.flash_attention_packed")
fa_mod = importlib.import_module("bsi_tpu.ops.flash_attention")
from bsi_tpu.ops.attention import (
    _fused_packed_fn,
    _xla_attention,
    multi_head_attention_packed,
)


def _packed_qkv(b=4, s=128, heads=4, head_dim=64, seed=0):
    kq, kk, kv = jax.random.split(jax.random.key(seed), 3)
    shape = (b, s, heads * head_dim)
    return (
        jax.random.normal(kq, shape),
        jax.random.normal(kk, shape),
        jax.random.normal(kv, shape),
    )


def _xla_packed(q, k, v, heads):
    """Reference: strided XLA attention behind split/merge."""
    b, s, hd = q.shape
    d = hd // heads
    to4 = lambda x: x.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    out = _xla_attention(to4(q), to4(k), to4(v))
    return out.transpose(0, 2, 1, 3).reshape(b, s, hd)


def _interpret_packed(monkeypatch):
    for name in (
        "flash_attention_packed",
        "flash_attention_packed_bwd",
        "flash_attention_fused",
        "flash_attention_fused_bwd",
    ):
        fn = getattr(fap, name)
        monkeypatch.setattr(
            fap, name, lambda *a, fn=fn, **kw: fn(*a, interpret=True, **kw)
        )


@pytest.mark.parametrize("heads,head_dim", [(4, 64), (2, 128), (6, 64)])
def test_packed_forward_and_grad_match_xla(monkeypatch, heads, head_dim):
    """Masked head-pair kernels == strided XLA attention, values and grads."""
    _interpret_packed(monkeypatch)
    q, k, v = _packed_qkv(heads=heads, head_dim=head_dim, seed=1)
    seeds = jnp.zeros((q.shape[0], heads), jnp.int32)
    fused = _fused_packed_fn(0.0, head_dim)

    out = fused(q, k, v, seeds)
    ref = _xla_packed(q, k, v, heads)
    npt.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)

    def loss(q, k, v):
        return (fused(q, k, v, seeds) ** 2).sum()

    def loss_ref(q, k, v):
        return (_xla_packed(q, k, v, heads) ** 2).sum()

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, gr in zip(grads, grads_ref):
        npt.assert_allclose(np.asarray(g), np.asarray(gr), atol=5e-4)


@pytest.mark.parametrize("keep_prob", [0.9, 0.5])
def test_packed_dropout_math_matches_per_head_math(keep_prob):
    """`_packed_fwd_math`/`_packed_bwd_math` with explicit masks == the
    per-head `_fwd_math`/`_bwd_math` the strided kernels run, including
    dropout scaling. Exact: the masked 128-lane dots add only zeros."""
    seq, head_dim = 64, 64
    kq, kk, kv, km1, km2, kg = jax.random.split(jax.random.key(3), 6)
    q = jax.random.normal(kq, (seq, 2 * head_dim))
    k = jax.random.normal(kk, (seq, 2 * head_dim))
    v = jax.random.normal(kv, (seq, 2 * head_dim))
    g = jax.random.normal(kg, (seq, 2 * head_dim))
    keeps = [
        jax.random.bernoulli(km1, keep_prob, (seq, seq)),
        jax.random.bernoulli(km2, keep_prob, (seq, seq)),
    ]
    scale = 1.0 / np.sqrt(head_dim)
    masks = fap._subhead_masks(head_dim, jnp.float64)

    out = fap._packed_fwd_math(q, k, v, masks, keeps, scale, keep_prob)
    dq, dk, dv = fap._packed_bwd_math(q, k, v, g, masks, keeps, scale, keep_prob)

    for j, sl in enumerate((slice(0, 64), slice(64, 128))):
        out_h = fa_mod._fwd_math(q[:, sl], k[:, sl], v[:, sl], keeps[j], scale, keep_prob)
        npt.assert_allclose(np.asarray(out[:, sl]), np.asarray(out_h), atol=1e-10)
        dq_h, dk_h, dv_h = fa_mod._bwd_math(
            q[:, sl], k[:, sl], v[:, sl], g[:, sl], keeps[j], scale, keep_prob
        )
        npt.assert_allclose(np.asarray(dq[:, sl]), np.asarray(dq_h), atol=1e-10)
        npt.assert_allclose(np.asarray(dk[:, sl]), np.asarray(dk_h), atol=1e-10)
        npt.assert_allclose(np.asarray(dv[:, sl]), np.asarray(dv_h), atol=1e-10)


def test_packed_applicability():
    ok = fap.packed_applicable
    assert ok(1024, 16, 256)  # DiT-L/2: 16 heads x 64
    assert ok(256, 2, 128)
    assert not ok(1024, 16, 100)  # seq not lane-aligned
    assert not ok(192, 3, 128)  # odd head count at head_dim 64 (broken pair)
    assert not ok(128, 4, 128)  # head_dim 32
    assert not ok(1024, 16, 1024)  # beyond the whole-sequence VMEM range


def test_token_attention_fused_path_matches_strided_module(monkeypatch):
    """TokenAttention (fused-qkv path) == the strided formulation it
    replaced, with identical params — pins the grouped extraction order."""
    from bsi_tpu.nn.attention import TokenAttention, _merge_heads
    from bsi_tpu.ops import split_qkv_grouped
    import flax.linen as nn

    class StridedTokenAttention(nn.Module):
        heads: int

        @nn.compact
        def __call__(self, x):
            dim = x.shape[-1]
            qkv = nn.Dense(3 * dim, name="to_qkv")(x)
            q, k, v = split_qkv_grouped(qkv, self.heads)
            out = _xla_attention(q, k, v)
            return nn.Dense(dim, name="to_out")(_merge_heads(out))

    x = jax.random.normal(jax.random.key(0), (2, 128, 256))
    new = TokenAttention(heads=4)
    old = StridedTokenAttention(heads=4)
    params = new.init(jax.random.key(1), x)
    y_new = new.apply(params, x)
    y_old = old.apply(params, x)
    npt.assert_allclose(np.asarray(y_new), np.asarray(y_old), atol=1e-10)


def test_repack_and_split_invert_the_reference_layout():
    """repack_qkv_grouped on the weights == the reference's (qkv h c) chunk
    split, viewed through split_qkv_grouped: x @ repack(W) split per head
    must equal the plain per-head chunks of x @ W."""
    from bsi_tpu.nn.attention import repack_qkv_grouped
    from bsi_tpu.ops import split_qkv_grouped

    heads, d, dim = 4, 64, 256
    kx, kw = jax.random.split(jax.random.key(5))
    x = jax.random.normal(kx, (2, 8, dim))
    w = jax.random.normal(kw, (dim, 3 * heads * d))

    qkv_ref = x @ w  # reference layout: [q all heads | k | v], head-major inside
    q_ref, k_ref, v_ref = (
        c.reshape(2, 8, heads, d).transpose(0, 2, 1, 3)
        for c in jnp.split(qkv_ref, 3, axis=-1)
    )
    q, k, v = split_qkv_grouped(x @ repack_qkv_grouped(w, heads), heads)
    npt.assert_allclose(np.asarray(q), np.asarray(q_ref), atol=1e-12)
    npt.assert_allclose(np.asarray(k), np.asarray(k_ref), atol=1e-12)
    npt.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-12)


@pytest.mark.parametrize("heads,head_dim", [(4, 64), (2, 128)])
def test_fused_qkv_forward_and_grad_match_fallback(monkeypatch, heads, head_dim):
    """The zero-copy fused kernels (offset index maps on one buffer, fused
    dqkv write) == the grouped-split XLA fallback, values and the qkv-buffer
    gradient."""
    _interpret_packed(monkeypatch)
    from bsi_tpu.ops import split_qkv_grouped
    from bsi_tpu.ops.attention import _fused_qkv_fn

    b, s = 4, 128
    qkv = jax.random.normal(jax.random.key(9), (b, s, 3 * heads * head_dim))
    seeds = jnp.zeros((b, heads), jnp.int32)
    hpg = fap.qkv_heads_per_group(head_dim, heads)
    fused = _fused_qkv_fn(0.0, head_dim, hpg)

    def fallback(qkv):
        q, k, v = split_qkv_grouped(qkv, heads)
        out = _xla_attention(q, k, v)
        return out.transpose(0, 2, 1, 3).reshape(b, s, heads * head_dim)

    out = fused(qkv, seeds)
    ref = fallback(qkv)
    npt.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)

    g = jax.grad(lambda q: (fused(q, seeds) ** 2).sum())(qkv)
    g_ref = jax.grad(lambda q: (fallback(q) ** 2).sum())(qkv)
    npt.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=5e-4)


def test_fused_qkv_shards_over_batch_and_groups(monkeypatch):
    """SPMD rules of the fused variants: batch on data, lane groups on
    model; the fused dqkv gradient keeps the qkv buffer's sharding."""
    _interpret_packed(monkeypatch)
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from bsi_tpu.ops import split_qkv_grouped
    from bsi_tpu.ops.attention import _fused_qkv_fn

    devices = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("data", "model"))
    heads, head_dim, b, s = 4, 64, 8, 128
    qkv = jax.random.normal(jax.random.key(13), (b, s, 3 * heads * head_dim))
    seeds = jnp.zeros((b, heads), jnp.int32)
    qkv_s = jax.device_put(qkv, NamedSharding(mesh, P("data", None, "model")))
    seeds_s = jax.device_put(seeds, NamedSharding(mesh, P("data", "model")))
    hpg = fap.qkv_heads_per_group(head_dim, heads)
    fused = _fused_qkv_fn(0.0, head_dim, hpg)

    out = jax.jit(fused)(qkv_s, seeds_s)
    assert out.sharding.spec[0] == "data", f"lost batch sharding: {out.sharding}"
    assert out.sharding.spec[2] == "model", f"lost group sharding: {out.sharding}"

    def fallback(qkv):
        q, k, v = split_qkv_grouped(qkv, heads)
        o = _xla_attention(q, k, v)
        return o.transpose(0, 2, 1, 3).reshape(b, s, heads * head_dim)

    npt.assert_allclose(np.asarray(out), np.asarray(fallback(qkv)), atol=5e-4)

    g = jax.jit(jax.grad(lambda q: (fused(q, seeds_s) ** 2).sum()))(qkv_s)
    g_ref = jax.grad(lambda q: (fallback(q) ** 2).sum())(qkv)
    assert g.sharding.spec[2] == "model", f"dqkv lost sharding: {g.sharding}"
    npt.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=5e-4)


def test_packed_shards_over_batch_and_heads(monkeypatch):
    """SPMD rules: batch on data, head groups on model; output keeps both
    shardings and the values match XLA."""
    _interpret_packed(monkeypatch)
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("data", "model"))
    heads, head_dim = 4, 64
    q, k, v = _packed_qkv(b=8, s=128, heads=heads, head_dim=head_dim, seed=11)
    seeds = jnp.zeros((8, heads), jnp.int32)
    sh = NamedSharding(mesh, P("data", None, "model"))
    sh_seeds = NamedSharding(mesh, P("data", "model"))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    ss = jax.device_put(seeds, sh_seeds)

    fused = _fused_packed_fn(0.0, head_dim)
    out = jax.jit(fused)(qs, ks, vs, ss)
    assert out.sharding.spec[0] == "data", f"lost batch sharding: {out.sharding}"
    assert out.sharding.spec[2] == "model", f"lost head sharding: {out.sharding}"
    npt.assert_allclose(
        np.asarray(out), np.asarray(_xla_packed(q, k, v, heads)), atol=5e-4
    )

    g = jax.jit(jax.grad(lambda q: (fused(q, ks, vs, ss) ** 2).sum()))(qs)
    g_ref = jax.grad(lambda q: (_xla_packed(q, k, v, heads) ** 2).sum())(q)
    npt.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=5e-4)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="TPU PRNG kernels")
def test_packed_dropout_kernels_fwd_bwd_consistent_on_tpu():
    """On real TPU: packed dropout forward and backward regenerate the same
    mask from the same seeds; grads match an explicit-mask reference built
    from a mask-dump kernel seeded identically."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, heads, seq, d = 2, 2, 128, 64
    rate, keep_prob = 0.1, 0.9
    q, k, v = _packed_qkv(b=b, s=seq, heads=heads, head_dim=d, seed=7)
    q, k, v = (x.astype(jnp.float32) for x in (q, k, v))
    g = jax.random.normal(jax.random.key(8), q.shape, jnp.float32)
    seeds = jnp.arange(11, 11 + b * heads, dtype=jnp.int32)

    def mask_dump_kernel(seed_ref, m_ref):
        pltpu.prng_seed(seed_ref[pl.program_id(0)])
        m_ref[0] = fa_mod._keep_mask((seq, seq), keep_prob).astype(jnp.float32)

    masks = pl.pallas_call(
        mask_dump_kernel,
        out_shape=jax.ShapeDtypeStruct((b * heads, seq, seq), jnp.float32),
        grid=(b * heads,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(
            (1, seq, seq), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )(seeds)
    keep = np.asarray(masks).astype(bool).reshape(b, heads, seq, seq)

    out = fap.flash_attention_packed(q, k, v, seeds, heads=heads, rate=rate)
    dq, dk, dv = fap.flash_attention_packed_bwd(
        q, k, v, g, seeds, heads=heads, rate=rate
    )

    def ref_fn(q, k, v):
        # highest precision: the kernels do true-f32 VMEM math, while TPU
        # einsum defaults to bf16 MXU passes (measured 7e-4 drift otherwise)
        bq, s, hd = q.shape
        to4 = lambda x: x.reshape(bq, s, heads, d).transpose(0, 2, 1, 3)
        scale = 1.0 / np.sqrt(d)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", to4(q) * scale, to4(k), precision="highest"
        )
        probs = jax.nn.softmax(logits, axis=-1)
        probs = jnp.where(keep, probs / keep_prob, 0.0)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, to4(v), precision="highest")
        return o.transpose(0, 2, 1, 3).reshape(bq, s, hd)

    ref, vjp = jax.vjp(ref_fn, q, k, v)
    npt.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
    for got, want in zip((dq, dk, dv), vjp(g)):
        npt.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="TPU PRNG kernels")
def test_fused_qkv_dropout_matches_packed_on_tpu():
    """On real TPU: the zero-copy fused kernels regenerate the exact same
    dropout masks as the packed 3-tensor kernels from the same seeds (both
    index the per-core PRNG by global (batch, head)), and the fused dqkv is
    the lane concatenation of the packed dq|dk|dv."""
    b, heads, seq, d = 2, 4, 128, 64
    rate = 0.1
    q, k, v = _packed_qkv(b=b, s=seq, heads=heads, head_dim=d, seed=21)
    q, k, v = (x.astype(jnp.float32) for x in (q, k, v))
    g = jax.random.normal(jax.random.key(22), q.shape, jnp.float32)
    seeds = jnp.arange(31, 31 + b * heads, dtype=jnp.int32)

    # grouped fused buffer: group p's q|k|v adjacent. hpg=2 at d=64.
    x6 = lambda t: t.reshape(b, seq, heads // 2, 2 * d)
    qkv = jnp.concatenate(
        [jnp.stack([x6(q)[:, :, p], x6(k)[:, :, p], x6(v)[:, :, p]], axis=2)
         for p in range(heads // 2)],
        axis=2,
    ).reshape(b, seq, 3 * heads * d)

    out_fused = fap.flash_attention_fused(qkv, seeds, heads=heads, rate=rate)
    out_packed = fap.flash_attention_packed(q, k, v, seeds, heads=heads, rate=rate)
    npt.assert_array_equal(np.asarray(out_fused), np.asarray(out_packed))

    dqkv = fap.flash_attention_fused_bwd(qkv, g, seeds, heads=heads, rate=rate)
    dq, dk, dv = fap.flash_attention_packed_bwd(q, k, v, g, seeds, heads=heads, rate=rate)
    want = jnp.concatenate(
        [jnp.stack([x6(dq)[:, :, p], x6(dk)[:, :, p], x6(dv)[:, :, p]], axis=2)
         for p in range(heads // 2)],
        axis=2,
    ).reshape(b, seq, 3 * heads * d)
    npt.assert_array_equal(np.asarray(dqkv), np.asarray(want))
