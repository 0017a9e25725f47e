"""Gradients of the fused attention path.

The Pallas kernels now cover forward AND backward (plus dropout). On CPU the
kernels run in interpret mode (no-dropout paths only — the TPU PRNG used for
in-kernel dropout masks has no CPU emulation), and the dropout VJP *math* is
pinned against an explicit-mask reference through the shared pure functions
(`_fwd_math`/`_bwd_math`). A TPU-only finite-difference test checks the
fwd/bwd kernels agree on the regenerated dropout mask on real hardware."""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

# bsi_tpu.ops re-exports the flash_attention *function*, shadowing the
# submodule attribute; resolve the module explicitly
fa_mod = importlib.import_module("bsi_tpu.ops.flash_attention")
attn_mod = importlib.import_module("bsi_tpu.ops.attention")
from bsi_tpu.ops.attention import _fused_sdpa_fn, _xla_attention


def _qkv(shape=(2, 2, 128, 64), seed=0):
    kq, kk, kv = jax.random.split(jax.random.key(seed), 3)
    return (
        jax.random.normal(kq, shape),
        jax.random.normal(kk, shape),
        jax.random.normal(kv, shape),
    )


def _interpret_kernels(monkeypatch):
    # The dispatch looks the kernel entry points up in the flash_attention
    # module at trace time (via the partitioned wrappers), so patching the
    # raw functions there reroutes everything through interpret mode.
    fwd, bwd = fa_mod.flash_attention, fa_mod.flash_attention_bwd
    fwd_drop = fa_mod.flash_attention_dropout
    monkeypatch.setattr(
        fa_mod, "flash_attention", lambda q, k, v, **kw: fwd(q, k, v, interpret=True)
    )
    monkeypatch.setattr(
        fa_mod,
        "flash_attention_dropout",
        lambda *a, **kw: fwd_drop(*a, interpret=True, **kw),
    )
    monkeypatch.setattr(
        fa_mod,
        "flash_attention_bwd",
        lambda *a, **kw: bwd(*a, interpret=True, **kw),
    )


def test_fused_attention_grad_matches_xla(monkeypatch):
    """No-dropout: Pallas forward + Pallas backward vs the XLA formulation."""
    _interpret_kernels(monkeypatch)
    q, k, v = _qkv()
    seeds = jnp.zeros(q.shape[:2], jnp.int32)
    fused = _fused_sdpa_fn(0.0)

    def loss_fused(q, k, v):
        return (fused(q, k, v, seeds) ** 2).sum()

    def loss_xla(q, k, v):
        return (_xla_attention(q, k, v) ** 2).sum()

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_xla):
        npt.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_fused_bwd_seq_fallback_matches_xla(monkeypatch):
    """Above MAX_FUSED_TRAIN_SEQ the custom VJP falls back to the XLA
    re-derivation; gradients must still match."""
    _interpret_kernels(monkeypatch)
    monkeypatch.setattr(attn_mod, "MAX_FUSED_TRAIN_SEQ", 64)
    q, k, v = _qkv()
    seeds = jnp.zeros(q.shape[:2], jnp.int32)
    fused = _fused_sdpa_fn(0.0)
    g = jax.grad(lambda q: (fused(q, k, v, seeds) ** 2).sum())(q)
    g_ref = jax.grad(lambda q: (_xla_attention(q, k, v) ** 2).sum())(q)
    npt.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=5e-4)


def _mask_reference(q, k, v, keep, keep_prob):
    """Explicit-mask attention-with-dropout in plain jnp (the oracle)."""
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = (q * scale) @ k.T
    probs = jax.nn.softmax(logits, axis=-1)
    probs = jnp.where(keep, probs / keep_prob, 0.0)
    return probs @ v


@pytest.mark.parametrize("keep_prob", [0.95, 0.5])
def test_dropout_math_matches_explicit_mask_reference(keep_prob):
    """`_fwd_math`/`_bwd_math` (the code the kernels execute) vs jax.vjp of
    an explicit-mask reference — pins the dropout scaling and softmax VJP."""
    kq, kk, kv, km, kg = jax.random.split(jax.random.key(3), 5)
    seq, d = 64, 32
    q = jax.random.normal(kq, (seq, d))
    k = jax.random.normal(kk, (seq, d))
    v = jax.random.normal(kv, (seq, d))
    keep = jax.random.bernoulli(km, keep_prob, (seq, seq))
    g = jax.random.normal(kg, (seq, d))
    scale = 1.0 / np.sqrt(d)

    out = fa_mod._fwd_math(q, k, v, keep, scale, keep_prob)
    out_ref, vjp = jax.vjp(lambda q, k, v: _mask_reference(q, k, v, keep, keep_prob), q, k, v)
    npt.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=1e-5)

    dq, dk, dv = fa_mod._bwd_math(q, k, v, g, keep, scale, keep_prob)
    dq_ref, dk_ref, dv_ref = vjp(g)
    npt.assert_allclose(np.asarray(dq), np.asarray(dq_ref), atol=1e-4)
    npt.assert_allclose(np.asarray(dk), np.asarray(dk_ref), atol=1e-4)
    npt.assert_allclose(np.asarray(dv), np.asarray(dv_ref), atol=1e-4)


def test_bwd_kernel_wiring_interpret():
    """The backward pallas_call itself (grid/blockspecs/reshapes), rate=0,
    against jax.vjp of the XLA path."""
    q, k, v = _qkv(shape=(2, 3, 128, 64), seed=5)
    g = jax.random.normal(jax.random.key(6), q.shape)
    seeds = jnp.zeros((6,), jnp.int32)
    dq, dk, dv = fa_mod.flash_attention_bwd(q, k, v, g, seeds, rate=0.0, interpret=True)
    _, vjp = jax.vjp(_xla_attention, q, k, v)
    dq_ref, dk_ref, dv_ref = vjp(g)
    npt.assert_allclose(np.asarray(dq), np.asarray(dq_ref), atol=5e-4)
    npt.assert_allclose(np.asarray(dk), np.asarray(dk_ref), atol=5e-4)
    npt.assert_allclose(np.asarray(dv), np.asarray(dv_ref), atol=5e-4)


def test_fused_attention_shards_over_batch(monkeypatch):
    """Regression: a bare pallas_call under a sharded jit is REPLICATED by
    the partitioner (all-gather + full kernel on every device). The
    custom_partitioning rules must keep the output batch-sharded and the
    values identical to the XLA formulation."""
    _interpret_kernels(monkeypatch)
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = jax.devices()[:8]
    mesh = Mesh(np.array(devices).reshape(8), ("data",))
    q, k, v = _qkv(shape=(16, 2, 128, 64), seed=11)
    seeds = jnp.zeros((16, 2), jnp.int32)
    sh = NamedSharding(mesh, P("data"))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    ss = jax.device_put(seeds, sh)

    fused = _fused_sdpa_fn(0.0)
    out = jax.jit(fused)(qs, ks, vs, ss)
    assert out.sharding.spec[0] == "data", f"lost batch sharding: {out.sharding}"
    npt.assert_allclose(
        np.asarray(out), np.asarray(_xla_attention(q, k, v)), atol=5e-4
    )

    # gradients keep the sharded path too
    g = jax.jit(jax.grad(lambda q: (fused(q, ks, vs, ss) ** 2).sum()))(qs)
    g_ref = jax.grad(lambda q: (_xla_attention(q, k, v) ** 2).sum())(q)
    npt.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=5e-4)


def test_fused_attention_shards_over_heads(monkeypatch):
    """Tensor parallelism shards attention HEADS over the model axis; the
    kernel's sharding rule leaves the head factor free, so the fused path
    must accept head-sharded operands and produce head-sharded output."""
    _interpret_kernels(monkeypatch)
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("data", "model"))
    q, k, v = _qkv(shape=(8, 4, 128, 64), seed=13)
    seeds = jnp.zeros((8, 4), jnp.int32)
    sh = NamedSharding(mesh, P("data", "model"))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    ss = jax.device_put(seeds, sh)

    fused = _fused_sdpa_fn(0.0)
    out = jax.jit(fused)(qs, ks, vs, ss)
    assert out.sharding.spec[:2] == ("data", "model"), out.sharding
    npt.assert_allclose(
        np.asarray(out), np.asarray(_xla_attention(q, k, v)), atol=5e-4
    )


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="TPU PRNG kernels")
def test_dropout_kernels_fwd_bwd_consistent_on_tpu():
    """On real TPU: dump the in-kernel PRNG mask with a third kernel seeded
    identically, then require the dropout forward AND all three backward
    gradients to match an explicit-mask JAX reference exactly. This pins
    (a) seed determinism, (b) fwd/bwd mask agreement, (c) the VJP math."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, seq, d = 1, 2, 128, 64
    rate, keep_prob = 0.1, 0.9
    q, k, v = _qkv(shape=(b, h, seq, d), seed=7)
    g = jax.random.normal(jax.random.key(8), q.shape)
    seeds = jnp.array([11, 12], jnp.int32)

    def mask_dump_kernel(seed_ref, m_ref):
        pltpu.prng_seed(seed_ref[pl.program_id(0)])
        m_ref[0] = fa_mod._keep_mask((seq, seq), keep_prob).astype(jnp.float32)

    mask = pl.pallas_call(
        mask_dump_kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, seq, seq), jnp.float32),
        grid=(b * h,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(
            (1, seq, seq), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )(seeds)
    mask = jnp.asarray(np.asarray(mask).astype(bool).reshape(b, h, seq, seq))
    assert 0.85 < float(mask.mean()) < 0.95  # ~keep_prob

    def ref_attn(q, k, v):
        # highest precision to match the kernels' exact-f32 dots on f32
        # inputs (ops/flash_attention.py::_dot_precision)
        scale = 1.0 / np.sqrt(d)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k, precision="highest")
        probs = jnp.where(mask, jax.nn.softmax(logits, axis=-1) / keep_prob, 0.0)
        return jnp.einsum("bhqk,bhkd->bhqd", probs, v, precision="highest")

    # ulp-scale tolerance: the kernels' HIGHEST dots (multi-pass MXU) are
    # f32-exact but not bit-identical to XLA's einsum; a wrong dropout mask
    # would show as O(0.1) whole-row errors, far above this.
    out = fa_mod.flash_attention_dropout(q, k, v, seeds, rate=rate)
    out_ref, vjp = jax.vjp(ref_attn, q, k, v)
    npt.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=1e-6, rtol=1e-5)

    dq, dk, dv = fa_mod.flash_attention_bwd(q, k, v, g, seeds, rate=rate)
    for a, b_ in zip((dq, dk, dv), vjp(g)):
        npt.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5, rtol=1e-4)
