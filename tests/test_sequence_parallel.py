"""Sequence parallelism (Megatron-SP) over the model axis (beyond reference
capability; bsi_tpu/parallel/sequence.py).

The token-stream sharding constraints are hints — GSPMD guarantees the same
math — so the tests pin (a) trajectory equality with the replicated run,
(b) the seq-sharded partitioning of the fused LayerNorm+modulate kernel
including its conditioning-gradient psum (run in Pallas interpret mode on the
CPU mesh), and (c) the configuration guards."""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from bsi_tpu.core import BSI
from bsi_tpu.data import SyntheticDataModule
from bsi_tpu.models import DenoisingDiT, DenoisingMLP
from bsi_tpu.nn import FourierFeatures, NyquistPositionalEmbedding
from bsi_tpu.parallel import make_mesh
from bsi_tpu.parallel.sequence import apply_sequence_parallelism, token_stream_sharding
from bsi_tpu.train import EMAConfig, Trainer, make_optimizer

DATA_SHAPE = (8, 8, 3)


def make_trainer(tmp_path, mesh, **kwargs):
    algo = BSI(data_shape=DATA_SHAPE, lambda_0=1e-2, alpha_M=1e6, alpha_R=2e6, k=4)
    model = DenoisingDiT(
        data_shape=DATA_SHAPE, patch_size=2, dim=32, depth=2, heads=2,
        fourier_features=FourierFeatures(n_min=6, n_max=7),
    )
    data = SyntheticDataModule(n_train=64, n_val=16, batch_size=16, train_eval_size=16)
    return Trainer(
        algorithm=algo, model=model, optimizer=make_optimizer(1e-3), data=data,
        ema=EMAConfig(update_after_step=2), max_steps=8, val_check_interval=100,
        run_dir=tmp_path, seed=0, mesh=mesh, **kwargs,
    )


def test_sp_matches_replicated(tmp_path):
    t_rep = make_trainer(tmp_path / "rep", make_mesh(8))
    m_rep = t_rep.fit()
    t_sp = make_trainer(
        tmp_path / "sp", make_mesh(8, model_parallelism=2), sequence_parallel=True
    )
    assert t_sp.model.token_sharding is not None
    m_sp = t_sp.fit()
    npt.assert_allclose(m_rep["train/loss"], m_sp["train/loss"], rtol=1e-4)
    w_rep = np.asarray(jax.tree.leaves(t_rep.state.params)[0])
    w_sp = np.asarray(jax.tree.leaves(t_sp.state.params)[0])
    npt.assert_allclose(w_rep, w_sp, atol=1e-5)
    # validation (EMA eval model) runs under the same constraints
    assert np.isfinite(t_sp.validate()["val/bpd"])


def test_sp_composes_with_fsdp(tmp_path):
    t = make_trainer(
        tmp_path, make_mesh(8, model_parallelism=2),
        sequence_parallel=True, fsdp=True,
    )
    m = t.fit()
    assert np.isfinite(m["train/loss"])


def test_sp_token_constraints_in_hlo(tmp_path):
    """The compiled train step must actually carry the seq-on-model-axis
    sharding on the token stream (not silently drop the constraints)."""
    mesh = make_mesh(8, model_parallelism=2)
    model = DenoisingDiT(
        data_shape=DATA_SHAPE, patch_size=2, dim=32, depth=2, heads=2,
        token_sharding=token_stream_sharding(mesh),
    )
    mu = jnp.zeros((4,) + DATA_SHAPE)
    t = jnp.linspace(0.0, 1.0, 4)
    params = model.init(jax.random.key(0), mu, t)
    txt = jax.jit(lambda p, m_, t_: model.apply(p, m_, t_)).lower(params, mu, t).as_text()
    # tokens are [B=4, S=16, D=32]; the constraint shards S over model(2).
    # Depending on the JAX version the lowering carries it either as a Shardy
    # sdy.sharding_constraint [{"data"}, {"model"}, {}] or as a legacy mhlo
    # Sharding custom call with devices=[1,2,1] on the rank-3 tensor.
    flat = txt.replace(" ", "")
    shardy = 'sdy.sharding_constraint' in txt and '[{"data"},{"model"},{}]' in flat
    mhlo = "Sharding" in txt and "devices=[1,2,1]" in flat
    assert shardy or mhlo, (
        "expected a [B, S, D] seq-sharded constraint in the lowered HLO"
    )


def test_ln_modulate_seq_sharded_kernel(monkeypatch):
    """The fused LayerNorm+modulate kernel partitions over a seq-sharded
    token stream: forward needs no communication, backward psums the
    conditioning gradients over the seq axes. Run the REAL partitioned
    lowering (Pallas interpret mode) on the CPU mesh and compare values and
    all three gradients against the unsharded reference math."""
    import bsi_tpu.ops.ln_modulate as lnm

    monkeypatch.setattr(lnm, "_INTERPRET", True)
    monkeypatch.setattr(lnm, "_use_pallas", lambda x: True)
    # fresh partitioned wrappers so previous cached traces don't leak
    lnm._partitioned_fwd.cache_clear()
    lnm._partitioned_bwd.cache_clear()

    mesh = make_mesh(8, model_parallelism=2)
    sp = NamedSharding(mesh, P("data", "model", None))
    b, s, d = 4, 16, 256
    key = jax.random.key(0)
    kx, ksh, ksc, kg = jax.random.split(key, 4)
    x = jax.random.normal(kx, (b, s, d), jnp.float32)
    shift = jax.random.normal(ksh, (b, d), jnp.float32)
    scale = 0.1 * jax.random.normal(ksc, (b, d), jnp.float32)
    gw = jax.random.normal(kg, (b, s, d), jnp.float32)

    def loss(fn):
        def inner(x_, shift_, scale_):
            return jnp.sum(fn(x_, shift_, scale_) * gw)

        return inner

    def sharded(x_, shift_, scale_):
        x_ = jax.lax.with_sharding_constraint(x_, sp)
        out = lnm.layernorm_modulate(x_, shift_, scale_)
        return jax.lax.with_sharding_constraint(out, sp)

    val, grads = jax.jit(jax.value_and_grad(loss(sharded), argnums=(0, 1, 2)))(
        x, shift, scale
    )
    ref_val, ref_grads = jax.jit(
        jax.value_and_grad(loss(lnm._reference_math), argnums=(0, 1, 2))
    )(x, shift, scale)

    npt.assert_allclose(float(val), float(ref_val), rtol=1e-5)
    for g, rg, name in zip(grads, ref_grads, ("dx", "dshift", "dscale")):
        npt.assert_allclose(np.asarray(g), np.asarray(rg), rtol=2e-5, atol=2e-5,
                            err_msg=name)


def test_apply_sequence_parallelism_guards(tmp_path):
    with pytest.raises(ValueError, match="model_parallelism"):
        apply_sequence_parallelism(
            DenoisingDiT(data_shape=DATA_SHAPE, patch_size=2, dim=32, depth=1, heads=2),
            make_mesh(8),
        )
    with pytest.raises(ValueError, match="token"):
        apply_sequence_parallelism(
            DenoisingMLP(
                data_shape=DATA_SHAPE,
                pos_emb=NyquistPositionalEmbedding(8, 100),
                hidden_width=16,
                layers=1,
            ),
            make_mesh(8, model_parallelism=2),
        )
    # SP on a pipe-only mesh (no model axis) still has nowhere to shard the
    # sequence — the model_parallelism guard must fire there too (SP *with*
    # a model axis composes with PP: tests/test_pipeline.py)
    with pytest.raises(ValueError, match="model_parallelism"):
        make_trainer(
            tmp_path,
            make_mesh(8, pipeline_parallelism=2),
            sequence_parallel=True,
        )
