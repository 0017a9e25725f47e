"""Tests for FSDP state sharding and DiT rematerialization."""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from bsi_tpu.core import BSI
from bsi_tpu.data import SyntheticDataModule
from bsi_tpu.models import DenoisingDiT, DenoisingMLP
from bsi_tpu.nn import FourierFeatures, NyquistPositionalEmbedding
from bsi_tpu.parallel import DATA_AXIS, make_mesh
from bsi_tpu.parallel.fsdp import fsdp_state_sharding
from bsi_tpu.train import EMAConfig, Trainer, make_optimizer

DATA_SHAPE = (8, 8, 3)


def make_trainer(tmp_path, fsdp, mesh):
    algo = BSI(data_shape=DATA_SHAPE, lambda_0=1e-2, alpha_M=1e6, alpha_R=2e6, k=4)
    model = DenoisingMLP(
        data_shape=DATA_SHAPE, pos_emb=NyquistPositionalEmbedding(16, 100),
        hidden_width=512, layers=2,
    )
    data = SyntheticDataModule(n_train=64, n_val=16, batch_size=16, train_eval_size=16)
    return Trainer(
        algorithm=algo, model=model, optimizer=make_optimizer(1e-3), data=data,
        ema=EMAConfig(update_after_step=2), max_steps=8, val_check_interval=100,
        run_dir=tmp_path, seed=0, mesh=mesh, fsdp=fsdp,
    )


def test_fsdp_matches_replicated(tmp_path):
    mesh = make_mesh(8)
    t_rep = make_trainer(tmp_path / "rep", fsdp=False, mesh=mesh)
    m_rep = t_rep.fit()
    t_fsdp = make_trainer(tmp_path / "fsdp", fsdp=True, mesh=mesh)
    m_fsdp = t_fsdp.fit()
    npt.assert_allclose(m_rep["train/loss"], m_fsdp["train/loss"], rtol=1e-4)

    w_rep = np.asarray(jax.tree.leaves(t_rep.state.params)[0])
    w_fsdp = np.asarray(jax.tree.leaves(t_fsdp.state.params)[0])
    npt.assert_allclose(w_rep, w_fsdp, atol=1e-5)

    # large leaves are actually sharded over the data axis
    shardings = fsdp_state_sharding(t_fsdp.state, mesh)
    specs = [s.spec for s in jax.tree.leaves(shardings)]
    assert any(DATA_AXIS in (ax for ax in spec if ax) for spec in specs)

    # validation works on the sharded state
    metrics = t_fsdp.validate()
    assert np.isfinite(metrics["val/bpd"])


def test_fsdp_eval_matches_replicated(tmp_path):
    mesh = make_mesh(4)
    t_rep = make_trainer(tmp_path / "r", fsdp=False, mesh=mesh)
    t_rep.fit()
    t_fsdp = make_trainer(tmp_path / "f", fsdp=True, mesh=mesh)
    t_fsdp.fit()
    npt.assert_allclose(
        t_rep.validate()["val/bpd"], t_fsdp.validate()["val/bpd"], rtol=1e-5
    )


def test_dit_remat_same_output_and_grads():
    ff = FourierFeatures(n_min=6, n_max=8)
    kwargs = dict(data_shape=DATA_SHAPE, patch_size=2, dim=32, depth=2, heads=2,
                  fourier_features=ff)
    plain = DenoisingDiT(**kwargs)
    remat = DenoisingDiT(**kwargs, remat=True)
    mu = jax.random.normal(jax.random.key(0), (4,) + DATA_SHAPE)
    t = jnp.linspace(0, 1, 4)
    params = plain.init(jax.random.key(1), mu, t)

    out_a = plain.apply(params, mu, t)
    out_b = remat.apply(params, mu, t)
    npt.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)

    ga = jax.grad(lambda p: (plain.apply(p, mu, t) ** 2).mean())(params)
    gb = jax.grad(lambda p: (remat.apply(p, mu, t) ** 2).mean())(params)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        npt.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
