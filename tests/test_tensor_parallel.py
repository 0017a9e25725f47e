"""Tensor-parallel sharding over the mesh's model axis (beyond reference
capability; bsi_tpu/parallel/tensor.py).

The annotations are sharding HINTS — XLA GSPMD guarantees the same math with
collectives inserted — so the tests pin (a) numerical equality with the
replicated run, (b) that the intended weights actually shard over the model
axis, and (c) composition with FSDP."""

import jax
import numpy as np
import numpy.testing as npt

from bsi_tpu.core import BSI
from bsi_tpu.data import SyntheticDataModule
from bsi_tpu.models import DenoisingDiT
from bsi_tpu.nn import FourierFeatures
from bsi_tpu.parallel import DATA_AXIS, MODEL_AXIS, make_mesh
from bsi_tpu.parallel.tensor import tp_state_sharding
from bsi_tpu.train import EMAConfig, Trainer, make_optimizer

DATA_SHAPE = (8, 8, 3)


def make_trainer(tmp_path, mesh, fsdp=False):
    algo = BSI(data_shape=DATA_SHAPE, lambda_0=1e-2, alpha_M=1e6, alpha_R=2e6, k=4)
    model = DenoisingDiT(
        data_shape=DATA_SHAPE, patch_size=2, dim=32, depth=2, heads=2,
        fourier_features=FourierFeatures(n_min=6, n_max=7),
    )
    data = SyntheticDataModule(n_train=64, n_val=16, batch_size=16, train_eval_size=16)
    return Trainer(
        algorithm=algo, model=model, optimizer=make_optimizer(1e-3), data=data,
        ema=EMAConfig(update_after_step=2), max_steps=8, val_check_interval=100,
        run_dir=tmp_path, seed=0, mesh=mesh, fsdp=fsdp,
    )


def _model_axis_paths(state, mesh):
    shardings = tp_state_sharding(state, mesh)
    flat, _ = jax.tree_util.tree_flatten_with_path(shardings)
    return {
        "/".join(str(getattr(p, "key", p)) for p in path)
        for path, s in flat
        if any(ax == MODEL_AXIS for ax in s.spec if ax)
    }


def test_tp_matches_replicated(tmp_path):
    t_rep = make_trainer(tmp_path / "rep", make_mesh(8))
    m_rep = t_rep.fit()
    mesh_tp = make_mesh(8, model_parallelism=2)
    t_tp = make_trainer(tmp_path / "tp", mesh_tp)
    m_tp = t_tp.fit()
    npt.assert_allclose(m_rep["train/loss"], m_tp["train/loss"], rtol=1e-4)

    w_rep = np.asarray(jax.tree.leaves(t_rep.state.params)[0])
    w_tp = np.asarray(jax.tree.leaves(t_tp.state.params)[0])
    npt.assert_allclose(w_rep, w_tp, atol=1e-5)

    # the intended weights actually shard over the model axis...
    paths = _model_axis_paths(t_tp.state, mesh_tp)
    assert any("to_out/kernel" in p for p in paths), paths
    assert any("mlp/Dense_0/kernel" in p for p in paths), paths
    assert any("ada_out/kernel" in p for p in paths), paths
    # ...including to_qkv: head-major packing makes its column sharding
    # head-aligned (bsi_tpu/nn/attention.py), completing the Megatron pair
    assert any("to_qkv/kernel" in p for p in paths), paths
    # optimizer moments and EMA mirror the param shardings
    to_out_sharded = [p for p in paths if "to_out/kernel" in p]
    assert any("ema_params" in p for p in to_out_sharded), paths
    assert any("opt_state" in p for p in to_out_sharded), paths

    # validation runs on the TP-sharded state
    assert np.isfinite(t_tp.validate()["val/bpd"])


def test_tp_composes_with_fsdp(tmp_path):
    mesh = make_mesh(8, model_parallelism=2)
    t = make_trainer(tmp_path, mesh, fsdp=True)
    m = t.fit()
    assert np.isfinite(m["train/loss"])
    # the test model's kernels are below the production min_size, so assert
    # the composition with an explicit small threshold
    shardings = tp_state_sharding(t.state, mesh, fsdp=True, min_size=64)
    specs = [s.spec for s in jax.tree.leaves(shardings)]
    has_both = any(
        MODEL_AXIS in [ax for ax in spec if ax] and DATA_AXIS in [ax for ax in spec if ax]
        for spec in specs
    )
    assert has_both, "no leaf sharded over both model and data axes"


def test_tp_validation_fid_matches_replicated(tmp_path):
    """Validation-time FID through Trainer.validate with a model axis > 1:
    the replica dedup in _update_fid must yield the same FID value as the
    plain data-parallel mesh (same fixed eval RNG, same global samples)."""
    from bsi_tpu.metrics.fid import FeatureStats, FIDScore

    def stub_embed(images_uint8):
        x = np.asarray(images_uint8, np.float64) / 255.0
        return np.stack(
            [x.mean(axis=(1, 2, 3)), x.std(axis=(1, 2, 3)),
             x[:, 0].mean(axis=(1, 2)), x[:, -1].mean(axis=(1, 2))], axis=1
        )

    def run(mesh, sub):
        real = FeatureStats(4)
        real.update(stub_embed(np.random.default_rng(0).integers(0, 255, (32,) + DATA_SHAPE, np.uint8)))
        t = make_trainer(tmp_path / sub, mesh)
        t.fid_metrics = {"val": FIDScore(stub_embed, real)}
        t.state = t.init_state()
        return t.validate()

    m_rep = run(make_mesh(8), "rep")
    m_tp = run(make_mesh(8, model_parallelism=2), "tp")
    key = "val/fid-4"
    assert key in m_rep and key in m_tp
    # TP collectives reorder float summation inside the sampler, so the
    # sample pixels (and embeddings) differ at f32 rounding level; a dedup
    # bug (double-counted/missing rows) would shift FID far beyond 2%.
    npt.assert_allclose(m_rep[key], m_tp[key], rtol=2e-2)


def test_tp_indivisible_dims_stay_replicated():
    from bsi_tpu.parallel.tensor import tp_leaf_spec

    # dim not divisible by tp -> replicated, never an error
    assert tp_leaf_spec("block/mlp/Dense_0/kernel", (7, 9), 4) == [None, None]
    assert tp_leaf_spec("block/mlp/Dense_0/kernel", (8, 12), 4) == [None, MODEL_AXIS]
    assert tp_leaf_spec("block/attn/to_out/kernel", (8, 12), 4) == [MODEL_AXIS, None]
    # head-major-packed qkv projections shard column-parallel
    assert tp_leaf_spec("block/attn/to_qkv/kernel", (8, 24), 4) == [None, MODEL_AXIS]
    # a lone Dense outside an mlp/ pair is never column-sharded (it would
    # force a per-step activation reshard with no row partner)
    assert tp_leaf_spec("head/Dense_0/kernel", (8, 12), 4) == [None, None]
    # conv kernels shard the input-channel dim, never the spatial dims
    assert tp_leaf_spec("unet/attn/to_out/kernel", (3, 3, 8, 8), 4) == [
        None, None, MODEL_AXIS, None,
    ]
    # norms / biases / small leaves untouched
    assert tp_leaf_spec("norm/scale", (32,), 4) == [None]
