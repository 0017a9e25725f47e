"""Checkpoint/resume under every advertised sharding layout.

``Trainer.restore`` re-shards the loaded state with ``jax.device_put(state,
self._state_shardings)`` (train/loop.py); until round 5 that path was only
exercised on the replicated mesh. These tests pin:

- bit-exact mid-run save/resume under FSDP, TP(2), and PP(2) meshes — the
  resumed trajectory reproduces the uninterrupted one exactly (same
  layout => same reduction order => identical floats at f64);
- cross-layout restores: a checkpoint saved replicated resumes under FSDP,
  and a loop-layout DiT checkpoint resumes under pipeline parallelism via
  the ``stack_state_blocks`` converter (models/dit.py).

Reference contract being extended: the reference's checkpoints are
layout-free single-GPU state dicts restored by Lightning
(/root/reference/bsi/lightning/callbacks.py:7-16); sharded-layout restore
has no torch analogue here to copy — correctness is defined as equality
with the unsharded trajectory.
"""

import jax
import numpy as np
import numpy.testing as npt

from bsi_tpu.core import BSI
from bsi_tpu.data import SyntheticDataModule
from bsi_tpu.models import DenoisingDiT, DenoisingMLP
from bsi_tpu.models.dit import stack_state_blocks, unstack_block_params
from bsi_tpu.nn import FourierFeatures, NyquistPositionalEmbedding
from bsi_tpu.parallel import make_mesh
from bsi_tpu.train import EMAConfig, Trainer, make_optimizer
from bsi_tpu.train.checkpoint import load_checkpoint

DATA_SHAPE = (8, 8, 3)
DEPTH = 2


def _algo():
    return BSI(
        data_shape=DATA_SHAPE, lambda_0=1e-2, alpha_M=1e6, alpha_R=2e6, k=4,
        preconditioning="edm",
    )


def _mlp():
    return DenoisingMLP(
        data_shape=DATA_SHAPE, pos_emb=NyquistPositionalEmbedding(16, 100),
        hidden_width=512, layers=2,
    )


def _dit(**kw):
    return DenoisingDiT(
        data_shape=DATA_SHAPE, patch_size=2, dim=32, depth=DEPTH, heads=2,
        fourier_features=FourierFeatures(n_min=6, n_max=7), **kw
    )


def _trainer(tmp_path, model, *, mesh, max_steps, **kw):
    defaults = dict(
        algorithm=_algo(),
        model=model,
        optimizer=make_optimizer(1e-3),
        # fresh module per trainer: identical seed => identical batch order
        data=SyntheticDataModule(
            n_train=64, n_val=16, data_shape=DATA_SHAPE, batch_size=16,
            train_eval_size=16,
        ),
        ema=EMAConfig(update_after_step=2),
        max_steps=max_steps,
        val_check_interval=100,
        log_every=4,
        run_dir=tmp_path,
        seed=0,
        mesh=mesh,
    )
    defaults.update(kw)
    return Trainer(**defaults)


def _leaves(params):
    return [np.asarray(jax.device_get(l)) for l in jax.tree.leaves(params)]


def _assert_params_equal(a, b, *, exact=True):
    la, lb = _leaves(a), _leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        if exact:
            npt.assert_array_equal(x, y)
        else:
            # params are f32: cross-layout continuations differ by collective
            # reduction order (the tests/test_fsdp.py tolerance)
            npt.assert_allclose(x, y, rtol=1e-4, atol=1e-5)


def _resume_roundtrip(tmp_path, make, *, check_spec=None):
    """Train 8 straight; train 4 + save + resume to 8 in a fresh trainer of
    the same layout; the two final states must be bit-identical."""
    t_full = make(tmp_path / "full", 8)
    t_full.fit()

    t_half = make(tmp_path / "half", 4)
    t_half.fit()
    ckpt = t_half.save("resume")

    t_res = make(tmp_path / "resumed", 8)
    t_res.fit(from_checkpoint=ckpt)

    assert int(t_res.state.step) == 8
    _assert_params_equal(t_full.state.params, t_res.state.params)
    _assert_params_equal(t_full.state.ema_params, t_res.state.ema_params)
    if check_spec is not None:
        # the restored state actually lives in the sharded layout
        specs = {
            tuple(ax for ax in l.sharding.spec if ax is not None)
            for l in jax.tree.leaves(t_res.state.params)
        }
        assert any(check_spec in spec for spec in specs), specs


def test_resume_exact_under_fsdp(tmp_path):
    _resume_roundtrip(
        tmp_path,
        lambda p, n: _trainer(p, _mlp(), mesh=make_mesh(8), fsdp=True, max_steps=n),
        check_spec="data",
    )


def test_resume_exact_under_tp(tmp_path):
    _resume_roundtrip(
        tmp_path,
        lambda p, n: _trainer(
            p, _dit(), mesh=make_mesh(8, model_parallelism=2), max_steps=n
        ),
        check_spec="model",
    )


def test_resume_exact_under_pp(tmp_path):
    _resume_roundtrip(
        tmp_path,
        lambda p, n: _trainer(
            p, _dit(scan_blocks=True),
            mesh=make_mesh(8, pipeline_parallelism=2),
            pp_microbatches=2, max_steps=n,
        ),
        check_spec="pipe",
    )


def test_cross_layout_restore_replicated_to_fsdp(tmp_path):
    """A checkpoint written replicated restores into an FSDP trainer (the
    device_put re-shard path) and continues on the FSDP trajectory."""
    t_rep_full = _trainer(tmp_path / "rep_full", _mlp(), mesh=make_mesh(8), max_steps=8)
    t_rep_full.fit()

    t_rep_half = _trainer(tmp_path / "rep_half", _mlp(), mesh=make_mesh(8), max_steps=4)
    t_rep_half.fit()
    ckpt = t_rep_half.save("resume")

    t_fsdp = _trainer(
        tmp_path / "fsdp", _mlp(), mesh=make_mesh(8), fsdp=True, max_steps=8
    )
    t_fsdp.fit(from_checkpoint=ckpt)
    assert int(t_fsdp.state.step) == 8
    # FSDP-vs-replicated continuation: identical math, different collective
    # placement — equal up to reduction order (tests/test_fsdp.py tolerance)
    _assert_params_equal(t_rep_full.state.params, t_fsdp.state.params, exact=False)
    specs = {
        tuple(ax for ax in l.sharding.spec if ax is not None)
        for l in jax.tree.leaves(t_fsdp.state.params)
    }
    assert any("data" in spec for spec in specs), specs


def test_cross_layout_restore_loop_to_scan_pp(tmp_path):
    """A loop-layout DiT checkpoint (the interchange format that torch
    weight transfer produces) resumes under PP(2)xDP via
    ``stack_state_blocks``: params, EMA params, AND Adam moments convert, and
    the continued trajectory matches the pure loop-layout continuation."""
    t_loop_full = _trainer(tmp_path / "loop_full", _dit(), mesh=make_mesh(1), max_steps=8)
    t_loop_full.fit()

    t_loop_half = _trainer(tmp_path / "loop_half", _dit(), mesh=make_mesh(1), max_steps=4)
    t_loop_half.fit()
    ckpt = t_loop_half.save("resume")

    # load the loop-layout state with a loop-shaped target, convert to the
    # stacked scan layout, and push it into a pipeline trainer
    t_target = _trainer(tmp_path / "target", _dit(), mesh=make_mesh(1), max_steps=8)
    loop_state, meta = load_checkpoint(ckpt, t_target.init_state())

    t_pp = _trainer(
        tmp_path / "pp", _dit(scan_blocks=True),
        mesh=make_mesh(8, pipeline_parallelism=2), pp_microbatches=2, max_steps=8,
    )
    t_pp.state = t_pp.init_state()  # establishes the PP state shardings
    scan_state = stack_state_blocks(loop_state, DEPTH)
    assert jax.tree.structure(scan_state) == jax.tree.structure(t_pp.state)
    t_pp.state = jax.device_put(scan_state, t_pp._state_shardings)
    t_pp.data.load_state_dict(meta["data_state"])
    t_pp.best_bpd = float(meta["extra"]["best_bpd"])
    t_pp.fit()

    assert int(t_pp.state.step) == 8
    # convert back to the loop layout and compare against the uninterrupted
    # loop run (scan == loop numerics, tests/test_pipeline.py)
    got = unstack_block_params(t_pp.state.params)
    assert jax.tree.structure(got) == jax.tree.structure(t_loop_full.state.params)
    _assert_params_equal(t_loop_full.state.params, got, exact=False)
