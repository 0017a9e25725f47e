"""Tests for auxiliary subsystems: preemption, profiling, NaN watchdog."""

import os
import signal

import jax.numpy as jnp
import numpy as np
import pytest

from bsi_tpu.core import BSI
from bsi_tpu.data import SyntheticDataModule
from bsi_tpu.models import DenoisingMLP
from bsi_tpu.nn import NyquistPositionalEmbedding
from bsi_tpu.train import EMAConfig, Trainer, make_optimizer
from bsi_tpu.utils.preemption import PreemptionHandler
from bsi_tpu.utils.profiling import StepWindowProfiler, time_fn


def make_trainer(tmp_path, **kwargs):
    algo = BSI(data_shape=(8, 8, 3), lambda_0=1e-2, alpha_M=1e6, alpha_R=2e6, k=4)
    model = DenoisingMLP(
        data_shape=(8, 8, 3), pos_emb=NyquistPositionalEmbedding(16, 100),
        hidden_width=32, layers=1,
    )
    data = SyntheticDataModule(n_train=32, n_val=8, batch_size=8, train_eval_size=8)
    defaults = dict(
        algorithm=algo, model=model, optimizer=make_optimizer(1e-3), data=data,
        ema=EMAConfig(update_after_step=0), max_steps=50, val_check_interval=1000,
        log_every=1, run_dir=tmp_path,
    )
    defaults.update(kwargs)
    return Trainer(**defaults)


def test_preemption_checkpoints_and_stops(tmp_path):
    handler = PreemptionHandler(signals=(signal.SIGUSR1,)).install()
    try:
        trainer = make_trainer(tmp_path, preemption=handler)
        # trigger preemption immediately: the loop should stop after one step
        os.kill(os.getpid(), signal.SIGUSR1)
        metrics = trainer.fit()
        assert metrics.get("preempted") is True
        assert (tmp_path / "ckpt_interrupt" / "meta.json").exists()
        assert int(trainer.state.step) < 50
    finally:
        handler.uninstall()

    # resume from the interrupt checkpoint continues the run
    trainer2 = make_trainer(tmp_path / "resumed", max_steps=3)
    trainer2.fit(from_checkpoint=tmp_path / "ckpt_interrupt")
    assert int(trainer2.state.step) == 3


def test_nan_watchdog(tmp_path):
    trainer = make_trainer(tmp_path, optimizer=make_optimizer(float("nan")), max_steps=5)
    with pytest.raises(RuntimeError, match="non-finite train loss"):
        trainer.fit()
    assert (tmp_path / "ckpt_nan" / "meta.json").exists()


def test_time_fn():
    import jax

    f = jax.jit(lambda x: x @ x)
    x = jnp.ones((64, 64))
    stats = time_fn(f, x, iters=3, warmup=1)
    assert stats["mean_ms"] > 0


def test_step_window_profiler(tmp_path):
    prof = StepWindowProfiler(tmp_path / "prof", start_step=1, num_steps=2)
    for step in range(5):
        prof.on_step(step)
    prof.close()
    assert prof._done
    # a trace directory was produced
    assert any((tmp_path / "prof").rglob("*")), "no trace output written"
