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


def test_slurm_launcher_script_render(tmp_path):
    """The generated sbatch script carries the requeue contract: USR1 grace
    signal (reference: config/hydra/launcher/slurm.yaml:21), JAX multi-host
    env wiring, and interrupt-checkpoint resume."""
    from bsi_tpu.utils.launcher import (
        render_pod_commands,
        render_slurm_script,
        submit_slurm,
    )

    script = render_slurm_script(
        ["data=cifar10", "task=bsi", "seed=1"],
        job_name="cifar-bsi",
        nodes=4,
        grace_s=120,
        extra_directives=["--partition=tpu", "--qos=high"],
    )
    assert "#SBATCH --signal=USR1@120" in script
    assert "#SBATCH --requeue" in script
    assert "#SBATCH --nodes=4" in script
    assert "#SBATCH --partition=tpu" in script
    assert "JAX_COORDINATOR_ADDRESS" in script and "JAX_NUM_PROCESSES" in script
    assert "JAX_PROCESS_ID" in script
    assert "ckpt_interrupt" in script and "from_ckpt" in script
    assert "data=cifar10 task=bsi seed=1" in script

    path, job_id = submit_slurm(
        script, script_path=tmp_path / "job.sbatch", dry_run=True
    )
    assert path.exists() and job_id is None
    assert path.read_text() == script

    cmds = render_pod_commands(["data=imagenet32"], num_workers=4)
    assert len(cmds) == 4 and all("data=imagenet32" in c for c in cmds)
    assert len(set(cmds)) == 1  # pod workers run the identical command


def test_launch_cli_dry_run(tmp_path):
    import subprocess
    import sys as _sys
    from pathlib import Path as _Path

    repo = _Path(__file__).parent.parent
    out = subprocess.run(
        [
            _sys.executable,
            str(repo / "scripts" / "launch.py"),
            "--dry-run",
            "--out-dir",
            str(tmp_path),
            "-m",
            "data=synthetic",
            "seed=1,2",
        ],
        capture_output=True,
        text=True,
        cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dry-run" in out.stdout
    scripts = sorted(tmp_path.glob("*.sbatch"))
    assert len(scripts) == 2  # one job per sweep point
    assert "seed=1" in scripts[0].read_text()
