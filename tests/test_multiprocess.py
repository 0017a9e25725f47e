"""Multi-process (multi-host analogue) integration tests.

Spawns a real 2-process ``jax.distributed`` CPU cluster (2 virtual devices
per process, 4 global) via subprocesses and checks that one full Trainer run
— host-sharded data, global batch assembly, SPMD train step, lockstep eval,
checkpointing — produces exactly the same losses and parameters as a
single-process run. This is the test coverage for the reference's
rank-distributed semantics (bsi/data/h5image.py:308-312, SURVEY.md §2.8)
that round 1 lacked.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import numpy.testing as npt
import pytest

WORKER = Path(__file__).parent / "_mp_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _clean_env() -> dict:
    env = dict(os.environ)
    # the worker pins its own platform/device-count flags
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    return env


def _run_workers(tmp_path: Path, nproc: int) -> list[dict]:
    port = _free_port()
    outs = [tmp_path / f"out_{nproc}_{i}.json" for i in range(nproc)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), f"localhost:{port}", str(i), str(nproc), str(out)],
            env=_clean_env(),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i, out in enumerate(outs)
    ]
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    return [json.loads(out.read_text()) for out in outs]



def test_two_process_training_matches_single_process(tmp_path):
    single = _run_workers(tmp_path / "single", 1)[0]
    double = _run_workers(tmp_path / "double", 2)

    # both processes observe identical replicated state
    npt.assert_allclose(double[0]["loss"], double[1]["loss"], rtol=1e-12)
    npt.assert_allclose(double[0]["param_sum"], double[1]["param_sum"], rtol=1e-12)

    # and the distributed run reproduces the single-process trajectory
    npt.assert_allclose(double[0]["loss"], single["loss"], rtol=1e-5)
    npt.assert_allclose(double[0]["val_bpd"], single["val_bpd"], rtol=1e-5)
    npt.assert_allclose(double[0]["param_sum"], single["param_sum"], rtol=1e-5)
    assert double[0]["devices"] == 4 and single["devices"] == 2

    # validation-time FID: per-host sample stats summed across processes
    # must reproduce the single-process value (same global samples)
    npt.assert_allclose(double[0]["val_fid"], double[1]["val_fid"], rtol=1e-10)
    npt.assert_allclose(double[0]["val_fid"], single["val_fid"], rtol=1e-6)

    # run_one (the production train.py path, entered via env-driven
    # initialize_distributed) ran end-to-end on the live cluster: both hosts
    # derived the SAME run dir (broadcast stamp), produced identical
    # replicated metrics, and resumed from the checkpoint
    assert double[0]["run_one_dir"] == double[1]["run_one_dir"]
    npt.assert_allclose(double[0]["run_one_val_bpd"], double[1]["run_one_val_bpd"], rtol=1e-12)
    for w in (single, *double):
        assert np.isfinite(w["run_one_val_bpd"])
        assert np.isfinite(w["resumed_val_bpd"])

    # TP (data-across-hosts x model-within-host) and PP (pipe-within-host)
    # meshes through the full Trainer + validate + FID: the 2-process run
    # must reproduce the single-process (plain-DP, same model) trajectory,
    # and the FID replica-dedup guard must pass and dedup correctly on a
    # mesh with a non-trivial model/pipe axis (train/loop.py::_update_fid).
    for phase in ("tp", "pp"):
        npt.assert_allclose(
            double[0][f"{phase}_loss"], double[1][f"{phase}_loss"], rtol=1e-12
        )
        npt.assert_allclose(
            double[0][f"{phase}_loss"], single[f"{phase}_loss"], rtol=1e-5
        )
        npt.assert_allclose(
            double[0][f"{phase}_val_bpd"], single[f"{phase}_val_bpd"], rtol=1e-5
        )
        npt.assert_allclose(
            double[0][f"{phase}_val_fid"], double[1][f"{phase}_val_fid"], rtol=1e-10
        )
        # vs single-process the MESH differs (plain 2-device DP baseline vs a
        # model/pipe axis): f32 reduction order shifts the generated samples
        # by ~1e-6, and the Frechet distance (eigenvalues of the sample
        # covariance) amplifies that nonlinearly — hence the looser rtol here
        # than the bit-level cross-process check above.
        npt.assert_allclose(
            double[0][f"{phase}_val_fid"], single[f"{phase}_val_fid"], rtol=2e-3
        )
        npt.assert_allclose(
            double[0][f"{phase}_param_sum"], single[f"{phase}_param_sum"], rtol=1e-5
        )

    # 2-process mid-run save/restore on the TP mesh (orbax multi-host save +
    # Trainer.restore's re-shard path): both hosts observe the identical
    # resumed state, and the resumed 6-step trajectory matches the
    # single-process one
    npt.assert_allclose(
        double[0]["tp_resumed_loss"], double[1]["tp_resumed_loss"], rtol=1e-12
    )
    npt.assert_allclose(
        double[0]["tp_resumed_param_sum"],
        double[1]["tp_resumed_param_sum"],
        rtol=1e-12,
    )
    npt.assert_allclose(
        double[0]["tp_resumed_loss"], single["tp_resumed_loss"], rtol=1e-5
    )
    npt.assert_allclose(
        double[0]["tp_resumed_val_bpd"], single["tp_resumed_val_bpd"], rtol=1e-5
    )
    npt.assert_allclose(
        double[0]["tp_resumed_param_sum"], single["tp_resumed_param_sum"], rtol=1e-5
    )
