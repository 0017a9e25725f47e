"""Cluster launchers: SLURM sbatch generation and TPU-pod command fan-out.

The reference launches sweeps through hydra-submitit onto SLURM
(config/hydra/launcher/slurm.yaml, train.py:40-47,88-107): one job per sweep
point, ``signal: USR1@120`` so Lightning checkpoints and requeues on timeout.
The TPU-native equivalent here renders self-contained launch artifacts:

- :func:`render_slurm_script` — an sbatch script that starts one ``train.py``
  process per node of a multi-host job, wiring ``JAX_COORDINATOR_ADDRESS`` /
  ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` from SLURM variables and arming
  ``--signal=USR1@<grace>`` + ``--requeue`` so the framework's
  :class:`~bsi_tpu.utils.preemption.PreemptionHandler` checkpoints and the
  next incarnation resumes via ``from_ckpt``.
- :func:`render_pod_commands` — per-worker command lines for a TPU pod slice
  (run via ``gcloud compute tpus tpu-vm ssh --worker=all`` or any fan-out
  tool); JAX auto-detects the pod topology so no coordinator plumbing needed.
- :func:`submit_slurm` — write the script and hand it to ``sbatch`` (dry-run
  when SLURM is absent, e.g. in this environment).

Sweep points from ``train.py -m`` expansion become one job each.
"""

from __future__ import annotations

import shlex
import subprocess
from pathlib import Path
from typing import Optional, Sequence

SLURM_TEMPLATE = """#!/bin/bash
#SBATCH --job-name={job_name}
#SBATCH --nodes={nodes}
#SBATCH --ntasks-per-node=1
#SBATCH --cpus-per-task={cpus_per_task}
#SBATCH --mem={mem_gb}G
#SBATCH --time={timeout_min}
#SBATCH --signal=USR1@{grace_s}
#SBATCH --requeue
#SBATCH --open-mode=append
#SBATCH --output={log_dir}/%x-%j.out
{extra_directives}
# Multi-host JAX: first node coordinates; every node runs one process.
nodes=($(scontrol show hostnames "$SLURM_JOB_NODELIST"))
export JAX_COORDINATOR_ADDRESS="${{nodes[0]}}:{coordinator_port}"
export JAX_NUM_PROCESSES="$SLURM_NNODES"
export JAX_PROCESS_ID="$SLURM_PROCID"

# On requeue, resume from the interrupt checkpoint if one exists.
resume=""
ckpt="{run_root}/{job_name}/ckpt_interrupt"
if [ -d "$ckpt" ]; then
  resume="+from_ckpt=$ckpt"
fi

srun --kill-on-bad-exit=1 bash -c '
  export JAX_PROCESS_ID="$SLURM_PROCID"
  exec {python} {train_py} {args} '"$resume"'
'
"""


def render_slurm_script(
    args: Sequence[str],
    *,
    job_name: str = "bsi-tpu",
    nodes: int = 1,
    cpus_per_task: int = 8,
    mem_gb: int = 64,
    timeout_min: int = 1440,
    grace_s: int = 120,
    coordinator_port: int = 8476,
    run_root: str = "runs",
    log_dir: str = "slurm-logs",
    python: str = "python",
    train_py: str = "train.py",
    extra_directives: Sequence[str] = (),
) -> str:
    """Render a requeue-able sbatch script for one training run.

    ``--signal=USR1@grace`` mirrors the reference's ``signal: USR1@120``
    (config/hydra/launcher/slurm.yaml:21): the PreemptionHandler catches
    USR1, writes ``ckpt_interrupt``, and the requeued job resumes from it.
    """
    directives = "\n".join(f"#SBATCH {d}" for d in extra_directives)
    return SLURM_TEMPLATE.format(
        job_name=job_name,
        nodes=nodes,
        cpus_per_task=cpus_per_task,
        mem_gb=mem_gb,
        timeout_min=timeout_min,
        grace_s=grace_s,
        coordinator_port=coordinator_port,
        run_root=run_root,
        log_dir=log_dir,
        python=python,
        train_py=train_py,
        args=" ".join(shlex.quote(a) for a in args),
        extra_directives=directives,
    )


def render_pod_commands(
    args: Sequence[str],
    *,
    num_workers: int,
    python: str = "python",
    train_py: str = "train.py",
) -> list[str]:
    """Per-worker command lines for a TPU pod slice.

    On Cloud TPU pods ``jax.distributed.initialize`` auto-detects the
    topology from the TPU metadata, so every worker runs the identical
    command (fan out with ``gcloud ... ssh --worker=all --command=...``).
    """
    cmd = " ".join([python, train_py] + [shlex.quote(a) for a in args])
    return [cmd for _ in range(num_workers)]


def submit_slurm(
    script: str,
    *,
    script_path: str | Path,
    dry_run: Optional[bool] = None,
) -> tuple[Path, Optional[str]]:
    """Write ``script`` to disk and submit with ``sbatch``.

    Returns ``(path, job_id)``; ``job_id`` is None in dry-run mode (forced
    when sbatch is unavailable, e.g. in this TPU environment).
    """
    import shutil

    path = Path(script_path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(script)
    if dry_run is None:
        dry_run = shutil.which("sbatch") is None
    if dry_run:
        return path, None
    out = subprocess.run(
        ["sbatch", "--parsable", str(path)], capture_output=True, text=True, check=True
    )
    return path, out.stdout.strip().split(";")[0]
