#!/usr/bin/env python
"""Submit training runs to a cluster (SLURM) or print TPU-pod commands.

The reference launches hydra multiruns through submitit onto SLURM
(config/hydra/launcher/slurm.yaml); this is the standalone equivalent:
each sweep point (``-m`` comma-lists, same expansion as train.py) becomes
one requeue-able sbatch job. Without SLURM on the machine it dry-runs and
prints the generated scripts.

Usage:
  launch.py [--backend slurm|pod] [--nodes N] [--workers N] [--name X]
            [--timeout-min M] [--mem-gb G] [--dry-run] [-m] [overrides...]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from _common import REPO_ROOT  # noqa: E402

sys.path.insert(0, str(REPO_ROOT))

from bsi_tpu.utils.launcher import (  # noqa: E402
    render_pod_commands,
    render_slurm_script,
    submit_slurm,
)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--backend", choices=["slurm", "pod"], default="slurm")
    parser.add_argument("--nodes", type=int, default=1)
    parser.add_argument("--workers", type=int, default=4, help="pod worker count")
    parser.add_argument("--name", default="bsi-tpu")
    parser.add_argument("--timeout-min", type=int, default=1440)
    parser.add_argument("--mem-gb", type=int, default=64)
    parser.add_argument("--grace-s", type=int, default=120)
    parser.add_argument("--out-dir", default="slurm-scripts")
    parser.add_argument("--dry-run", action="store_true")
    parser.add_argument("-m", "--multirun", action="store_true")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()

    if args.multirun:
        import train as train_cli
        from bsi_tpu.config import ConfigLoader

        loader = ConfigLoader(REPO_ROOT / "configs")
        sweeps = train_cli.expand_sweep(loader, args.overrides)
    else:
        sweeps = [list(args.overrides)]

    for i, overrides in enumerate(sweeps):
        name = args.name if len(sweeps) == 1 else f"{args.name}-{i}"
        if args.backend == "pod":
            for j, cmd in enumerate(
                render_pod_commands(overrides, num_workers=args.workers)
            ):
                print(f"[{name} worker {j}] {cmd}")
            continue
        script = render_slurm_script(
            overrides,
            job_name=name,
            nodes=args.nodes,
            mem_gb=args.mem_gb,
            timeout_min=args.timeout_min,
            grace_s=args.grace_s,
        )
        path, job_id = submit_slurm(
            script,
            script_path=Path(args.out_dir) / f"{name}.sbatch",
            dry_run=True if args.dry_run else None,
        )
        status = f"submitted as job {job_id}" if job_id else "dry-run (no sbatch)"
        print(f"[{name}] {path}: {status}")


if __name__ == "__main__":
    main()
