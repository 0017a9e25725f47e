#!/usr/bin/env python
"""Training entry point.

Equivalent of the reference's hydra-driven ``train.py`` (SURVEY.md §3.1):

    ./train.py data=cifar10 task=bsi trainer.max_steps=100000
    ./train.py experiment=cifar10-vdm
    ./train.py -m experiment=imagenet32        # run the experiment's sweep

Composition, overrides, interpolation: bsi_tpu/config. Checkpoints embed the
resolved config; resume with ``from_ckpt=<dir>``.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import faulthandler
from pathlib import Path

from bsi_tpu.config import ConfigLoader, instantiate
from bsi_tpu.tasks import build_task
from bsi_tpu.utils.logging import MetricLogger
from bsi_tpu.utils.seed import resolve_seed


def run_one(config: dict) -> dict:
    import jax

    from bsi_tpu.parallel.distributed import host_shard, initialize_distributed
    from bsi_tpu.utils import enable_compilation_cache
    from bsi_tpu.utils.preemption import PreemptionHandler

    initialize_distributed()
    enable_compilation_cache()
    shard_id, num_shards = host_shard()
    is_main = shard_id == 0

    seed = resolve_seed(config)
    if num_shards > 1 and config.get("seed") is None:
        raise ValueError("multi-host runs require an explicit seed so hosts agree")

    if config.get("debug_nans"):
        jax.config.update("jax_debug_nans", True)

    title = config.get("title") or "run"
    name = config.get("name") or config["task"].get("name", "task")
    # All hosts must agree on the run dir (checkpoints of globally-sharded
    # state are written under it): broadcast rank 0's wall-clock stamp
    # instead of stamping per process, where hosts crossing a second
    # boundary would diverge.
    stamp_int = int(time.time())
    if num_shards > 1:
        from jax.experimental import multihost_utils

        stamp_int = int(multihost_utils.broadcast_one_to_all(jax.numpy.int64(stamp_int)))
    stamp = time.strftime("%Y%m%d-%H%M%S", time.localtime(stamp_int))
    run_dir = Path(config.get("run_root", "runs")) / str(title) / f"{name}-{seed % 10**6}-{stamp}"

    # Requeue: reuse the W&B run recorded in the checkpoint we resume from
    # (the reference persists the run id across SLURM requeues, train.py:88-107)
    from_ckpt = config.get("from_ckpt")
    wandb_cfg = dict(config.get("logging", {}).get("wandb") or {})
    if from_ckpt:
        meta_file = Path(from_ckpt) / "meta.json"
        if meta_file.exists():
            prev = json.loads(meta_file.read_text()).get("config") or {}
            prev_id = (prev.get("logging", {}).get("wandb") or {}).get("id")
            if prev_id:
                wandb_cfg.update({"id": prev_id, "resume": "allow"})

    data = instantiate(config["data"], seed=seed, shard_id=shard_id, num_shards=num_shards)
    logger = MetricLogger(run_dir, wandb_config=wandb_cfg, is_main_process=is_main)
    if getattr(logger, "_wandb", None) is not None:
        config.setdefault("logging", {}).setdefault("wandb", {})["id"] = logger._wandb.id
    logger.console_line(f"run dir: {run_dir}")
    logger.console_line(json.dumps(config, indent=2, default=str))

    preemption = PreemptionHandler().install()
    trainer = build_task(
        config, data, run_dir=run_dir, seed=seed, logger=logger, preemption=preemption
    )
    try:
        metrics = trainer.fit(from_checkpoint=from_ckpt)
        if config.get("eval_testset") and not metrics.get("preempted"):
            # The reference tests the BEST checkpoint, not the final state
            # (trainer.test(ckpt_path="best"), /root/reference/train.py:219-221)
            best_ckpt = trainer.run_dir / "ckpt_best"
            if best_ckpt.exists():
                trainer.restore(best_ckpt)
            metrics.update(trainer.test())
    finally:
        preemption.uninstall()
        logger.close()
    return metrics


def expand_sweep(loader: ConfigLoader, overrides: list[str]) -> list[list[str]]:
    """Expand the chosen config's ``sweep`` table and comma-lists in CLI
    overrides (``seed=1,2 task=vdm,bsi``) into a cartesian product."""
    base_overrides: list[str] = []
    axes: list[list[str]] = []
    for ov in overrides:
        key, _, raw = ov.partition("=")
        # a bare top-level comma list (no brackets/braces) sweeps that key
        if "," in raw and not any(ch in raw for ch in "[]{}"):
            axes.append([f"{key}={v}" for v in raw.split(",")])
        else:
            base_overrides.append(ov)

    probe = base_overrides + [axis[0] for axis in axes]
    base = loader.load("train", probe)
    for key, values in (base.get("sweep") or {}).items():
        if not any(axis[0].startswith(f"{key}=") for axis in axes):
            axes.append([f"{key}={v}" for v in values])

    expanded: list[list[str]] = [base_overrides]
    for axis in axes:
        expanded = [prev + [choice] for prev in expanded for choice in axis]
    return expanded


def main(argv: list[str] | None = None) -> int:
    faulthandler.enable()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("overrides", nargs="*", help="config overrides (key=value)")
    parser.add_argument("-m", "--multirun", action="store_true", help="run the sweep")
    args = parser.parse_args(argv)

    loader = ConfigLoader(Path(__file__).parent / "configs")
    runs = expand_sweep(loader, args.overrides) if args.multirun else [args.overrides]

    results = []
    for i, ov in enumerate(runs):
        config = loader.load("train", ov)
        config.pop("sweep", None)
        if len(runs) > 1:
            print(f"=== run {i + 1}/{len(runs)}: {ov} ===", flush=True)
        try:
            results.append(run_one(config))
        except Exception:
            # submitit/pipe layers can swallow tracebacks; print before re-raise
            # (the reference's print_exceptions decorator, bsi/utils/exceptions.py)
            import traceback

            traceback.print_exc()
            raise
    # Report the best checkpoint's monitored score — per run and across the
    # sweep — matching the reference's sweep objective
    # (/root/reference/train.py:226-227 returns the best-ckpt score)
    scores = [r.get("best/bpd", r.get("val/bpd")) for r in results]
    scores = [s for s in scores if s is not None]
    if scores:
        print(f"best val/bpd: {min(scores):.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
