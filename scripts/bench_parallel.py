#!/usr/bin/env python
"""Multi-chip parallelism benchmark: train throughput under TP/SP/PP/FSDP.

The parallelism suite has trajectory-equality tests on the virtual CPU mesh
(tests/test_pipeline.py, test_tensor_parallel.py, test_sequence_parallel.py)
but this environment exposes ONE physical chip, so its on-chip perf is
hardware-gated. The day a real multi-chip slice is attached, each sharding's
number is one command:

    python scripts/bench_parallel.py --dp 8                    # pure DP
    python scripts/bench_parallel.py --dp 4 --tp 2 --fsdp      # TP x FSDP
    python scripts/bench_parallel.py --dp 4 --tp 2 --sp        # Megatron-SP
    python scripts/bench_parallel.py --dp 2 --pp 4 --micro 8   # GPipe PP
    python scripts/bench_parallel.py --dp 2 --pp 2 --tp 2      # PP x TP

Runs the production Trainer (the identical fused step the real recipes use)
on synthetic data of the recipe shape and prints one JSON line with
examples/sec/chip and per-step wall time, measured from the metrics
timestamps after the compile step. Also runs single-chip as --dp 1 for a
same-protocol baseline.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from _common import REPO_ROOT  # noqa: F401

import jax  # noqa: E402

from bsi_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dp", type=int, default=1, help="data-parallel ways (ICI)")
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel ways")
    p.add_argument("--pp", type=int, default=1, help="pipeline stages")
    p.add_argument("--sp", action="store_true", help="sequence parallelism (needs --tp>1)")
    p.add_argument("--fsdp", action="store_true")
    p.add_argument("--micro", type=int, default=None, help="PP microbatches")
    p.add_argument("--dcn", type=int, default=1, help="DP ways across slices (DCN)")
    p.add_argument("--batch", type=int, default=None, help="GLOBAL batch (default 64/chip)")
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--model", choices=("dit", "unet"), default="dit")
    args = p.parse_args()

    n_chips = args.dp * args.tp * args.pp * args.dcn
    have = len(jax.devices())
    if have < n_chips:
        raise SystemExit(
            f"mesh needs {n_chips} devices, have {have} "
            f"({jax.devices()[0].platform}); attach a slice or set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n_chips}"
        )
    batch = args.batch or 64 * n_chips

    from bsi_tpu.core import BSI
    from bsi_tpu.data import SyntheticDataModule
    from bsi_tpu.models import DenoisingDiT, DenoisingVDMUNet
    from bsi_tpu.nn import FourierFeatures, NyquistPositionalEmbedding
    from bsi_tpu.parallel import make_mesh
    from bsi_tpu.train import EMAConfig, Trainer, make_optimizer, warmup_cosine_schedule

    data_shape = (32, 32, 3)
    if args.model == "dit":
        model = DenoisingDiT(
            data_shape=data_shape, patch_size=2, dim=1024, depth=24, heads=16,
            dropout=0.05, scan_blocks=args.pp > 1,
            fourier_features=FourierFeatures(n_min=6, n_max=8), dtype=jnp.bfloat16,
        )
    else:
        model = DenoisingVDMUNet(
            data_shape=data_shape, pos_emb=NyquistPositionalEmbedding(32, 100),
            dim=128, levels=32, pos_emb_mult=4, dropout=0.1,
            fourier_features=FourierFeatures(n_min=6, n_max=8), dtype=jnp.bfloat16,
        )
    algo = BSI(
        data_shape=data_shape, lambda_0=1e-2, alpha_M=1e6, alpha_R=2e6, k=50,
        preconditioning="edm",
    )
    data = SyntheticDataModule(
        n_train=max(4 * batch, 512), n_val=batch, data_shape=data_shape,
        batch_size=batch, train_eval_size=batch,
    )
    run_dir = Path("/tmp/bsi_tpu_bench_parallel")
    if run_dir.exists():  # metrics.jsonl appends; start from a clean slate
        import shutil

        shutil.rmtree(run_dir)
    trainer = Trainer(
        algorithm=algo,
        model=model,
        optimizer=make_optimizer(warmup_cosine_schedule(5e-4, 100, 10**6)),
        data=data,
        ema=EMAConfig(update_after_step=10**9),
        max_steps=args.steps,
        val_check_interval=10**9,
        log_every=1,
        run_dir=run_dir,
        seed=0,
        mesh=make_mesh(
            n_chips,
            model_parallelism=args.tp,
            pipeline_parallelism=args.pp,
            dcn_data_parallelism=args.dcn,
        ),
        fsdp=args.fsdp,
        sequence_parallel=args.sp,
        pp_microbatches=args.micro,
    )
    t0 = time.monotonic()
    trainer.fit()
    wall = time.monotonic() - t0

    recs = [
        json.loads(l)
        for l in (run_dir / "metrics.jsonl").read_text().splitlines()
        if '"train/loss"' in l
    ]
    # per-step time from the metric timestamps, skipping the compile step
    pts = [(r["step"], r["time"]) for r in recs]
    spans = [
        (s2 - s1, t2 - t1) for (s1, t1), (s2, t2) in zip(pts[1:], pts[2:]) if t2 > t1
    ]
    steps_done = sum(s for s, _ in spans)
    secs = sum(t for _, t in spans)
    step_s = secs / max(steps_done, 1)
    print(
        json.dumps(
            {
                "metric": f"bsi-{args.model} train throughput "
                f"(dp{args.dp} tp{args.tp} pp{args.pp}"
                f"{' sp' if args.sp else ''}{' fsdp' if args.fsdp else ''}"
                f"{f' dcn{args.dcn}' if args.dcn > 1 else ''}, global batch {batch})",
                "value": round(batch / step_s / n_chips, 1),
                "unit": "examples/sec/chip",
                "step_ms": round(step_s * 1e3, 1),
                "chips": n_chips,
                "wall_s": round(wall, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
