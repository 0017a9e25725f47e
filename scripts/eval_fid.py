#!/usr/bin/env python
"""Evaluate FID over sampling-step counts and schedules.

Equivalent of the reference's scripts/eval_fid.py: for each ``k`` in the
sweep, draws ``n`` samples with the chosen schedule (linear / cosine / edm /
edm7 in lambda-variance space), embeds them with the FID InceptionV3, and
computes FID against the precomputed train AND test statistics.

Usage: eval_fid.py -c <ckpt_dir> -o out.json -k 10 20 50 [-s linear] [-n N]
                   [--fid-stats-root .] [overrides...]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import numpy as np

from _common import load_trainer

from bsi_tpu.core import get_schedule
from bsi_tpu.metrics import (
    FeatureStats,
    fid_from_stats,
    fid_stats_path,
    default_weights_path,
    images_to_uint8,
    load_params,
    make_embed_fn,
)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--checkpoint", required=True)
    parser.add_argument("-o", "--out", required=True)
    parser.add_argument("-n", "--num-samples", type=int, default=None)
    parser.add_argument("-s", "--schedule", default="linear")
    parser.add_argument("-k", nargs="+", type=int, required=True)
    parser.add_argument("--fid-stats-root", default=".")
    parser.add_argument("--inception-weights", default=None)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()

    weights = args.inception_weights or default_weights_path()
    if weights is None:
        raise SystemExit(
            "Inception weights not found: pass --inception-weights or set "
            "BSI_TPU_INCEPTION_WEIGHTS (no network egress in this environment)"
        )
    embed = make_embed_fn(load_params(weights))

    trainer, config, data = load_trainer(args.checkpoint, args.overrides)
    algo = trainer.algorithm
    disc = data.discretization()

    real_stats = {
        split: FeatureStats.from_npz(
            fid_stats_path(args.fid_stats_root, data.short_name(), split)
        )
        for split in ("train", "test")
    }
    n = args.num_samples or real_stats["test"].n
    batch_size = args.batch_size or data.eval_batch_size

    rng = jax.random.key(5410195033249451849 % (2**63))
    fids: dict[int, dict[str, float]] = {}
    out_path = Path(args.out)
    try:
        for k in args.k:
            t = get_schedule(args.schedule, k, algo)
            fake = FeatureStats(len(real_stats["test"].sum))
            remaining = n
            while remaining > 0:
                take = min(batch_size, remaining)
                rng, sub = jax.random.split(rng)
                batch = trainer.sample_fn(trainer.state, sub, batch_size, t=t)
                imgs = images_to_uint8(np.asarray(disc.to_unit_interval(batch)))[:take]
                fake.update(np.asarray(embed(imgs)))
                remaining -= take
            fids[k] = {
                split: fid_from_stats(fake, real_stats[split]) for split in real_stats
            }
            print(f"k={k}: {fids[k]}")
    finally:
        out_path.parent.mkdir(parents=True, exist_ok=True)
        out_path.write_text(
            json.dumps(
                {
                    "ckpt": str(args.checkpoint),
                    "config": {
                        "n": n,
                        "k": args.k,
                        "schedule": args.schedule,
                        "overrides": args.overrides,
                    },
                    "fid": fids,
                }
            )
        )


if __name__ == "__main__":
    main()
