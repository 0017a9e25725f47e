#!/usr/bin/env python
"""Bulk sampling from a checkpoint.

Equivalent of the reference's scripts/generate_samples.py: draws ``n``
samples at a given step count / schedule (EMA weights by default, ``--noema``
for the raw online weights), saves the samples — plus Inception embeddings
and FID when weights and precomputed stats are available — to one ``.npz``.

Usage: generate_samples.py -c <ckpt_dir> -o out.npz -n 1024 [-k 128]
                           [-s linear] [--noema] [overrides...]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import numpy as np

from _common import load_trainer

from bsi_tpu.core import get_schedule
from bsi_tpu.metrics import (
    FeatureStats,
    default_weights_path,
    fid_from_stats,
    fid_stats_path,
    images_to_uint8,
    load_params,
    make_embed_fn,
)
from bsi_tpu.train import make_sample_fn


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--checkpoint", required=True)
    parser.add_argument("-o", "--out", required=True)
    parser.add_argument("-n", "--num-samples", type=int, required=True)
    parser.add_argument("-k", type=int, default=None)
    parser.add_argument("-s", "--schedule", default="linear")
    parser.add_argument("--noema", action="store_true", help="use raw (non-EMA) weights")
    parser.add_argument("--seed", type=int, default=5410195033249451849 % (2**63))
    parser.add_argument("--fid-stats-root", default=".")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()

    trainer, config, data = load_trainer(args.checkpoint, args.overrides)
    algo = trainer.algorithm
    disc = data.discretization()
    k = args.k or algo.k
    t = get_schedule(args.schedule, k, algo)
    sample_fn = make_sample_fn(algo, trainer.eval_apply, use_ema=not args.noema)

    batch_size = data.eval_batch_size
    rng = jax.random.key(args.seed)
    chunks = []
    remaining = args.num_samples
    while remaining > 0:
        rng, sub = jax.random.split(rng)
        batch = sample_fn(trainer.state, sub, batch_size, t=t)
        chunks.append(np.asarray(batch)[: min(batch_size, remaining)])
        remaining -= batch_size
        print(f"{args.num_samples - max(remaining, 0)}/{args.num_samples}", end="\r")
    samples = np.concatenate(chunks)

    out = {"samples": samples, "k": k, "schedule": args.schedule, "ema": not args.noema}

    weights = default_weights_path()
    if weights is not None:
        embed = make_embed_fn(load_params(weights))
        imgs = images_to_uint8(np.asarray(disc.to_unit_interval(samples)))
        stats = FeatureStats(2048)
        for s in range(0, len(imgs), 256):
            stats.update(np.asarray(embed(imgs[s : s + 256])))
        out["embedding_sum"] = stats.sum
        out["embedding_cov_sum"] = stats.cov_sum
        out["embedding_n"] = stats.n
        for split in ("train", "test"):
            path = fid_stats_path(args.fid_stats_root, data.short_name(), split)
            if path.exists():
                out[f"fid_{split}"] = fid_from_stats(stats, FeatureStats.from_npz(path))
                print(f"\nFID vs {split}: {out[f'fid_{split}']:.3f}")

    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out_path, **out)
    print(f"\nwrote {out_path} ({len(samples)} samples)")


if __name__ == "__main__":
    main()
