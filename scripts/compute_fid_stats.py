#!/usr/bin/env python
"""Precompute real-dataset Inception statistics for FID.

Equivalent of the reference's scripts/compute_fid_stats.py: embeds a data
split with the FID InceptionV3 and stores (n, sum, cov_sum) — the
torchmetrics state format — under ``data/fid-stats/<dataset>/<split>.npz``.

Usage: compute_fid_stats.py <dataset> <split> [--inception-weights W]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from _common import REPO_ROOT

from bsi_tpu.config import ConfigLoader, instantiate
from bsi_tpu.metrics import (
    FeatureStats,
    default_weights_path,
    fid_stats_path,
    images_to_uint8,
    load_params,
    make_embed_fn,
)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("dataset")
    parser.add_argument("split", choices=["train", "val", "test"])
    parser.add_argument("--inception-weights", default=None)
    parser.add_argument("--batch-size", type=int, default=512)
    parser.add_argument("--out-root", default=str(REPO_ROOT))
    args = parser.parse_args()

    weights = args.inception_weights or default_weights_path()
    if weights is None:
        raise SystemExit(
            "Inception weights not found: pass --inception-weights or set "
            "BSI_TPU_INCEPTION_WEIGHTS"
        )
    embed = make_embed_fn(load_params(weights))

    loader = ConfigLoader(REPO_ROOT / "configs")
    config = loader.load(
        "train", [f"data={args.dataset}", f"data.eval_batch_size={args.batch_size}"]
    )
    data = instantiate(config["data"], seed=0)
    disc = data.discretization()

    if args.split == "train":
        # Full training data (including the val split): the reference computes
        # train stats on the complete train set (scripts/compute_fid_stats.py:40-43)
        sources = [data._train, data._val]
    elif args.split == "val":
        sources = [data.eval_splits()["val"]]
    else:
        sources = [data.test_splits()["test"]]

    total = sum(len(s) for s in sources)
    stats = FeatureStats(2048)
    for arrays in sources:
        for start in range(0, len(arrays), args.batch_size):
            idx = np.arange(start, min(start + args.batch_size, len(arrays)))
            batch = data._prepare(arrays[idx])
            imgs = images_to_uint8(np.asarray(disc.to_unit_interval(batch)))
            stats.update(np.asarray(embed(imgs)))
            print(f"{stats.n}/{total}", end="\r")

    out = fid_stats_path(args.out_root, data.short_name(), args.split)
    stats.save_npz(out)
    print(f"\nwrote {out} (n={stats.n})")


if __name__ == "__main__":
    main()
