#!/usr/bin/env python
"""Evaluate bits-per-dim via the infinite- or finite-step ELBO.

Equivalent of the reference's scripts/eval_elbo.py: for each requested step
count ``k`` (or "inf"), computes the per-example bpd with Monte Carlo
variance estimates over a data split, and aggregates the across-batch and
within-estimator variances into one standard error.

Usage: eval_elbo.py -c <ckpt_dir> -o out.json [-k inf 10 100] [--split test]
                    [-r 4] [-m 4] [overrides...]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from _common import eval_dataloader, load_trainer


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--checkpoint", required=True)
    parser.add_argument("-o", "--out", required=True)
    parser.add_argument("-k", nargs="+", default=["inf"], help="step counts or 'inf'")
    parser.add_argument("--split", default="test")
    parser.add_argument("-r", "--recon-samples", type=int, default=2)
    parser.add_argument("-m", "--measure-samples", type=int, default=2)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()

    trainer, config, data = load_trainer(args.checkpoint, args.overrides)
    algo = trainer.algorithm
    state = trainer.state
    model_fn = lambda mu, t: trainer.eval_apply(state.ema_params, mu, t, None)

    @jax.jit
    def batch_bpd(rng, x, t):
        if t is None:
            _, bpd, extra = algo.elbo(
                model_fn, rng, x, args.recon_samples, args.measure_samples,
                estimate_var=True,
            )
        else:
            _, bpd, extra = algo.finite_elbo(
                model_fn, rng, x, args.recon_samples, args.measure_samples,
                t=t, estimate_var=True,
            )
        return bpd, extra["bpd_var"]

    results_mean, results_var = {}, {}
    rng = jax.random.key(5410195033249451849 % (2**63))
    for k in args.k:
        if k == "inf":
            t = None
        else:
            steps = int(k)
            from bsi_tpu.core import VDM

            t = (
                jnp.linspace(1.0, 0.0, steps + 1)
                if isinstance(algo, VDM)
                else jnp.linspace(0.0, 1.0, steps + 1)
            )
        bpds, bpd_vars = [], []
        for batch, mask in eval_dataloader(data, args.split):
            rng, sub = jax.random.split(rng)
            bpd, var = batch_bpd(sub, jnp.asarray(batch), t)
            bpds.append(np.asarray(bpd)[mask])
            bpd_vars.append(np.asarray(var)[mask])
        bpds = np.concatenate(bpds)
        bpd_vars = np.concatenate(bpd_vars)
        n = len(bpds)
        results_mean[str(k)] = float(bpds.mean())
        results_var[str(k)] = float((bpds.var(ddof=1) + bpd_vars.mean()) / n)
        print(
            f"k={k}: bpd {results_mean[str(k)]:.4f} "
            f"+- {np.sqrt(results_var[str(k)]):.4f} (n={n})"
        )

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(
        json.dumps(
            {
                "ckpt": str(args.checkpoint),
                "config": {
                    "split": args.split,
                    "r_samples": args.recon_samples,
                    "m_samples": args.measure_samples,
                    "k": args.k,
                    "overrides": args.overrides,
                },
                "bpd_means": results_mean,
                "bpd_mean_vars": results_var,
            }
        )
    )


if __name__ == "__main__":
    main()
