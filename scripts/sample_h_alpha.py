#!/usr/bin/env python
"""Per-noise-level decoding error over the test set.

Equivalent of the reference's scripts/sample_h_alpha.py: for a grid of
log-spaced precisions ``lambda``, noises each test example to that precision,
decodes with the EMA model, and records the mean squared decoding error in
bits — a diagnostic of where the model spends its capacity along the noise
schedule.

Usage: sample_h_alpha.py -c <ckpt_dir> -o out.npz [-n 1000]
"""

from __future__ import annotations

import argparse
import math
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from _common import eval_dataloader, load_trainer


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--checkpoint", required=True)
    parser.add_argument("-o", "--out", required=True)
    parser.add_argument("-n", "--num-lambdas", type=int, default=1000)
    parser.add_argument("--split", default="test")
    parser.add_argument("--seed", type=int, default=2363185049904024905 % (2**63))
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()

    trainer, config, data = load_trainer(args.checkpoint, args.overrides)
    algo = trainer.algorithm
    if not hasattr(algo, "_sample_q_mu_lambda"):
        raise SystemExit("sample_h_alpha requires a BSI-style algorithm")
    state = trainer.state
    model_fn = lambda mu, tt: trainer.eval_apply(state.ema_params, mu, tt, None)

    n = args.num_lambdas
    lambdas = jnp.logspace(
        math.log10(algo.lambda_0), math.log10(algo.lambda_0 + algo.alpha_M), n
    )
    t = algo.p_lambda.cdf(lambdas)

    @jax.jit
    def batch_errors(rng, x):
        # One model forward per lambda via lax.map: materializing all
        # n_lambdas x batch forwards at once OOMs at real model scale
        # (46 GB for the CIFAR UNet at n=32, batch 128)
        def one_lambda(args_):
            lam_i, t_i, key = args_
            mu = algo._sample_q_mu_lambda(key, x, jnp.full((x.shape[0],), lam_i))
            x_hat = algo._predict_x(model_fn, mu, jnp.full((x.shape[0],), t_i))
            return ((x - x_hat) ** 2).reshape(x.shape[0], -1).mean(-1)

        keys = jax.random.split(rng, n)
        return jax.lax.map(one_lambda, (lambdas, t, keys))

    rng = jax.random.key(args.seed)
    errors = []
    for batch, mask in eval_dataloader(data, args.split):
        rng, sub = jax.random.split(rng)
        err = np.asarray(batch_errors(sub, jnp.asarray(batch)))
        errors.append(err[:, mask] / math.log(2))
    errors = np.concatenate(errors, axis=1)

    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        out_path,
        ckpt=str(args.checkpoint),
        **{"lambda": np.asarray(lambdas), "squared_error_samples_bpd": errors},
    )
    print(f"wrote {out_path} ({errors.shape[1]} examples x {n} lambdas)")


if __name__ == "__main__":
    main()
