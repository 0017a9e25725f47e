#!/usr/bin/env python
"""Save full sampling trajectories as 8-bit arrays.

Equivalent of the reference's scripts/generate_sample_history.py: runs
``sample_history`` and stores the (mus, x_hats, ys) trajectories — or just
x_hats for VDM — as uint8 ``.npz``.

Usage: generate_sample_history.py -c <ckpt_dir> -o out.npz -n 16 [-k 64]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from _common import load_trainer

from bsi_tpu.core import get_schedule


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--checkpoint", required=True)
    parser.add_argument("-o", "--out", required=True)
    parser.add_argument("-n", "--num-samples", type=int, default=16)
    parser.add_argument("-k", type=int, default=None)
    parser.add_argument("-s", "--schedule", default="linear")
    parser.add_argument("--seed", type=int, default=2363185049904024905 % (2**63))
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()

    trainer, config, data = load_trainer(args.checkpoint, args.overrides)
    algo = trainer.algorithm
    disc = data.discretization()
    k = args.k or algo.k
    t = get_schedule(args.schedule, k, algo)

    state = trainer.state
    model_fn = lambda mu, tt: trainer.eval_apply(state.ema_params, mu, tt, None)
    history = algo.sample_history(model_fn, jax.random.key(args.seed), args.num_samples, t=t)

    to8 = lambda a: np.asarray(disc.to_8bit_image(jnp.asarray(a)))
    if isinstance(history, tuple):
        mus, x_hats, ys = history
        out = {"mus": to8(mus), "x_hats": to8(x_hats), "ys": to8(ys)}
    else:  # VDM returns only the x_hat trajectory
        out = {"x_hats": to8(history)}

    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out_path, **out)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
