#!/usr/bin/env python
"""End-to-end training parity vs the EXECUTED torch reference (BSI/VDM/BFN).

The zero-egress image has no real datasets, so the driver's "bpd within
1e-3" target cannot be measured on CIFAR yet. This script produces the
substitute evidence: it trains the torch reference (imported from
/root/reference and executed, never copied) and this framework on IDENTICAL
synthetic 8-bit data with an IDENTICAL recipe — same initial weights
(transferred), same batch sequence (same index-stream seed), same
algorithm hyperparameters, AdamW, constant LR, grad-clip 1.0, and EMA
schedule — then compares final validation bpd of the EMA model.
``--algo`` selects the algorithm; all three share the task machinery, so
this covers the integration (EMA cadence, loss scaling, eval wiring) that
the exact core-formula tests cannot.

Reference oracles: bsi/bsi.py:152-310, bsi/vdm.py:60-262, bsi/bfn.py:59-219
(elbo/train_loss), bsi/tasks/{bsi,vdm,bfn}.py (training/eval semantics),
bsi/tasks/ema_pytorch.py (EMA).

Only RNG streams differ (torch generator vs JAX threefry), so agreement is
statistical: the script reports the torch seed-to-seed spread and the eval
estimator noise alongside the cross-framework gap. Writes PARITY_TRAIN.json
(one entry per algorithm)."""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from _common import REPO_ROOT  # noqa: E402

sys.path.insert(0, str(REPO_ROOT))
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

import jax

jax.config.update("jax_platforms", "cpu")  # torch is CPU; keep it symmetric

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

HP = {
    "bsi": dict(lambda_0=1e-2, alpha_M=1e6, alpha_R=2e6, k=16, preconditioning="edm"),
    "vdm": dict(snr_min=6.73794699909e-3, snr_max=597195.613793, k=16),
    "bfn": dict(sigma_1=1e-3, k=16, x_min=-1.0, x_max=1.0, t_min=1e-6),
}
EMA_HP = dict(beta=0.9999, update_after_step=200, update_every=1, inv_gamma=1.0, power=2 / 3)
OPT_HP = dict(lr=1e-3, betas=(0.9, 0.999), weight_decay=0.01)
DATA_SHAPE = (8,)
N_TRAIN, N_VAL = 4096, 1024
POS_EMB = (32, 1000)


def make_data(seed: int = 13):
    """Mixture-of-sinusoids vectors quantized to 8-bit bin centers."""
    rng = np.random.default_rng(seed)

    def make(n):
        grid = np.linspace(0, 1, DATA_SHAPE[0])
        freq = rng.uniform(0.5, 3.0, size=(n, 1))
        phase = rng.uniform(0, 2 * np.pi, size=(n, 1))
        amp = rng.uniform(0.3, 1.0, size=(n, 1))
        base = amp * np.sin(2 * np.pi * freq * grid[None, :] + phase)
        levels = np.round((base * 0.5 + 0.5) * 255)
        return (levels / 255 * 2 - 1).astype(np.float32)

    return make(N_TRAIN), make(N_VAL)


def batch_stream(train: np.ndarray, batch: int, steps: int, seed: int):
    """The SAME batch sequence for both frameworks."""
    from bsi_tpu.data.sampler import InfiniteIndexStream

    stream = InfiniteIndexStream(len(train), seed)
    return [train[stream.next_indices(batch)] for _ in range(steps)]


# ---------------------------------------------------------------- JAX side


def make_jax_algo(name: str):
    from bsi_tpu.core import BFN, BSI, Discretization, VDM

    disc = Discretization.image_8bit()
    cls = {"bsi": BSI, "vdm": VDM, "bfn": BFN}[name]
    return cls(data_shape=DATA_SHAPE, discretization=disc, **HP[name])


def make_torch_algo(name: str, model):
    from bsi.bfn import BFN as RefBFN
    from bsi.bsi import BSI as RefBSI, Discretization as RefDisc
    from bsi.vdm import VDM as RefVDM

    disc = RefDisc.image_8bit()
    cls = {"bsi": RefBSI, "vdm": RefVDM, "bfn": RefBFN}[name]
    return cls(model, data_shape=DATA_SHAPE, discretization=disc, **HP[name])


def train_jax(algo_name, batches, val, *, hidden: int, layers: int, seed: int = 0):
    from bsi_tpu.models import DenoisingMLP
    from bsi_tpu.nn import NyquistPositionalEmbedding
    from bsi_tpu.train import EMAConfig, TrainState, make_optimizer, make_train_step

    algo = make_jax_algo(algo_name)
    model = DenoisingMLP(
        data_shape=DATA_SHAPE, pos_emb=NyquistPositionalEmbedding(*POS_EMB),
        hidden_width=hidden, layers=layers,
    )
    tx = make_optimizer(OPT_HP["lr"], betas=OPT_HP["betas"],
                        weight_decay=OPT_HP["weight_decay"], gradient_clip=1.0)

    params = model.init(jax.random.key(seed), jnp.zeros((2,) + DATA_SHAPE), jnp.zeros(2))
    state = TrainState.create(
        params=params, opt_state=tx.init(params), rng=jax.random.key(seed + 1)
    )

    apply = lambda p, mu, t, rng: model.apply(p, mu, t)
    step_fn = jax.jit(make_train_step(algo, apply, tx, EMAConfig(**EMA_HP)))
    losses = []
    for b in batches:
        state, metrics = step_fn(state, jnp.asarray(b))
        losses.append(float(metrics["train/loss"]))

    def eval_bpd(eval_seed: int, n_recon=4, n_measure=32, bs=256):
        model_fn = lambda mu, t: model.apply(state.ema_params, mu, t)
        rng = jax.random.key(eval_seed)
        bpds = []
        for i in range(0, len(val), bs):
            rng, sub = jax.random.split(rng)
            _, bpd, _ = algo.elbo(model_fn, sub, jnp.asarray(val[i : i + bs]),
                                  n_recon, n_measure)
            bpds.append(np.asarray(bpd))
        return float(np.concatenate(bpds).mean())

    return params, losses, eval_bpd


# -------------------------------------------------------------- torch side


def jax_params_to_torch(params, ref_model, torch, layers: int):
    """Load the JAX MLP init into the reference torch MLP (inverse of the
    mapping validated in tests/test_weight_transfer.py)."""
    p = params["params"]
    with torch.no_grad():
        for i in range(layers):
            lin = ref_model.layers[2 * i]
            lin.weight.copy_(torch.tensor(np.asarray(p["trunk"][f"Dense_{i}"]["kernel"]).T))
            lin.bias.copy_(torch.tensor(np.asarray(p["trunk"][f"Dense_{i}"]["bias"])))
        head = ref_model.layers[2 * layers]
        head.weight.copy_(torch.tensor(np.asarray(p["head"]["kernel"]).T))
        head.bias.copy_(torch.tensor(np.asarray(p["head"]["bias"])))


def train_torch(algo_name, batches, val, jax_params, *, hidden: int, layers: int,
                seed: int = 0):
    import torch

    from bsi.models.mlp import DenoisingMLP as RefMLP
    from bsi.models.pos_emb import NyquistPositionalEmbedding as RefEmb
    from bsi.tasks.ema_pytorch import EMA as RefEMA

    torch.manual_seed(seed)
    model = RefMLP(
        data_shape=DATA_SHAPE, pos_emb=RefEmb(*POS_EMB), hidden_width=hidden,
        layers=layers, actfn="silu", zero_init=False,
    )
    jax_params_to_torch(jax_params, model, torch, layers)
    algo = make_torch_algo(algo_name, model)
    opt = torch.optim.AdamW(model.parameters(), lr=OPT_HP["lr"],
                            betas=OPT_HP["betas"], weight_decay=OPT_HP["weight_decay"])
    ema = RefEMA(model, include_online_model=False, **EMA_HP)
    gen = torch.Generator().manual_seed(seed + 100)

    losses = []
    for b in batches:
        loss = algo.train_loss(torch.tensor(b), gen).mean()
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        ema.update()
        losses.append(float(loss))

    ema_algo = make_torch_algo(algo_name, ema.ema_model)

    def eval_bpd(eval_seed: int, n_recon=4, n_measure=32, bs=256):
        g = torch.Generator().manual_seed(eval_seed)
        bpds = []
        with torch.no_grad():
            for i in range(0, len(val), bs):
                _, bpd, _ = ema_algo.elbo(torch.tensor(val[i : i + bs]), n_recon,
                                          n_measure, g)
                bpds.append(bpd.numpy())
        return float(np.concatenate(bpds).mean())

    return losses, eval_bpd


# ------------------------------------------------------------------- main


def run_algo(algo_name: str, steps: int = 3000, batch: int = 128, hidden: int = 128,
             layers: int = 3, n_seeds: int = 1) -> dict:
    """Train both frameworks with ``n_seeds`` training seeds each and compare
    the across-seed mean EMA-model validation bpd. Each run's bpd is itself
    averaged over 3 eval seeds to suppress ELBO estimator noise."""
    train, val = make_data()
    batches = batch_stream(train, batch, steps, seed=7)

    jax_runs, torch_runs = [], []
    t_jax = t_torch = 0.0
    jax_losses = torch_losses = None
    for seed in range(n_seeds):
        t0 = time.time()
        jax_params, jax_losses, jax_eval = train_jax(
            algo_name, batches, val, hidden=hidden, layers=layers, seed=2 * seed
        )
        t_jax += time.time() - t0
        jax_runs.append([jax_eval(s) for s in (1, 2, 3)])

        t0 = time.time()
        torch_losses, torch_eval = train_torch(algo_name, batches, val, jax_params,
                                               hidden=hidden, layers=layers, seed=seed)
        t_torch += time.time() - t0
        torch_runs.append([torch_eval(s) for s in (1, 2, 3)])

    jax_by_seed = [float(np.mean(r)) for r in jax_runs]
    torch_by_seed = [float(np.mean(r)) for r in torch_runs]

    result = {
        "algorithm": algo_name,
        "steps": steps, "batch": batch, "hidden": hidden, "layers": layers,
        "n_train_seeds": n_seeds,
        "recipe": {"algo": HP[algo_name], "ema": EMA_HP, "opt": OPT_HP},
        "jax": {
            "final_train_loss": float(np.mean(jax_losses[-50:])),
            "val_bpd_by_train_seed": jax_by_seed,
            "val_bpd": float(np.mean(jax_by_seed)),
            "train_seconds": t_jax,
        },
        "torch": {
            "final_train_loss": float(np.mean(torch_losses[-50:])),
            "val_bpd_by_train_seed": torch_by_seed,
            "val_bpd": float(np.mean(torch_by_seed)),
            "train_seconds": t_torch,
        },
    }
    result["bpd_gap"] = abs(result["jax"]["val_bpd"] - result["torch"]["val_bpd"])
    result["torch_seed_spread"] = float(np.ptp(torch_by_seed)) if n_seeds > 1 else None
    result["jax_seed_spread"] = float(np.ptp(jax_by_seed)) if n_seeds > 1 else None
    result["eval_noise_sigma"] = float(
        max(np.std(jax_runs[0]), np.std(torch_runs[0]))
    )
    gap, spread = result["bpd_gap"], result["torch_seed_spread"]
    print(
        f"\n[{algo_name}] bpd gap jax-vs-torch (means over {n_seeds} train seeds): "
        f"{gap:.5f}  (torch seed spread: {spread}, jax seed spread: "
        f"{result['jax_seed_spread']}, eval sigma: {result['eval_noise_sigma']:.5f})",
        flush=True,
    )
    return result


def run(algos=("bsi",), steps: int = 3000, batch: int = 128, hidden: int = 128,
        layers: int = 3, out: str | None = None, n_seeds: int = 1) -> dict:
    results = [
        run_algo(a, steps=steps, batch=batch, hidden=hidden, layers=layers,
                 n_seeds=n_seeds)
        for a in algos
    ]
    summary = {"results": results, "max_gap": max(r["bpd_gap"] for r in results)}
    if out:
        Path(out).write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2))
    return summary


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--algos", nargs="+", default=["bsi", "vdm", "bfn"])
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--hidden", type=int, default=128)
    parser.add_argument("--layers", type=int, default=3)
    parser.add_argument("--n-seeds", type=int, default=1)
    parser.add_argument("-o", "--out", default=str(REPO_ROOT / "PARITY_TRAIN.json"))
    a = parser.parse_args()
    run(tuple(a.algos), a.steps, a.batch, a.hidden, a.layers, a.out, n_seeds=a.n_seeds)
