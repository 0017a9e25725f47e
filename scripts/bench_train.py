#!/usr/bin/env python
"""Training-throughput benchmark for the flagship recipes on one chip.

Measures the fused train step (loss + backward + AdamW + EMA in a single
donated jitted program, `bsi_tpu/train/step.py`) for either flagship model:

- `--model unet`: CIFAR-10 VDM-UNet dim 128 x 32 levels, dropout 0.1,
  batch 128 (the reference's cifar10-vdm recipe);
- `--model dit`: DiT-L/2 at 32x32, dropout 0.05, batch 64 (the single-chip
  operating point of the reference's imagenet32 recipe).

Timing protocol (PERF_NOTES.md): steps are chained through the donated
TrainState at Python level and the LAST step's loss is fetched to host —
on the axon tunnel a host fetch is the only reliable completion barrier,
so runtime readiness tricks cannot inflate the number. MFU is model-FLOPs
MFU: 3x the XLA-cost-analysis FLOP count of one deterministic forward
(the fwd+bwd convention used throughout PERF_NOTES), against the chip's
peak dense bf16 FLOP/s.

Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
from _common import REPO_ROOT  # noqa: F401  (puts the repo root on sys.path)

import jax  # noqa: E402

from bsi_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# Peak dense bf16 FLOP/s by TPU generation (public spec sheets)
PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def _peak() -> float | None:
    kind = jax.devices()[0].device_kind
    for name, peak in sorted(PEAK_FLOPS.items(), key=lambda kv: -len(kv[0])):
        if kind.startswith(name):
            return peak
    return None


def _phase(msg: str) -> None:
    print(f"[bench_train] {msg}", file=sys.stderr, flush=True)


def build(model_name: str, *, remat: bool, mu_dtype: str | None, batch: int | None,
          nu_dtype: str | None = None):
    from bsi_tpu.core import BSI
    from bsi_tpu.models import DenoisingDiT, DenoisingVDMUNet
    from bsi_tpu.nn import FourierFeatures, NyquistPositionalEmbedding
    from bsi_tpu.train import EMAConfig, make_optimizer, warmup_cosine_schedule

    data_shape = (32, 32, 3)
    if model_name == "unet":
        batch = batch or 128
        model = DenoisingVDMUNet(
            data_shape=data_shape,
            pos_emb=NyquistPositionalEmbedding(32, 100),
            dim=128,
            levels=32,
            pos_emb_mult=4,
            dropout=0.1,
            fourier_features=FourierFeatures(n_min=6, n_max=8),
            dtype=jnp.bfloat16,
        )
        lr = 2e-4
    elif model_name == "dit":
        batch = batch or 64
        model = DenoisingDiT(
            data_shape=data_shape,
            patch_size=2,
            dim=1024,
            depth=24,
            heads=16,
            dropout=0.05,
            remat=remat,
            fourier_features=FourierFeatures(n_min=6, n_max=8),
            dtype=jnp.bfloat16,
        )
        lr = 5e-4
    else:
        raise ValueError(model_name)

    algo = BSI(
        data_shape=data_shape, lambda_0=1e-2, alpha_M=1e6, alpha_R=2e6, k=50,
        preconditioning="edm",
    )
    tx = make_optimizer(
        warmup_cosine_schedule(lr, warmup_steps=100, max_steps=10**6),
        mu_dtype=mu_dtype,
        nu_dtype=nu_dtype,
    )
    ema = EMAConfig(update_after_step=1000)
    return model, algo, tx, ema, batch


def run(
    model_name: str,
    *,
    batch: int | None = None,
    steps: int = 30,
    remat: bool = False,
    mu_dtype: str | None = None,
    nu_dtype: str | None = None,
    accum: int = 1,
    dropout_impl: str | None = None,
) -> dict:
    """Measure the fused train step for one flagship recipe; returns the
    JSON record (does not print). Importable by the top-level ``bench.py``
    so the driver-visible artifact carries training throughput too.

    ``accum``: gradient accumulation — ``batch`` stays the OPTIMIZER batch
    and is split into ``accum`` sequential on-device micro-batches via the
    in-step lax.scan (train/step.py), the same contract as
    ``trainer.accumulate_grad_batches``. This is how the reference's
    imagenet32 recipe batch 512 fits one chip at micro-batch 64
    (/root/reference/config/experiment/imagenet32.yaml:24-46)."""
    from bsi_tpu.train.state import TrainState
    from bsi_tpu.train.step import make_train_step

    model, algo, tx, ema, batch = build(
        model_name, remat=remat, mu_dtype=mu_dtype, batch=batch, nu_dtype=nu_dtype
    )
    if batch % accum != 0:
        raise ValueError(f"batch {batch} not divisible by accum {accum}")
    micro = batch // accum

    data_shape = algo.data_shape
    mu = jnp.zeros((micro,) + tuple(data_shape), jnp.float32)
    t = jnp.linspace(0.0, 1.0, micro)
    _phase(f"{model_name}: init params")
    params = model.init(jax.random.key(0), mu, t)

    def model_apply(p_, mu_, t_, rng):
        rngs = {"dropout": rng} if rng is not None else None
        return model.apply(p_, mu_, t_, deterministic=False, rngs=rngs)

    step_fn = jax.jit(
        make_train_step(
            algo, model_apply, tx, ema, accum_steps=accum,
            dropout_prng_impl=dropout_impl,
        ),
        donate_argnums=0,
    )
    state = TrainState.create(
        params=params, opt_state=tx.init(params), rng=jax.random.key(1)
    )

    # synthetic 8-bit-quantized batch, fixed on device
    x = np.random.default_rng(0).integers(0, 256, (batch,) + tuple(data_shape))
    x = jnp.asarray(x / 255.0 * 2.0 - 1.0, jnp.float32)
    if accum > 1:
        x = x.reshape((accum, micro) + tuple(data_shape))

    _phase("compiling train step (cold compile can take minutes)")
    state, metrics = step_fn(state, x)
    float(metrics["train/loss"])  # completion barrier
    _phase(f"compiled; timing {steps} chained steps")

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, x)
    final_loss = float(metrics["train/loss"])  # host fetch forces the whole chain
    elapsed = time.perf_counter() - t0

    step_ms = elapsed / steps * 1e3
    ex_per_sec = batch * steps / elapsed

    label = f"batch {batch}" + (f" = {accum} x {micro} accum" if accum > 1 else "")
    record = {
        "metric": f"bsi-{model_name} train throughput (bf16, {label})",
        "value": round(ex_per_sec, 1),
        "unit": "examples/sec/chip",
        "step_ms": round(step_ms, 1),
        "final_loss": round(final_loss, 4),
        "remat": bool(remat),
        "mu_dtype": mu_dtype,
        "nu_dtype": nu_dtype,
        "dropout_impl": dropout_impl,
    }
    if accum > 1:
        record["accum"] = accum

    # model-FLOPs MFU: 3x one deterministic forward (at micro-batch size,
    # scaled by the accum micro-steps per optimizer step), XLA-counted
    try:
        fwd = jax.jit(
            lambda p_, mu_, t_: algo._predict_x(
                lambda m, tt: model.apply(p_, m, tt, deterministic=True), mu_, t_
            )
        )
        cost = fwd.lower(params, mu, t).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        fwd_flops = float(cost.get("flops", 0.0))
        peak = _peak()
        if fwd_flops > 0:
            tflops = 3 * fwd_flops * accum * steps / elapsed / 1e12
            record["tflops_per_sec"] = round(tflops, 1)
            record["flops_model"] = "3x-forward"
            if peak is not None:
                record["mfu"] = round(tflops * 1e12 / peak, 3)
    except Exception as e:  # cost analysis is best-effort
        record["flops_error"] = str(e)

    return record


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=("unet", "dit"), default="unet")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--mu-dtype", default=None, choices=(None, "bfloat16"))
    p.add_argument("--nu-dtype", default=None, choices=(None, "bfloat16"))
    p.add_argument("--accum", type=int, default=1)
    p.add_argument("--dropout-impl", default=None, choices=(None, "rbg", "unsafe_rbg"))
    args = p.parse_args(argv)
    record = run(
        args.model,
        batch=args.batch,
        steps=args.steps,
        remat=args.remat,
        mu_dtype=args.mu_dtype,
        nu_dtype=args.nu_dtype,
        accum=args.accum,
        dropout_impl=args.dropout_impl,
    )
    print(json.dumps(record))


if __name__ == "__main__":
    main()
