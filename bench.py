"""Headline benchmark: BSI sampling throughput on the flagship models.

Measures samples/sec/chip at k=128 sampling steps in bf16 compute for BOTH
serving-critical model families (the sampler is the hot loop of FID
evaluation and serving, SURVEY.md §6):

- CIFAR-10 VDM-UNet (dim 128 x 32 levels, the reference's cifar10-vdm
  recipe) — the headline number;
- DiT-L/2 at 32x32 (patch 2, dim 1024, depth 24, heads 16 — the reference's
  imagenet32 recipe, config/experiment/imagenet32.yaml:24-46) — reported in
  the same JSON line under "dit".

Baseline: no numbers are published in the reference repo (BASELINE.md). The
comparison constants below are analytic estimates of the torch reference on
one A100: UNet ~45 GFLOP/forward and DiT-L/2 ~161 GFLOP/forward x 128 steps
at TF32 (~60 TFLOP/s effective) ~ 8 and ~2.9 samples/sec respectively. The
driver-set target is >= 2x per chip.

The JSON line also carries "mfu" and "tflops_per_sec", computed from the
compiled XLA program's own FLOP count (cost analysis) against the chip's
peak — so the throughput number is self-validating: an inflated
samples/sec would imply an impossible MFU. The FLOP base counts the model
forward only ("flops_model": "forward-only"): per-step sampler arithmetic
is excluded, so the reported MFU is a slight conservative underestimate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import sys
import time

import jax

from bsi_tpu.utils import enable_compilation_cache

# Big-model compiles travel over a remote-compile RPC on the target TPU and
# can take tens of minutes cold; the persistent cache turns every rerun into
# a disk hit so the bench can't die in a compile (utils/compilation_cache.py)
enable_compilation_cache()

import jax.numpy as jnp


def _phase(msg: str) -> None:
    """Progress marker on stderr (stdout must stay one JSON line)."""
    print(f"[bench +{time.monotonic() - _T0:.0f}s] {msg}", file=sys.stderr, flush=True)


_T0 = time.monotonic()

# Analytic A100 estimates for the torch reference (see module docstring)
A100_BASELINE_UNET = 8.0
A100_BASELINE_DIT = 2.9
K_STEPS = 128
BATCH = 64

# Peak dense bf16 FLOP/s by TPU generation (public spec sheets)
PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5e": 197e12,
    "TPU v5": 459e12,  # v5p
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,  # v6e / Trillium
    "TPU v6e": 918e12,
}


def _peak_flops() -> float | None:
    kind = jax.devices()[0].device_kind
    for name, peak in sorted(PEAK_FLOPS.items(), key=lambda kv: -len(kv[0])):
        if kind.startswith(name):
            return peak
    return None


def _compiled_flops(jitted, *args) -> float | None:
    """FLOPs of one call as counted by XLA's cost analysis on the compiled
    program (includes every fusion; no hand-modeled terms).

    Caveat: XLA counts a `lax.scan`/while-loop BODY once, not times its trip
    count — callers must count loop-free programs (e.g. one model forward)
    and scale by the trip count themselves."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):  # older jax returns one dict per device
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def bench_sampling(model, algo, *, batch: int, n_iters: int = 3) -> dict:
    """Time `algo.sample` end-to-end (host fetch forces true completion) and
    self-validate with XLA-counted forward FLOPs x (k+1) model calls."""
    import numpy as np

    data_shape = algo.data_shape
    mu = jnp.zeros((batch,) + tuple(data_shape), jnp.float32)
    t = jnp.zeros((batch,), jnp.float32)
    params = model.init(jax.random.key(0), mu, t)

    model_fn = lambda m, tt: model.apply(params, m, tt)
    sample = jax.jit(lambda rng: algo.sample(model_fn, rng, batch))

    _phase(f"{type(model).__name__}: compiling sampler (cold compile can take minutes)")
    np.asarray(sample(jax.random.key(1)))  # warmup / compile
    _phase(f"{type(model).__name__}: compiled; timing {n_iters} iters")

    start = time.perf_counter()
    for i in range(n_iters):
        np.asarray(sample(jax.random.key(2 + i)))
    elapsed = time.perf_counter() - start
    samples_per_sec = n_iters * batch / elapsed

    record = {"value": round(samples_per_sec, 3), "unit": "samples/sec/chip"}
    # XLA's cost analysis counts the sampling scan's body once, so count one
    # (loop-free) preconditioned forward and scale by the k+1 model calls a
    # sample makes (k scan steps + the final decode).
    fwd = jax.jit(lambda mu, t: algo._predict_x(model_fn, mu, t))
    fwd_flops = _compiled_flops(fwd, mu, t)
    peak = _peak_flops()
    if fwd_flops is not None:
        flops_per_call = fwd_flops * (algo.k + 1)
        tflops = flops_per_call * n_iters / elapsed / 1e12
        record["tflops_per_sec"] = round(tflops, 1)
        record["flops_model"] = "forward-only"
        if peak is not None:
            record["mfu"] = round(tflops * 1e12 / peak, 3)
    return record


def main() -> None:
    from bsi_tpu.core import BSI
    from bsi_tpu.models import DenoisingDiT, DenoisingVDMUNet
    from bsi_tpu.nn import FourierFeatures, NyquistPositionalEmbedding

    data_shape = (32, 32, 3)
    algo = BSI(
        data_shape=data_shape,
        lambda_0=1e-2,
        alpha_M=1e6,
        alpha_R=2e6,
        k=K_STEPS,
        preconditioning="edm",
    )

    unet = DenoisingVDMUNet(
        data_shape=data_shape,
        pos_emb=NyquistPositionalEmbedding(32, 100),
        dim=128,
        levels=32,
        pos_emb_mult=4,
        fourier_features=FourierFeatures(n_min=6, n_max=8),
        dtype=jnp.bfloat16,
    )
    unet_rec = bench_sampling(unet, algo, batch=BATCH)

    # DiT-L/2, the ImageNet32 serving shape (imagenet32.yaml:24-46)
    dit = DenoisingDiT(
        data_shape=data_shape,
        patch_size=2,
        dim=1024,
        depth=24,
        heads=16,
        fourier_features=FourierFeatures(n_min=6, n_max=8),
        dtype=jnp.bfloat16,
    )
    dit_rec = bench_sampling(dit, algo, batch=BATCH)

    record = {
        "metric": f"bsi-cifar10-unet sampling throughput (k={K_STEPS}, bf16, batch {BATCH})",
        **unet_rec,
        "vs_baseline": round(unet_rec["value"] / A100_BASELINE_UNET, 3),
        "dit": {
            "metric": f"bsi-dit-L/2-32x32 sampling throughput (k={K_STEPS}, bf16, batch {BATCH})",
            **dit_rec,
            "vs_baseline": round(dit_rec["value"] / A100_BASELINE_DIT, 3),
        },
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
