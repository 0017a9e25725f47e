"""Headline benchmark: sampling AND training throughput on the flagship models.

Serving (the hot loop of FID evaluation and serving, SURVEY.md §6) —
samples/sec/chip at k=128 sampling steps in bf16:

- CIFAR-10 VDM-UNet (dim 128 x 32 levels, the reference's cifar10-vdm
  recipe) — the headline number;
- DiT-L/2 at 32x32 (patch 2, dim 1024, depth 24, heads 16 — the reference's
  imagenet32 recipe, config/experiment/imagenet32.yaml:24-46).

Training (the hot path being beaten: /root/reference/bsi/tasks/bsi.py:187-198) —
examples/sec/chip for the fused donated train step (loss+backward+AdamW+EMA):

- UNet at batch 128 (cifar10-vdm recipe);
- DiT-L/2 at batch 64 with mu/nu_dtype=bfloat16, explicit remat, and
  rbg dropout masks (the measured-best single-chip operating point,
  PERF_NOTES.md round-4/5 tables), plus the imagenet32 recipe's optimizer
  batch 512 via the 16x32 in-step accumulation scan.

Baseline: no numbers are published in the reference repo (BASELINE.md). The
comparison constants below are analytic estimates of the torch reference on
one A100: UNet ~45 GFLOP/forward and DiT-L/2 ~161 GFLOP/forward x 128 steps
at TF32 (~60 TFLOP/s effective) ~ 8 and ~2.9 samples/sec respectively. The
driver-set target is >= 2x per chip.

Every record carries "mfu" and "tflops_per_sec", computed from the compiled
XLA program's own FLOP count (cost analysis) against the chip's peak — the
throughput numbers are self-validating: an inflated samples/sec would imply
an impossible MFU.

Fault isolation (the round-3 lesson — a single remote-compile RPC flake
erased the whole round's perf evidence): every benchmark runs in a bounded
retry loop that rebuilds the model and jit closure from scratch per attempt
(the persistent compile cache makes a retry after a transport flake a disk
hit), failures degrade to an {"error": ...} field instead of killing the
process, and EACH record is printed to stdout the moment it is measured.
stdout stays line-oriented JSON; the FINAL line is the combined headline
record, so both "parse the last line" and "parse any line" drivers see a
valid result even if a later benchmark dies.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import jax

from bsi_tpu.utils import enable_compilation_cache

# Big-model compiles travel over a remote-compile RPC on the target TPU and
# can take tens of minutes cold; the persistent cache turns every rerun into
# a disk hit so the bench can't die in a compile (utils/compilation_cache.py)
enable_compilation_cache()

import jax.numpy as jnp

# scripts/bench_train.py owns the train-step measurement; reuse it verbatim
sys.path.insert(0, str(Path(__file__).parent / "scripts"))
import bench_train as _bench_train

_T0 = time.monotonic()

# Analytic A100 estimates for the torch reference (see module docstring)
A100_BASELINE_UNET = 8.0
A100_BASELINE_DIT = 2.9
# Torch-reference A100 train estimates: fwd+bwd ~ 3x forward FLOPs at TF32
# ~60 TFLOP/s effective => UNet ~444 ex/s, DiT-L/2 ~124 ex/s.
A100_BASELINE_UNET_TRAIN = 444.0
A100_BASELINE_DIT_TRAIN = 124.0
K_STEPS = 128
BATCH = 64
RETRIES = 3

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


def _phase(msg: str) -> None:
    """Progress marker on stderr (stdout must stay line-oriented JSON)."""
    print(f"[bench +{time.monotonic() - _T0:.0f}s] {msg}", file=sys.stderr, flush=True)


def _emit(record: dict) -> None:
    """Print one JSON record to stdout the moment it exists — a later crash
    cannot erase an already-measured number (the round-3 failure mode)."""
    print(json.dumps(record), flush=True)


def _attempt(label: str, fn, *, retries: int = RETRIES) -> dict:
    """Run ``fn`` with bounded retries; degrade to an error record instead of
    raising. Each attempt calls ``fn`` fresh so models/jit closures are
    rebuilt from scratch (a poisoned executable from a half-finished remote
    compile is not reused)."""
    last = None
    for i in range(1, retries + 1):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — the whole point is isolation
            last = e
            _phase(f"{label}: attempt {i}/{retries} failed: {type(e).__name__}: {e}")
            if i < retries:
                time.sleep(10 * i)
    return {"error": f"{type(last).__name__}: {last}"}


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


def _build_algo():
    from bsi_tpu.core import BSI

    return BSI(
        data_shape=(32, 32, 3),
        lambda_0=1e-2,
        alpha_M=1e6,
        alpha_R=2e6,
        k=K_STEPS,
        preconditioning="edm",
    )


def _build_unet():
    from bsi_tpu.models import DenoisingVDMUNet
    from bsi_tpu.nn import FourierFeatures, NyquistPositionalEmbedding

    return DenoisingVDMUNet(
        data_shape=(32, 32, 3),
        pos_emb=NyquistPositionalEmbedding(32, 100),
        dim=128,
        levels=32,
        pos_emb_mult=4,
        fourier_features=FourierFeatures(n_min=6, n_max=8),
        dtype=jnp.bfloat16,
    )


def _build_dit():
    from bsi_tpu.models import DenoisingDiT
    from bsi_tpu.nn import FourierFeatures

    # DiT-L/2, the ImageNet32 serving shape (imagenet32.yaml:24-46).
    # scan_blocks: the 24 blocks run as a lax.scan over stacked params, so
    # the k=128 sampler's XLA program carries ONE block body instead of 24 —
    # without it the compile unit is so large the remote-compile RPC times
    # out (~28 min "Broken pipe", the round-3 bench killer; measured probe:
    # scan layout compiles the k=128 sampler in 4.3 s). Numerically
    # identical to the loop layout (tests/test_pipeline.py::
    # test_scan_blocks_matches_loop_layout); if anything scan forgoes
    # inter-block fusion, so the measured number is the conservative one.
    return _make_dit(scan_blocks=True)


def _build_dit_for_flops():
    # FLOP-counting twin: XLA's cost analysis counts a lax.scan body ONCE,
    # so the scan-blocks forward undercounts the 24 blocks 24x; the loop
    # layout is the same function (test above) with every block visible.
    return _make_dit(scan_blocks=False)


def _make_dit(*, scan_blocks: bool):
    from bsi_tpu.models import DenoisingDiT
    from bsi_tpu.nn import FourierFeatures

    return DenoisingDiT(
        data_shape=(32, 32, 3),
        patch_size=2,
        dim=1024,
        depth=24,
        heads=16,
        scan_blocks=scan_blocks,
        fourier_features=FourierFeatures(n_min=6, n_max=8),
        dtype=jnp.bfloat16,
    )


def bench_sampling(build_model, *, batch: int, n_iters: int = 3,
                   build_model_for_flops=None) -> dict:
    """Time `algo.sample` end-to-end (host fetch forces true completion) and
    self-validate with XLA-counted forward FLOPs x (k+1) model calls."""
    import numpy as np

    model = build_model()
    algo = _build_algo()
    data_shape = algo.data_shape
    mu = jnp.zeros((batch,) + tuple(data_shape), jnp.float32)
    t = jnp.zeros((batch,), jnp.float32)
    params = model.init(jax.random.key(0), mu, t)

    # params MUST be a jit argument, not a closure capture: closed-over
    # arrays are embedded in the lowered program as HLO constants, so a
    # DiT-L/2's ~1.8 GB of weights rides the remote-compile RPC inside the
    # serialized module — that, not program complexity, is what blew past
    # the ~28-min transport ceiling and killed the round-3/-4 bench runs
    # (the train benches pass state as an argument and compile in minutes).
    def sample_fn(p, rng):
        return algo.sample(lambda m, tt: model.apply(p, m, tt), rng, batch)

    sample = jax.jit(sample_fn)

    _phase(f"{type(model).__name__}: compiling sampler (cold compile can take minutes)")
    np.asarray(sample(params, jax.random.key(1)))  # warmup / compile
    _phase(f"{type(model).__name__}: compiled; timing {n_iters} iters")

    start = time.perf_counter()
    for i in range(n_iters):
        np.asarray(sample(params, jax.random.key(2 + i)))
    elapsed = time.perf_counter() - start
    samples_per_sec = n_iters * batch / elapsed

    record = {"value": round(samples_per_sec, 3), "unit": "samples/sec/chip"}
    # XLA's cost analysis counts the sampling scan's body once, so count one
    # (loop-free) preconditioned forward and scale by the k+1 model calls a
    # sample makes (k scan steps + the final decode). If the serving model
    # itself contains a scan (scan_blocks), count a loop-layout twin instead.
    if build_model_for_flops is None:
        count_model, count_params = model, params
    else:
        count_model = build_model_for_flops()
        count_params = count_model.init(jax.random.key(0), mu, t)
    fwd = jax.jit(
        lambda p, mu, t: algo._predict_x(
            lambda m, tt: count_model.apply(p, m, tt), mu, t
        )
    )
    fwd_flops = _compiled_flops(fwd, count_params, mu, t)
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
    unet_rec = _attempt(
        "unet-sampling", lambda: bench_sampling(_build_unet, batch=BATCH)
    )
    unet_rec = {
        "metric": f"bsi-cifar10-unet sampling throughput (k={K_STEPS}, bf16, batch {BATCH})",
        **unet_rec,
    }
    if "value" in unet_rec:
        unet_rec["vs_baseline"] = round(unet_rec["value"] / A100_BASELINE_UNET, 3)
    _emit(unet_rec)

    dit_rec = _attempt(
        "dit-sampling",
        lambda: bench_sampling(
            _build_dit, batch=BATCH, build_model_for_flops=_build_dit_for_flops
        ),
    )
    dit_rec = {
        "metric": f"bsi-dit-L/2-32x32 sampling throughput (k={K_STEPS}, bf16, batch {BATCH})",
        **dit_rec,
    }
    if "value" in dit_rec:
        dit_rec["vs_baseline"] = round(dit_rec["value"] / A100_BASELINE_DIT, 3)
    _emit(dit_rec)

    # dropout_impl="rbg": the TPU hardware RngBitGenerator for dropout masks.
    # Measured round 5 (PERF_NOTES.md): the default threefry mask generation
    # was 73 ms of the UNet's 229 ms step (228.9 -> 156.0 ms, 43.5 -> 63.9%
    # MFU) and 45 ms of the DiT's 314.7 ms (-> 269.7 ms, 48.1 -> 56.1% MFU).
    unet_train = _attempt(
        "unet-train", lambda: _bench_train.run("unet", steps=30, dropout_impl="rbg")
    )
    if "value" in unet_train:
        unet_train["vs_baseline"] = round(
            unet_train["value"] / A100_BASELINE_UNET_TRAIN, 3
        )
    _emit(unet_train)

    dit_train = _attempt(
        "dit-train",
        lambda: _bench_train.run(
            "dit", steps=30, mu_dtype="bfloat16", nu_dtype="bfloat16", remat=True,
            dropout_impl="rbg",
        ),
    )
    if "value" in dit_train:
        dit_train["vs_baseline"] = round(
            dit_train["value"] / A100_BASELINE_DIT_TRAIN, 3
        )
    _emit(dit_train)

    # The imagenet32 recipe's OPTIMIZER batch (512) on one chip: 16 sequential
    # micro-batches of 32 through the in-step accumulation scan
    # (/root/reference/config/experiment/imagenet32.yaml:24-46). Micro-batch
    # 64 does NOT fit: the 24 saved bf16[64,256,4096] MLP hiddens overflow
    # HBM by 16 MB (measured round 5); 16 x 32 fits with margin and is
    # FASTER per example than b64 (optimizer+EMA amortize over the scan).
    dit_train_b512 = _attempt(
        "dit-train-b512",
        lambda: _bench_train.run(
            "dit", batch=512, accum=16, steps=6,
            mu_dtype="bfloat16", nu_dtype="bfloat16", remat=True,
            dropout_impl="rbg",
        ),
    )
    if "value" in dit_train_b512:
        dit_train_b512["vs_baseline"] = round(
            dit_train_b512["value"] / A100_BASELINE_DIT_TRAIN, 3
        )
    _emit(dit_train_b512)

    # Combined headline record LAST (drivers that parse the final stdout
    # line see the full result). If the headline UNet number itself failed,
    # fall back to the first successful record so "value" is always present.
    record = dict(unet_rec)
    for fallback in (dit_rec, unet_train, dit_train, dit_train_b512):
        if "value" not in record and "value" in fallback:
            record = dict(fallback)
    record["dit"] = dit_rec
    record["train"] = {
        "unet": unet_train,
        "dit": dit_train,
        "dit_b512": dit_train_b512,
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
