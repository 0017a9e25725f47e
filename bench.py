"""Headline benchmark: BSI sampling throughput on the flagship CIFAR-10 model.

Measures samples/sec/chip at k=128 sampling steps with the CIFAR-10 VDM-UNet
(dim 128 x 32 levels, the reference's cifar10-vdm recipe) in bf16 compute —
the sampler is the hot loop of FID evaluation and serving (SURVEY.md §6).

Baseline: no numbers are published in the reference repo (BASELINE.md). The
comparison constant below is an analytic estimate of the torch reference on
one A100: ~45 GFLOP/forward x 128 steps ~ 5.8 TFLOP/sample at f32/TF32
(~60 TFLOP/s effective) ~ 8 samples/sec. The driver-set target is >= 2x that
per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

A100_BASELINE_SAMPLES_PER_SEC = 8.0
K_STEPS = 128
BATCH = 64


def main() -> None:
    from bsi_tpu.core import BSI
    from bsi_tpu.models import DenoisingVDMUNet
    from bsi_tpu.nn import FourierFeatures, NyquistPositionalEmbedding

    data_shape = (32, 32, 3)
    model = DenoisingVDMUNet(
        data_shape=data_shape,
        pos_emb=NyquistPositionalEmbedding(32, 100),
        dim=128,
        levels=32,
        pos_emb_mult=4,
        fourier_features=FourierFeatures(n_min=6, n_max=8),
        dtype=jnp.bfloat16,
    )
    algo = BSI(
        data_shape=data_shape,
        lambda_0=1e-2,
        alpha_M=1e6,
        alpha_R=2e6,
        k=K_STEPS,
        preconditioning="edm",
    )

    mu = jnp.zeros((BATCH,) + data_shape, jnp.float32)
    t = jnp.zeros((BATCH,), jnp.float32)
    params = model.init(jax.random.key(0), mu, t)

    model_fn = lambda m, tt: model.apply(params, m, tt)
    sample = jax.jit(lambda rng: algo.sample(model_fn, rng, BATCH))

    import numpy as np

    # Warmup / compile (host fetch forces true completion through the runtime)
    np.asarray(sample(jax.random.key(1)))

    n_iters = 3
    start = time.perf_counter()
    for i in range(n_iters):
        np.asarray(sample(jax.random.key(2 + i)))
    elapsed = time.perf_counter() - start

    samples_per_sec = n_iters * BATCH / elapsed
    print(
        json.dumps(
            {
                "metric": f"bsi-cifar10-unet sampling throughput (k={K_STEPS}, bf16, batch {BATCH})",
                "value": round(samples_per_sec, 3),
                "unit": "samples/sec/chip",
                "vs_baseline": round(samples_per_sec / A100_BASELINE_SAMPLES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
