"""Sampling-step schedules in noise-variance space.

Re-expression of the reference's ``get_schedule`` (scripts/eval_fid.py:52-87):
schedules are defined over the belief variance ``1/lambda`` between
``1/lambda_0`` (max) and ``1/(lambda_0 + alpha_M)`` (min) and mapped to step
times via the lambda-CDF. ``linear`` returns ``k + 1`` points; the variance
schedules return ``k`` points (the reference's exact semantics, including
that asymmetry). For VDM only the linear schedule applies (time runs 1 -> 0),
matching the reference's behavior.
"""

from __future__ import annotations

import jax.numpy as jnp

SCHEDULES = ("linear", "cosine", "edm", "edm7")


def get_schedule(name: str, k: int, algorithm, dtype=jnp.float32) -> jnp.ndarray:
    from .vdm import VDM

    if name == "linear":
        if isinstance(algorithm, VDM):
            return jnp.linspace(1.0, 0.0, k + 1, dtype=dtype)
        return jnp.linspace(0.0, 1.0, k + 1, dtype=dtype)

    if isinstance(algorithm, VDM):
        raise ValueError("Variance-space schedules are only defined for BSI/BFN-style time")

    p_lambda = algorithm.p_lambda
    max_variance = 1.0 / algorithm.lambda_0
    min_variance = 1.0 / (algorithm.lambda_0 + algorithm.alpha_M)

    if name == "cosine":
        variance = (max_variance - min_variance) * jnp.cos(
            jnp.linspace(0.0, 1.0, k, dtype=dtype) * jnp.pi / 2
        ) ** 2 + min_variance
    elif name == "edm":
        variance = (
            jnp.linspace(max_variance**0.5, min_variance**0.5, k, dtype=dtype) ** 2
        )
    elif name == "edm7":
        t = jnp.linspace(0.0, 1.0, k, dtype=dtype)
        rho = 7.0
        max_std, min_std = max_variance**0.5, min_variance**0.5
        stds = (max_std ** (1 / rho) + t * (min_std ** (1 / rho) - max_std ** (1 / rho))) ** rho
        variance = stds**2
    else:
        raise ValueError(f"Unknown schedule {name!r}; options: {SCHEDULES}")

    return p_lambda.cdf(1.0 / variance)
