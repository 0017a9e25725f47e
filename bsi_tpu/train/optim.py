"""Optimizers and LR schedules.

The reference uses fused AdamW plus two schedulers: linear warmup
(bsi/lr_scheduler.py:11-34) and warmup + cosine annealing to ``end_lr`` at
``max_steps`` (bsi/lr_scheduler.py:37-58), and clips gradients to global norm
1.0 via the Lightning trainer. Here everything is optax inside the jitted
step, which XLA fuses across the whole parameter tree (the `_foreach`/fused
analogue for free).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import optax


def warmup_schedule(
    lr: float, warmup_steps: int = 1000, start_lr: float = 1e-8
) -> optax.Schedule:
    """Linear warmup from ``start_lr`` to ``lr``, then constant."""
    warm = optax.linear_schedule(start_lr, lr, warmup_steps)
    return optax.join_schedules([warm, optax.constant_schedule(lr)], [warmup_steps])


def warmup_cosine_schedule(
    lr: float,
    warmup_steps: int,
    max_steps: int,
    start_lr: float = 1e-8,
    end_lr: Optional[float] = None,
) -> optax.Schedule:
    """Linear warmup then cosine annealing to ``end_lr`` at ``max_steps``."""
    if end_lr is None:
        end_lr = 0.01 * lr
    warm = optax.linear_schedule(start_lr, lr, warmup_steps)
    cosine = optax.cosine_decay_schedule(
        lr, max(max_steps - warmup_steps, 1), alpha=end_lr / lr
    )
    return optax.join_schedules([warm, cosine], [warmup_steps])


def scale_by_adam_cast(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype: Optional[str] = None,
    nu_dtype: Optional[str] = None,
) -> optax.GradientTransformation:
    """``optax.scale_by_adam`` with independently castable moment STORAGE.

    optax exposes ``mu_dtype`` only; this adds ``nu_dtype`` so the second
    moment can also live in bf16 — together they cut optimizer-state HBM
    traffic in half (the update step is HBM-bound: it streams params + both
    moments + grads). All arithmetic runs in the gradient dtype (f32 — the
    moments are upcast at read), only the carried state is rounded, and with
    both dtypes None the update is bit-identical to ``optax.scale_by_adam``.

    Numerics: bf16's 8-bit mantissa on ``nu`` perturbs the preconditioner
    ``1/(sqrt(nu_hat)+eps)`` by at most 2^-9 relative — a per-step LR jitter
    of <0.2%, zero-mean; parameters and ``mu`` (the actual update direction)
    keep their precision. Measured end-to-end before adoption
    (PERF_NOTES.md).
    """

    def cast(tree, dtype):
        if dtype is None:
            return tree
        return jax.tree.map(lambda x: x.astype(dtype), tree)

    def init(params):
        mu = jax.tree.map(lambda p: jnp.zeros_like(p, mu_dtype or p.dtype), params)
        nu = jax.tree.map(lambda p: jnp.zeros_like(p, nu_dtype or p.dtype), params)
        return optax.ScaleByAdamState(count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update(grads, state, params=None):
        del params
        mu = jax.tree.map(
            lambda g, m: b1 * m.astype(g.dtype) + (1 - b1) * g, grads, state.mu
        )
        nu = jax.tree.map(
            lambda g, v: b2 * v.astype(g.dtype) + (1 - b2) * (g * g), grads, state.nu
        )
        count = state.count + 1
        # weak-typed like optax's bias_correction: the Python-float decay **
        # int32 count promotes to the default real dtype (f32, or f64 under
        # jax_enable_x64), keeping the update bit-identical to scale_by_adam
        c1 = 1 - b1**count
        c2 = 1 - b2**count
        updates = jax.tree.map(
            lambda m, v: (m / c1) / (jnp.sqrt(v / c2) + eps), mu, nu
        )
        return updates, optax.ScaleByAdamState(
            count=count, mu=cast(mu, mu_dtype), nu=cast(nu, nu_dtype)
        )

    return optax.GradientTransformation(init, update)


def make_optimizer(
    schedule: optax.Schedule | float,
    *,
    name: str = "adamw",
    betas: Sequence[float] = (0.9, 0.999),
    weight_decay: float = 0.01,
    eps: float = 1e-8,
    gradient_clip: Optional[float] = 1.0,
    mu_dtype: Optional[str] = None,
    nu_dtype: Optional[str] = None,
) -> optax.GradientTransformation:
    """AdamW/Adam with optional global-norm gradient clipping.

    ``mu_dtype="bfloat16"`` stores the first moment in bf16, cutting
    optimizer-state HBM by 1/4 for large models (DiT-L: ~0.5 GB/chip);
    ``nu_dtype="bfloat16"`` does the same for the second moment (see
    :func:`scale_by_adam_cast` for the numerics); parameters stay f32.
    """
    b1, b2 = betas
    if name not in ("adam", "adamw"):
        raise ValueError(f"Unknown optimizer {name!r}")
    if nu_dtype is not None:
        # optax has no nu_dtype: assemble adamw = scale_by_adam + wd + lr
        # from our cast-aware kernel (identical chain to optax.adamw)
        parts = [scale_by_adam_cast(b1, b2, eps, mu_dtype, nu_dtype)]
        if name == "adamw":
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.scale_by_learning_rate(schedule))
        opt = optax.chain(*parts)
    elif name == "adamw":
        opt = optax.adamw(
            schedule, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay,
            mu_dtype=mu_dtype,
        )
    else:
        opt = optax.adam(schedule, b1=b1, b2=b2, eps=eps, mu_dtype=mu_dtype)
    if gradient_clip is not None:
        return optax.chain(optax.clip_by_global_norm(gradient_clip), opt)
    return opt
