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


def make_optimizer(
    schedule: optax.Schedule | float,
    *,
    name: str = "adamw",
    betas: Sequence[float] = (0.9, 0.999),
    weight_decay: float = 0.01,
    eps: float = 1e-8,
    gradient_clip: Optional[float] = 1.0,
    mu_dtype: Optional[str] = None,
) -> optax.GradientTransformation:
    """AdamW/Adam with optional global-norm gradient clipping.

    ``mu_dtype="bfloat16"`` stores the first moment in bf16, cutting
    optimizer-state HBM by 1/4 for large models (DiT-L: ~0.5 GB/chip); the
    second moment and parameters stay f32.
    """
    b1, b2 = betas
    if name == "adamw":
        opt = optax.adamw(
            schedule, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay,
            mu_dtype=mu_dtype,
        )
    elif name == "adam":
        opt = optax.adam(schedule, b1=b1, b2=b2, eps=eps, mu_dtype=mu_dtype)
    else:
        raise ValueError(f"Unknown optimizer {name!r}")
    if gradient_clip is not None:
        return optax.chain(optax.clip_by_global_norm(gradient_clip), opt)
    return opt
