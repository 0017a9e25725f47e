"""Factories for the jitted train / eval step functions.

The reference compiles ``train_loss``/``elbo``/``sample`` separately with
torch.compile and stitches them together in a LightningModule
(bsi/tasks/bsi.py:120-134, :187-252). Here each step is one pure function
over a :class:`TrainState` — forward, backward, optimizer, EMA, and metric
reduction fuse into a single XLA program, and the state is donated so
parameters update in place in HBM.

Distribution: the caller jits these with a batch sharded over the mesh's
``data`` axis and state replicated; XLA inserts the gradient all-reduce
(the DDP analogue) and metric reductions automatically.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from .ema import EMAConfig, ema_update, maybe_switch_ema
from .state import TrainState

# model_apply(params, mu, t, dropout_rng | None) -> prediction
ModelApply = Callable[[Any, jnp.ndarray, jnp.ndarray, Optional[jax.Array]], jnp.ndarray]


def dropout_key_for(impl: Optional[str], key: jax.Array) -> jax.Array:
    """Re-wrap a (threefry) PRNG key for a cheaper bit-generator impl.

    Dropout is the one RNG consumer that draws BULK bits on the train hot
    path (one mask per residual block: ~1.1e9 u32/step for the CIFAR UNet
    recipe). The default threefry generator computes each word with a long
    ALU chain; ``"rbg"`` / ``"unsafe_rbg"`` lower to the TPU's hardware
    ``RngBitGenerator``. Mask *quality* requirements for dropout are far
    below statistical-test grade, and the stream stays deterministic per
    (seed, step), so this is a pure speed knob — measured on-chip before
    adoption (PERF_NOTES.md round-5). Algorithm noise draws (the ELBO's MC
    estimators) are NOT rerouted: they keep threefry.
    """
    if impl is None:
        return key
    # threefry key data is 2 uint32 words; rbg wants 4 — derive them from
    # two child keys so distinct inputs stay distinct
    data = jax.random.key_data(jax.random.split(key, 2)).reshape(-1)[:4]
    return jax.random.wrap_key_data(data, impl=impl)


def make_train_step(
    algorithm,
    model_apply: ModelApply,
    tx: optax.GradientTransformation,
    ema_cfg: EMAConfig,
    accum_steps: int = 1,
    dropout_prng_impl: Optional[str] = None,
):
    """Build the fused train step: loss -> grads -> optimizer -> EMA.

    ``accum_steps > 1`` enables gradient accumulation: the batch arrives
    pre-shaped ``[accum, micro, ...]`` (micro sharded over ``data``), a
    ``lax.scan`` averages per-micro-batch gradients, and the optimizer, EMA,
    and LR schedule advance ONCE per accumulated step — the cadence the
    reference gets from Lightning's ``accumulate_grad_batches``. This lets the
    global-batch-512 recipes run on small chip counts with the optimizer
    trajectory of the large batch (per-micro RNG draws differ from a single
    big batch, as they do for the reference across ranks).

    ``dropout_prng_impl``: see :func:`dropout_key_for`."""

    def loss_and_grads(params, batch, rng_algo, rng_dropout):
        def loss_fn(p):
            model_fn = lambda mu, t: model_apply(p, mu, t, rng_dropout)
            return algorithm.train_loss(model_fn, rng_algo, batch).mean()

        return jax.value_and_grad(loss_fn)(params)

    def train_step(state: TrainState, batch: jnp.ndarray):
        rng_step = jax.random.fold_in(state.rng, state.step)
        rng_algo, rng_dropout = jax.random.split(rng_step)
        rng_dropout = dropout_key_for(dropout_prng_impl, rng_dropout)

        if accum_steps == 1:
            loss, grads = loss_and_grads(state.params, batch, rng_algo, rng_dropout)
        else:
            rngs_a = jax.random.split(rng_algo, accum_steps)
            rngs_d = jax.random.split(rng_dropout, accum_steps)

            def micro(carry, xs):
                loss_sum, grad_sum = carry
                mb, ra, rd = xs
                mloss, mgrads = loss_and_grads(state.params, mb, ra, rd)
                return (
                    loss_sum + mloss,
                    jax.tree.map(jnp.add, grad_sum, mgrads),
                ), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (loss, grads), _ = jax.lax.scan(
                micro, (jnp.zeros(()), zeros), (batch, rngs_a, rngs_d)
            )
            inv = 1.0 / accum_steps
            loss = loss * inv
            grads = jax.tree.map(lambda g: g * inv, grads)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = ema_update(ema_cfg, state.step, state.ema_params, params)
        params = maybe_switch_ema(ema_cfg, state.step, ema_params, params)

        metrics = {
            "train/loss": loss,
            "train/grad_norm": optax.global_norm(grads),
        }
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            ema_params=ema_params,
            opt_state=opt_state,
        )
        return new_state, metrics

    return train_step


def make_eval_step(
    algorithm,
    model_apply: ModelApply,
    *,
    n_recon_samples: int = 1,
    n_measure_samples: int = 1,
    use_ema: bool = True,
):
    """Build the eval step computing masked ELBO metric *sums*.

    Returns per-batch sums and a count rather than means so the caller can
    aggregate exactly over ragged final batches — preserving the reference's
    non-padding eval guarantee (bsi/data/sampler.py:45-69) under XLA's
    fixed shapes: pad the batch, zero the mask.
    """

    def eval_step(state: TrainState, batch: jnp.ndarray, mask: jnp.ndarray, rng: jax.Array):
        params = state.ema_params if use_ema else state.params
        model_fn = lambda mu, t: model_apply(params, mu, t, None)
        elbo, bpd, extra = algorithm.elbo(
            model_fn, rng, batch, n_recon_samples, n_measure_samples
        )
        m = mask.astype(elbo.dtype)
        out = {
            "elbo_sum": (elbo * m).sum(),
            "bpd_sum": (bpd * m).sum(),
            "count": m.sum(),
        }
        # Per-part masked sums (l_recon, l_measure / l_diff / l_latent,
        # l_prior): the reference logs each part's mean per eval stage
        # (bsi/tasks/bsi.py:236-241); parts arrive as [n_samples, batch]
        # MC draws (or [batch] for the closed-form prior term).
        for name, part in extra.items():
            per_example = part.mean(axis=0) if part.ndim > 1 else part
            out[f"part_sum/{name}"] = (per_example * m).sum()
        return out

    return eval_step


def make_sample_fn(algorithm, model_apply: ModelApply, *, use_ema: bool = True):
    """Build the sampling function (EMA params by default, deterministic model)."""

    def sample(state: TrainState, rng: jax.Array, n_samples: int, t=None, dtype=jnp.float32):
        params = state.ema_params if use_ema else state.params
        model_fn = lambda mu, tt: model_apply(params, mu, tt, None)
        return algorithm.sample(model_fn, rng, n_samples, t=t, dtype=dtype)

    return sample
