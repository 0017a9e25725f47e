"""Validation-time diagnostic plots.

Equivalent of the reference's ``Plots`` callback (bsi/tasks/bsi.py:23-70):
at each validation it renders

- an 8x8 grid of fresh samples,
- 16 sampling-trajectory filmstrips (x_hat over the k steps),
- denoising panels: 8 fixed training images noised at 15 noise-level
  quantiles, each shown as (mu, x_hat) row pairs,

all drawn with a fixed plot seed (2831183658, same constant as the
reference) and finiteness-asserted — the de-facto NaN watchdog of training.
Images are written as PNGs under ``<run_dir>/plots/step_<n>/`` and logged to
W&B when a run is attached.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

PLOT_SEED = 2831183658


def _to_uint8_grid(images: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """[rows*cols, H, W, C] uint8 -> one [rows*H, cols*W, C] image."""
    n, h, w, c = images.shape
    assert n == rows * cols, (n, rows, cols)
    return (
        images.reshape(rows, cols, h, w, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(rows * h, cols * w, c)
    )


def _save_png(path, array: np.ndarray) -> None:
    from PIL import Image

    path.parent.mkdir(parents=True, exist_ok=True)
    if array.shape[-1] == 1:
        array = array[..., 0]
    Image.fromarray(array).save(path)


class PlotsCallback:
    """Callable hooked into ``Trainer.callbacks``; signature (trainer, stage, step)."""

    def __init__(self, *, n_samples: int = 64, n_histories: int = 16, n_quantiles: int = 15):
        self.n_samples = n_samples
        self.n_histories = n_histories
        self.n_quantiles = n_quantiles

    def __call__(self, trainer, *, stage: str, step: int) -> None:
        algo = trainer.algorithm
        state = trainer.state
        disc = trainer.data.discretization()
        rng = jax.random.key(PLOT_SEED)
        out_dir = trainer.run_dir / "plots" / f"step_{step}"
        images = {}

        # 8x8 sample grid
        samples = trainer.sample_fn(state, rng, self.n_samples)
        assert bool(jnp.isfinite(samples).all()), "non-finite samples"
        grid = np.asarray(disc.to_8bit_image(samples))
        images[f"{stage}/samples"] = _to_uint8_grid(grid, 8, self.n_samples // 8)

        # trajectory filmstrips: rows = samples, columns = steps
        model_fn = lambda mu, t: trainer.eval_apply(state.ema_params, mu, t, None)
        history = algo.sample_history(model_fn, rng, self.n_histories)
        x_hats = history[1] if isinstance(history, tuple) else history
        assert bool(jnp.isfinite(x_hats).all()), "non-finite sample history"
        hx = np.asarray(disc.to_8bit_image(x_hats))  # [k+1, n, H, W, C]
        k1, n, h, w, c = hx.shape
        strip = hx.transpose(1, 2, 0, 3, 4).reshape(n * h, k1 * w, c)
        images[f"{stage}/histories"] = strip

        # denoising panels at noise-level quantiles (all three algorithms
        # noise differently; reference: Plots in bsi/tasks/{bsi,vdm,bfn}.py)
        noiser = None
        if hasattr(algo, "_sample_q_mu_lambda"):  # BSI: noise at lambda(t)
            noiser = lambda r, x, t: algo._sample_q_mu_lambda(
                r, x, algo.p_lambda.icdf(t)
            )
        elif hasattr(algo, "_sample_zt_given_x"):  # VDM: forward marginal
            noiser = algo._sample_zt_given_x
        elif hasattr(algo, "_sample_flow_distribution"):  # BFN: flow dist
            noiser = algo._sample_flow_distribution
        if noiser is not None:
            quantiles = jnp.linspace(0.0, 1.0, self.n_quantiles)
            splits = trainer.data.eval_splits()
            base = jnp.asarray(splits["train"][np.arange(8)], jnp.float32)
            t_grid = jnp.broadcast_to(
                quantiles[:, None], (self.n_quantiles, len(base))
            )
            mu = noiser(rng, base, t_grid)
            flat_mu = mu.reshape((-1,) + mu.shape[2:])
            flat_t = jnp.repeat(quantiles, len(base))
            x_hat = algo._predict_x(model_fn, flat_mu, flat_t)
            assert bool(jnp.isfinite(x_hat).all()), "non-finite denoisings"
            mu8 = np.asarray(disc.to_8bit_image(flat_mu)).reshape(
                self.n_quantiles, len(base), *base.shape[1:]
            )
            xh8 = np.asarray(disc.to_8bit_image(x_hat)).reshape(
                self.n_quantiles, len(base), *base.shape[1:]
            )
            # rows: (image, [mu; x_hat]) pairs, columns: quantiles
            stacked = np.stack([mu8, xh8], axis=2)  # [q, b, 2, H, W, C]
            q, b, _, h, w, c = stacked.shape
            panel = stacked.transpose(1, 2, 3, 0, 4, 5).reshape(b * 2 * h, q * w, c)
            images[f"{stage}/denoisings"] = panel

        wandb_images = {}
        for name, arr in images.items():
            _save_png(out_dir / (name.replace("/", "_") + ".png"), arr)
            wandb_images[name] = arr

        wb = getattr(trainer.logger, "_wandb", None)
        if wb is not None:
            import wandb

            wb.log({k: wandb.Image(v) for k, v in wandb_images.items()}, step=step)
