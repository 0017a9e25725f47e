"""Bayesian Flow Networks (BFN) baseline, TPU-native.

Functional JAX implementation of arXiv:2308.07037 for continuous data with
the same public surface as :class:`~bsi_tpu.core.bsi.BSI` (reference
implementation: bsi/bfn.py:12-329). The model predicts *epsilon*, converted
to a clipped x-prediction. The additive-accuracy sampler runs as a
``lax.scan`` carrying the running precision ``rho``.

Deliberate fixes relative to the reference:
- ``discrete_time_loss`` with ``t=None`` works (the reference calls a
  nonexistent ``self.linspace``, bsi/bfn.py:165).
- ``train_loss`` returns per-example losses of shape ``(batch,)`` like
  BSI/VDM (the reference reduces to a scalar, bsi/bfn.py:219); downstream
  means are unchanged.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from .common import ModelFn, broadcast_right, mc_var, protect_const, sample_lds_t
from .discretization import Discretization
from .distributions import discretized_normal_log_prob, normal_log_prob


@dataclasses.dataclass(frozen=True)
class BFN:
    """Bayesian Flow Network for continuous data.

    Args:
        sigma_1: Target output noise level at t=1 (must be < 1).
        k: Default number of sampling steps.
        x_min / x_max: Clipping range of x-predictions.
        t_min: Times below this produce a zero x-prediction (the flow
            distribution is degenerate at t=0).
    """

    data_shape: tuple[int, ...]
    sigma_1: float
    k: int = 50
    x_min: float = -1.0
    x_max: float = 1.0
    t_min: float = 1e-6
    low_discrepancy_sampling: bool = True
    discretization: Optional[Discretization] = None

    def __post_init__(self):
        object.__setattr__(self, "data_shape", tuple(self.data_shape))
        if not self.sigma_1 < 1.0:
            raise ValueError("`sigma_1 < 1` is required by the BFN formulas")

    @property
    def n_dim(self) -> int:
        return math.prod(self.data_shape)

    def default_schedule(self, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.linspace(0.0, 1.0, self.k + 1, dtype=dtype)

    # ------------------------------------------------------------------ ELBO

    def elbo(
        self,
        model_fn: ModelFn,
        rng: jax.Array,
        x: jnp.ndarray,
        n_recon_samples: int = 1,
        n_measure_samples: int = 1,
        *,
        estimate_var: bool = False,
    ) -> tuple[jnp.ndarray, jnp.ndarray, dict[str, jnp.ndarray]]:
        rng_recon, rng_latent = jax.random.split(rng)
        l_recon = self.reconstruction_loss(model_fn, rng_recon, x, n_recon_samples)
        l_latent = self.continuous_time_loss(model_fn, rng_latent, x, n_measure_samples)
        return self._assemble_elbo(
            l_recon, l_latent, n_recon_samples, n_measure_samples, estimate_var
        )

    def finite_elbo(
        self,
        model_fn: ModelFn,
        rng: jax.Array,
        x: jnp.ndarray,
        n_recon_samples: int = 1,
        n_measure_samples: int = 1,
        *,
        t: Optional[jnp.ndarray] = None,
        estimate_var: bool = False,
    ) -> tuple[jnp.ndarray, jnp.ndarray, dict[str, jnp.ndarray]]:
        rng_recon, rng_latent = jax.random.split(rng)
        l_recon = self.reconstruction_loss(model_fn, rng_recon, x, n_recon_samples)
        l_latent = self.discrete_time_loss(model_fn, rng_latent, x, n_measure_samples, t=t)
        return self._assemble_elbo(
            l_recon, l_latent, n_recon_samples, n_measure_samples, estimate_var
        )

    def _assemble_elbo(self, l_recon, l_latent, n_recon, n_measure, estimate_var):
        elbo = -(l_recon.mean(axis=0) + l_latent.mean(axis=0))
        conversion_factor = -1.0 / (math.log(2.0) * self.n_dim)
        bpd = conversion_factor * elbo
        extra = {"l_recon": l_recon, "l_latent": l_latent}
        if estimate_var:
            if n_recon < 2 or n_measure < 2:
                raise ValueError("Need at least two samples of each to estimate variance")
            extra["bpd_var"] = (conversion_factor**2) * (
                mc_var(l_recon, n_recon) + mc_var(l_latent, n_measure)
            )
        return elbo, bpd, extra

    # ------------------------------------------------------------ loss parts

    def reconstruction_loss(
        self,
        model_fn: ModelFn,
        rng: jax.Array,
        x: jnp.ndarray,
        n_samples: int = 1,
    ) -> jnp.ndarray:
        """Negative reconstruction log-likelihood at t=1, ``(n_samples, batch)``
        (reference: bsi/bfn.py:124-153; BSI-style CDF-difference discretization)."""
        batch = x.shape[0]
        t = protect_const(jnp.ones((n_samples, batch), x.dtype))
        mu = self._sample_flow_distribution(rng, x, t)
        x_hat = self._predict_x_flat(model_fn, mu, t)
        scale = jnp.asarray(self.sigma_1, x.dtype)
        if self.discretization is None:
            log_p = normal_log_prob(x[None], x_hat, scale)
        else:
            log_p = discretized_normal_log_prob(x[None], x_hat, scale, self.discretization)
        return -log_p.reshape(n_samples, batch, -1).sum(-1)

    def discrete_time_loss(
        self,
        model_fn: ModelFn,
        rng: jax.Array,
        x: jnp.ndarray,
        n_samples: int = 1,
        *,
        t: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """n-step latent loss (reference: bsi/bfn.py:155-185)."""
        if t is None:
            t = self.default_schedule(x.dtype)
        n = t.shape[0] - 1
        batch = x.shape[0]
        rng_i, rng_mu = jax.random.split(rng)
        i = jax.random.randint(rng_i, (n_samples, batch), 0, n)
        t_i = t[i]
        mu = self._sample_flow_distribution(rng_mu, x, t_i)
        x_hat = self._predict_x_flat(model_fn, mu, t_i)
        decoding_error = ((x[None] - x_hat) ** 2).reshape(n_samples, batch, -1).sum(-1)
        s1 = self.sigma_1
        return (
            0.5
            * n
            * (1 - s1 ** (2.0 / n))
            * (s1 ** ((-2.0 / n) * (i + 1)) * decoding_error)
        )

    def continuous_time_loss(
        self,
        model_fn: ModelFn,
        rng: jax.Array,
        x: jnp.ndarray,
        n_samples: int = 1,
    ) -> jnp.ndarray:
        """Continuous-time latent loss (reference: bsi/bfn.py:187-201)."""
        rng_t, rng_mu = jax.random.split(rng)
        t = sample_lds_t(
            rng_t,
            n_samples,
            x.shape[0],
            low_discrepancy=self.low_discrepancy_sampling,
            dtype=x.dtype,
        )
        mu = self._sample_flow_distribution(rng_mu, x, t)
        x_hat = self._predict_x_flat(model_fn, mu, t)
        decoding_error = ((x[None] - x_hat) ** 2).reshape(n_samples, x.shape[0], -1).sum(-1)
        s1 = self.sigma_1
        return -math.log(s1) * (s1 ** (-2.0 * t) * decoding_error)

    def train_loss(
        self,
        model_fn: ModelFn,
        rng: jax.Array,
        x: jnp.ndarray,
    ) -> jnp.ndarray:
        """Per-example training loss: 1-sample continuous-time loss without
        constant factors, mean over data dims (reference: bsi/bfn.py:203-219)."""
        rng_t, rng_mu = jax.random.split(rng)
        t = sample_lds_t(
            rng_t,
            1,
            x.shape[0],
            low_discrepancy=self.low_discrepancy_sampling,
            dtype=x.dtype,
        )[0]
        mu = self._sample_flow_distribution(rng_mu, x, t)
        x_hat = self._predict_x(model_fn, mu, t)
        decoding_error = ((x - x_hat) ** 2).reshape(x.shape[0], -1).mean(-1)
        return self.sigma_1 ** (-2.0 * t) * decoding_error

    # -------------------------------------------------------------- sampling

    def sample(
        self,
        model_fn: ModelFn,
        rng: jax.Array,
        n_samples: int,
        *,
        t: Optional[jnp.ndarray] = None,
        dtype=jnp.float32,
    ) -> jnp.ndarray:
        """Additive-accuracy sampler as a ``lax.scan`` (reference: bsi/bfn.py:221-244)."""
        (mu, _), _ = self._sample_scan(model_fn, rng, n_samples, t, dtype, False)
        return self._predict_x(model_fn, mu, protect_const(jnp.ones((n_samples,), dtype)))

    def sample_history(
        self,
        model_fn: ModelFn,
        rng: jax.Array,
        n_samples: int,
        *,
        t: Optional[jnp.ndarray] = None,
        dtype=jnp.float32,
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns ``(mus, x_hats, ys)`` like BSI (reference: bsi/bfn.py:246-280)."""
        (mu_final, mu0), (mus_tail, x_hats, ys) = self._sample_scan(
            model_fn, rng, n_samples, t, dtype, True
        )
        final_x_hat = self._predict_x(
            model_fn, mu_final, protect_const(jnp.ones((n_samples,), dtype))
        )
        mus = jnp.concatenate([mu0[None], mus_tail], axis=0)
        x_hats = jnp.concatenate([x_hats, final_x_hat[None]], axis=0)
        return mus, x_hats, ys

    def _sample_scan(self, model_fn, rng, n_samples, t, dtype, with_history):
        if t is None:
            t = self.default_schedule(dtype)
        t = t.astype(dtype)
        n = t.shape[0] - 1
        shape = (n_samples,) + self.data_shape
        mu0 = jnp.zeros(shape, dtype)
        s1 = self.sigma_1
        alphas = (s1 ** (-2.0 * t[1:])) * (1.0 - s1 ** (2.0 * jnp.diff(t)))
        keys = jax.random.split(rng, n)

        def step(carry, inp):
            mu, rho = carry
            t_i, alpha_i, key = inp
            x_hat = self._predict_x(model_fn, mu, jnp.full((n_samples,), t_i, dtype))
            y = x_hat + jax.lax.rsqrt(alpha_i) * jax.random.normal(key, shape, dtype)
            mu_next = (rho * mu + alpha_i * y) / (rho + alpha_i)
            rho_next = rho + alpha_i
            out = (mu_next, x_hat, y) if with_history else None
            return (mu_next, rho_next), out

        init = (mu0, jnp.asarray(1.0, dtype))
        (mu_final, _), hist = jax.lax.scan(step, init, (t[:-1], alphas, keys))
        return (mu_final, mu0), hist

    # --------------------------------------------------------------- internals

    def _predict_x(self, model_fn: ModelFn, mu: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """Convert eps-prediction to a clipped x-prediction; zero below t_min
        (reference: bsi/bfn.py:282-291)."""
        eps_hat = model_fn(mu, t)
        gamma = 1.0 - self.sigma_1 ** (2.0 * jnp.clip(t, min=self.t_min))
        x_hat = mu / broadcast_right(gamma, mu) - broadcast_right(
            jnp.sqrt((1.0 - gamma) / gamma), eps_hat
        ) * eps_hat
        x_hat = jnp.clip(x_hat, self.x_min, self.x_max)
        return jnp.where(broadcast_right(t < self.t_min, x_hat), 0.0, x_hat)

    def _predict_x_flat(self, model_fn, mu, t):
        n, b = mu.shape[:2]
        out = self._predict_x(model_fn, mu.reshape((n * b,) + mu.shape[2:]), t.reshape(-1))
        return out.reshape((n, b) + out.shape[1:])

    def _sample_flow_distribution(
        self, rng: jax.Array, x: jnp.ndarray, t: jnp.ndarray
    ) -> jnp.ndarray:
        """Sample the flow distribution ``p_F(mu | x, t)`` for ``t`` of shape
        ``(..., batch)`` (reference: bsi/bfn.py:293-307)."""
        x_b = x.reshape((1,) * (t.ndim - 1) + x.shape)
        gamma = 1.0 - self.sigma_1 ** (2.0 * t)
        eps = jax.random.normal(rng, t.shape + self.data_shape, x.dtype)
        return broadcast_right(gamma, x_b) * x_b + broadcast_right(
            jnp.sqrt(gamma * (1.0 - gamma)), eps
        ) * eps
