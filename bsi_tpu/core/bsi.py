"""Bayesian Sample Inference (BSI), TPU-native.

Functional JAX reimplementation of the algorithm from arXiv:2502.07580
(reference implementation: bsi/bsi.py:87-445). The public surface mirrors the
reference — ``train_loss``, ``elbo``, ``finite_elbo``, ``sample``,
``sample_history`` plus the loss components — but the design is jit-first:

- The class is a frozen dataclass of hyperparameters; all state (parameters,
  RNG) flows through the arguments. ``model_fn(mu, t)`` is a closure the
  caller builds from its network parameters.
- The k-step sampling loop is a ``lax.scan`` so it compiles to a single XLA
  while-loop with donated carries instead of k unrolled graphs (reference
  unrolls a Python loop, bsi/bsi.py:328-335).
- Randomness is explicit ``jax.random`` key threading instead of a stateful
  ``torch.Generator``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from .common import ModelFn, broadcast_right, mc_var, protect_const, sample_lds_t
from .discretization import Discretization
from .distributions import (
    LogUniform,
    discretized_normal_log_prob,
    normal_log_prob,
)


@dataclasses.dataclass(frozen=True)
class BSI:
    """Bayesian Sample Inference.

    The generative model maintains a Gaussian belief ``N(mu, 1/lambda)`` over
    the data sample and refines it through simulated noisy measurements of
    increasing precision.

    Args:
        data_shape: Per-sample data shape, e.g. ``(32, 32, 3)`` for CIFAR-10
            (images are NHWC in this framework — the TPU-native conv layout).
        lambda_0: Initial belief precision (1e-2 is a good default for
            normalized data).
        alpha_M: Maximum total measurement precision (e.g. 1e6).
        alpha_R: Reconstruction precision; ``2 * alpha_M`` gives good
            likelihoods.
        k: Default number of sampling steps.
        preconditioning: ``"edm"`` for the EDM-style preconditioning derived in
            the paper, or ``None``.
        low_discrepancy_sampling: Use low-discrepancy noise-level sampling to
            reduce the variance of the training loss.
        discretization: Optional data discretization for bits-per-dim
            likelihoods (use ``Discretization.image_8bit()`` for 8-bit images).
    """

    data_shape: tuple[int, ...]
    lambda_0: float
    alpha_M: float
    alpha_R: float
    k: int = 50
    preconditioning: Optional[str] = "edm"
    low_discrepancy_sampling: bool = True
    discretization: Optional[Discretization] = None

    def __post_init__(self):
        object.__setattr__(self, "data_shape", tuple(self.data_shape))
        if self.preconditioning not in (None, "edm"):
            raise ValueError(f"Unknown preconditioning {self.preconditioning!r}")

    @property
    def p_lambda(self) -> LogUniform:
        """Noise-precision distribution p(lambda) on [lambda_0, lambda_0 + alpha_M]."""
        return LogUniform(self.lambda_0, self.lambda_0 + self.alpha_M)

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
        """Monte Carlo estimate of the infinite-step ELBO.

        Returns ``(elbo, bits_per_dim, extra)`` where ``extra`` carries the
        per-sample loss parts (and the estimator variance of the bpd when
        ``estimate_var`` is set). All outputs are per-batch-element.
        """
        rng_recon, rng_measure = jax.random.split(rng)
        l_recon = self.reconstruction_loss(model_fn, rng_recon, x, n_recon_samples)
        l_measure = self.inf_measurement_loss(model_fn, rng_measure, x, n_measure_samples)
        return self._assemble_elbo(
            l_recon, l_measure, n_recon_samples, n_measure_samples, estimate_var
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
        """Monte Carlo estimate of the finite-step ELBO for a step schedule ``t``."""
        rng_recon, rng_measure = jax.random.split(rng)
        l_recon = self.reconstruction_loss(model_fn, rng_recon, x, n_recon_samples)
        l_measure = self.finite_measurement_loss(
            model_fn, rng_measure, x, n_measure_samples, t=t
        )
        return self._assemble_elbo(
            l_recon, l_measure, n_recon_samples, n_measure_samples, estimate_var
        )

    def _assemble_elbo(self, l_recon, l_measure, n_recon, n_measure, estimate_var):
        elbo = -(l_recon.mean(axis=0) + l_measure.mean(axis=0))
        conversion_factor = -1.0 / (math.log(2.0) * self.n_dim)
        bpd = conversion_factor * elbo
        extra = {"l_recon": l_recon, "l_measure": l_measure}
        if estimate_var:
            if n_recon < 2 or n_measure < 2:
                raise ValueError("Need at least two samples of each to estimate variance")
            extra["bpd_var"] = (conversion_factor**2) * (
                mc_var(l_recon, n_recon) + mc_var(l_measure, n_measure)
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
        """Sampled negative reconstruction log-likelihood, shape ``(n_samples, batch)``.

        The belief is pushed to full precision ``lambda_0 + alpha_M``, decoded at
        t=1, and the data scored under a Normal(x_hat, 1/sqrt(alpha_R)) —
        discretized into bins when a discretization is configured
        (reference: bsi/bsi.py:217-247).
        """
        batch = x.shape[0]
        lambda_M = jnp.full((n_samples, batch), self.lambda_0 + self.alpha_M, x.dtype)
        mu = self._sample_q_mu_lambda(rng, x, lambda_M)
        x_hat = self._predict_x_flat(
            model_fn, mu, protect_const(jnp.ones((n_samples, batch), x.dtype))
        )
        scale = jnp.asarray(1.0 / math.sqrt(self.alpha_R), x.dtype)
        if self.discretization is None:
            log_p = normal_log_prob(x[None], x_hat, scale)
        else:
            log_p = discretized_normal_log_prob(x[None], x_hat, scale, self.discretization)
        return -log_p.reshape(n_samples, batch, -1).sum(axis=-1)

    def inf_measurement_loss(
        self,
        model_fn: ModelFn,
        rng: jax.Array,
        x: jnp.ndarray,
        n_samples: int = 1,
    ) -> jnp.ndarray:
        """Sampled measurement loss of the infinite-step ELBO, ``(n_samples, batch)``.

        Importance-sampled over ``lambda ~ p(lambda)`` (reference: bsi/bsi.py:276-289).
        """
        rng_lambda, rng_mu = jax.random.split(rng)
        lambda_ = self._sample_lambda(rng_lambda, n_samples, x.shape[0], x.dtype)
        mu = self._sample_q_mu_lambda(rng_mu, x, lambda_)
        t = self.p_lambda.cdf(lambda_)
        x_hat = self._predict_x_flat(model_fn, mu, t)
        decoding_error = ((x[None] - x_hat) ** 2).reshape(n_samples, x.shape[0], -1).sum(-1)
        return 0.5 * self.p_lambda.reciprocal_pdf(lambda_) * decoding_error

    def finite_measurement_loss(
        self,
        model_fn: ModelFn,
        rng: jax.Array,
        x: jnp.ndarray,
        n_samples: int = 1,
        *,
        t: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Sampled measurement loss of the finite-step ELBO (reference: bsi/bsi.py:249-274)."""
        if t is None:
            t = self.default_schedule(x.dtype)
        lambda_ = self.p_lambda.icdf(t)
        alpha = jnp.diff(lambda_)
        k = alpha.shape[0]

        batch = x.shape[0]
        rng_i, rng_mu = jax.random.split(rng)
        i = jax.random.randint(rng_i, (n_samples, batch), 0, k)

        mu = self._sample_q_mu_lambda(rng_mu, x, lambda_[i])
        x_hat = self._predict_x_flat(model_fn, mu, t[i])
        decoding_error = ((x[None] - x_hat) ** 2).reshape(n_samples, batch, -1).sum(-1)
        return (0.5 * k) * alpha[i] * decoding_error

    def train_loss(
        self,
        model_fn: ModelFn,
        rng: jax.Array,
        x: jnp.ndarray,
    ) -> jnp.ndarray:
        """Per-example training loss, shape ``(batch,)``.

        A 1-sample estimate of the infinite-step ELBO measurement term with a
        mean over data dimensions (instead of a sum) and without constant
        factors (reference: bsi/bsi.py:291-310).
        """
        rng_lambda, rng_mu = jax.random.split(rng)
        lambda_ = self._sample_lambda(rng_lambda, 1, x.shape[0], x.dtype)[0]
        mu = self._sample_q_mu_lambda(rng_mu, x, lambda_)
        x_hat = self._predict_x(model_fn, mu, self.p_lambda.cdf(lambda_))
        decoding_error = ((x - x_hat) ** 2).reshape(x.shape[0], -1).mean(-1)
        return self.p_lambda.reciprocal_pdf(lambda_) * decoding_error

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
        """Draw ``n_samples`` samples via the k-step Bayesian update loop.

        Compiles to a single ``lax.scan`` over the schedule: each step decodes
        ``x_hat``, simulates a measurement ``y = x_hat + eps / sqrt(alpha_i)``,
        and performs the precision-weighted belief update
        ``mu <- (alpha_i * y + lambda_i * mu) / lambda_{i+1}``
        (reference: bsi/bsi.py:312-336).
        """
        mu, _ = self._sample_scan(model_fn, rng, n_samples, t, dtype, with_history=False)
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
        """Draw samples and return all intermediate states.

        Returns ``(mus, x_hats, ys)`` of shapes ``(k+1, n, *data)``,
        ``(k+1, n, *data)`` and ``(k, n, *data)`` (reference: bsi/bsi.py:338-373).
        """
        (mu_final, mu0), (mus_tail, x_hats, ys) = self._sample_scan(
            model_fn, rng, n_samples, t, dtype, with_history=True
        )
        final_x_hat = self._predict_x(
            model_fn, mu_final, protect_const(jnp.ones((n_samples,), dtype))
        )
        mus = jnp.concatenate([mu0[None], mus_tail], axis=0)
        x_hats = jnp.concatenate([x_hats, final_x_hat[None]], axis=0)
        return mus, x_hats, ys

    def _sample_scan(self, model_fn, rng, n_samples, t, dtype, *, with_history):
        if t is None:
            t = self.default_schedule(dtype)
        t = t.astype(dtype)
        lambda_ = self.p_lambda.icdf(t)
        alpha = jnp.diff(lambda_)
        k = alpha.shape[0]

        rng0, rng_steps = jax.random.split(rng)
        shape = (n_samples,) + self.data_shape
        mu0 = jax.lax.rsqrt(lambda_[0]) * jax.random.normal(rng0, shape, dtype)
        step_keys = jax.random.split(rng_steps, k)

        def step(mu, inp):
            t_i, lam_i, lam_next, alpha_i, key = inp
            x_hat = self._predict_x(model_fn, mu, jnp.full((n_samples,), t_i, dtype))
            y = x_hat + jax.lax.rsqrt(alpha_i) * jax.random.normal(key, shape, dtype)
            mu_next = (alpha_i * y + lam_i * mu) / lam_next
            if with_history:
                return mu_next, (mu_next, x_hat, y)
            return mu_next, None

        xs = (t[:-1], lambda_[:-1], lambda_[1:], alpha, step_keys)
        mu_final, hist = jax.lax.scan(step, mu0, xs)
        if with_history:
            return (mu_final, mu0), hist
        return mu_final, hist

    # --------------------------------------------------------------- internals

    def _predict_x_flat(
        self, model_fn: ModelFn, mu: jnp.ndarray, t: jnp.ndarray
    ) -> jnp.ndarray:
        """predict_x over a ``(n_samples, batch, *data)`` tensor via one flat model call."""
        n, b = mu.shape[:2]
        out = self._predict_x(
            model_fn, mu.reshape((n * b,) + mu.shape[2:]), t.reshape(-1)
        )
        return out.reshape((n, b) + out.shape[1:])

    def _predict_x(self, model_fn: ModelFn, mu: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """Decode the belief mean into a data estimate, with optional preconditioning."""
        if self.preconditioning is None:
            return model_fn(mu, t)
        c_skip, c_out, c_in = self._edm_preconditioning(t)
        return broadcast_right(c_skip, mu) * mu + broadcast_right(c_out, mu) * model_fn(
            broadcast_right(c_in, mu) * mu, t
        )

    def _edm_preconditioning(self, t: jnp.ndarray):
        """EDM-style preconditioning coefficients (arXiv:2206.00364 applied to BSI).

        Reference: bsi/bsi.py:390-403. ``kappa`` is written as
        ``1 + alpha * (alpha / lambda)`` to avoid squaring alpha (f32 overflow).
        """
        lambda_ = self.p_lambda.icdf(t)
        alpha = lambda_ - self.lambda_0
        kappa = 1.0 + alpha * (alpha / lambda_)
        c_skip = alpha / kappa
        c_out = jax.lax.rsqrt(kappa)
        c_in = jnp.sqrt(lambda_ / kappa)
        return c_skip, c_out, c_in

    def _sample_q_mu_lambda(
        self, rng: jax.Array, x: jnp.ndarray, lambda_: jnp.ndarray
    ) -> jnp.ndarray:
        """Sample the posterior-mean belief ``mu ~ q(mu | x, lambda)``.

        ``lambda_`` has shape ``(..., batch)``; the result broadcasts ``x`` to
        ``(..., batch, *data_shape)`` (reference: bsi/bsi.py:405-420).
        """
        x_b = x.reshape((1,) * (lambda_.ndim - 1) + x.shape)
        mean_coef = (lambda_ - self.lambda_0) / lambda_
        eps = jax.random.normal(rng, lambda_.shape + self.data_shape, x.dtype)
        return broadcast_right(mean_coef, x_b) * x_b + broadcast_right(
            jax.lax.rsqrt(lambda_), eps
        ) * eps

    def _sample_lambda(
        self, rng: jax.Array, n_samples: int, batch_size: int, dtype
    ) -> jnp.ndarray:
        """Sample noise precisions ``lambda ~ p(lambda)``, shape ``(n_samples, batch)``."""
        t = sample_lds_t(
            rng,
            n_samples,
            batch_size,
            low_discrepancy=self.low_discrepancy_sampling,
            dtype=dtype,
        )
        return self.p_lambda.icdf(t)
