"""Per-pixel Fourier features (VDM paper, arXiv:2006.10739).

High-frequency sinusoidal features of the *data values* — crucial for
likelihood modeling at low noise levels (reference: bsi/nn/fourier_features.py).
Pure, parameter-free transform over the trailing (channel) axis of NHWC data.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FourierFeatures:
    """Features ``sin(2 pi 2^n x + {0, pi/2})`` for ``n in [n_min, n_max]``.

    Applied to the trailing axis: input ``[..., C]`` maps to
    ``[..., C * n_features()]`` with (channel, frequency, phase) ordering.
    """

    n_min: int
    n_max: int

    def n_features(self) -> int:
        return 2 * (self.n_max - self.n_min + 1)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ns = np.arange(self.n_min, self.n_max + 1)
        coefs = jnp.asarray(2 * math.pi * (2.0**ns), x.dtype)
        offsets = jnp.asarray(np.array([0.0, math.pi / 2]), x.dtype)
        # [..., C, n, 2] -> flatten the trailing three axes into channels
        args = coefs[:, None] * x[..., None, None] + offsets
        return jnp.sin(args).reshape(*x.shape[:-1], -1)
