"""Nyquist-scaled sinusoidal positional embedding.

Parameter-free embedding of a position ``t in [0, 1]`` whose frequencies are
geometrically spaced from 1/8 (slow enough that the slowest feature is almost
linear in t) up to ``Nyquist / (2 * golden_ratio)`` — an irrational fraction
of the Nyquist frequency of the expected sampling rate so high-frequency
features neither alias nor collapse onto a small set of values.
(Design rationale documented at reference: bsi/models/pos_emb.py:7-36.)

Implemented as a pure dataclass (no parameters, no module state): the scale
and bias vectors are compile-time constants baked into the jaxpr.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class NyquistPositionalEmbedding:
    """Sine/cosine embedding of ``t`` with Nyquist-bounded frequencies.

    Args:
        size: Number of embedding features (must be even).
        expected_rate: Expected sampling rate per unit interval; sets the
            Nyquist frequency that bounds the fastest feature.
    """

    size: int
    expected_rate: int

    def __post_init__(self):
        if self.size % 2 != 0:
            raise ValueError("size must be even")

    @property
    def _scale_bias(self) -> tuple[np.ndarray, np.ndarray]:
        k = self.size // 2
        nyquist = self.expected_rate / 2
        golden_ratio = (1 + math.sqrt(5)) / 2
        freqs = np.geomspace(1 / 8, nyquist / (2 * golden_ratio), num=k)
        # Each frequency sampled twice: sin and (shifted by pi/2) cos
        scale = np.repeat(2 * np.pi * freqs, 2)
        bias = np.tile(np.array([0.0, np.pi / 2]), k)
        return scale.astype(np.float32), bias.astype(np.float32)

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        """Embed ``t`` of any shape into ``t.shape + (size,)``."""
        scale, bias = self._scale_bias
        args = jnp.asarray(scale, t.dtype) * t[..., None] + jnp.asarray(bias, t.dtype)
        return jnp.sin(args)

    def table(self, t: np.ndarray) -> np.ndarray:
        """Pure-numpy embedding of concrete positions (for compile-time
        constants such as fixed 2D patch position tables)."""
        scale, bias = self._scale_bias
        return np.sin(scale * np.asarray(t)[..., None] + bias)
