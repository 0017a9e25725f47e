"""Discretization of a continuous interval into bins.

TPU-native counterpart of the reference's ``Discretization`` dataclass
(reference: bsi/bsi.py:12-58). Used for discretized Gaussian likelihoods in
bits-per-dimension evaluation and for converting model outputs to 8-bit
images. All methods are pure jnp functions so they trace cleanly under jit.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Discretization:
    """A discretization of the interval ``[min, max]`` into ``k`` bins.

    The bins are open on the right and centered on
    ``min + (max - min) * (i - 1) / (k - 1)`` for ``i = 1..k``.
    """

    min: float
    max: float
    k: int

    @classmethod
    def image_8bit(cls) -> "Discretization":
        """Discretization of 8-bit images rescaled to the [-1, 1] interval."""
        return cls(-1.0, 1.0, 256)

    def bin_boundaries(self, dtype=jnp.float32) -> jnp.ndarray:
        """The ``k + 1`` boundaries of the bins (including outer edges)."""
        lo, hi = self.range
        return jnp.linspace(lo, hi, self.k + 1, dtype=dtype)

    def bucketize(self, x: jnp.ndarray) -> jnp.ndarray:
        """Find the discrete bucket index of continuous values in [min, max]."""
        dx = self.dx
        idx = (x - (self.min - dx / 2)) / dx
        return jnp.clip(idx.astype(jnp.int32), 0, self.k - 1)

    def bin_centers(self, dtype=jnp.float32) -> jnp.ndarray:
        """The ``k`` bin centers."""
        return jnp.linspace(self.min, self.max, self.k, dtype=dtype)

    def to_unit_interval(self, x: jnp.ndarray) -> jnp.ndarray:
        """Map x from [min, max] to [0, 1]."""
        return (x - self.min) / (self.max - self.min)

    def to_8bit_image(self, data: jnp.ndarray) -> jnp.ndarray:
        """Convert continuous data in the [min, max] range into 8-bit values."""
        scaled = self.to_unit_interval(data) * 255
        return jnp.clip(scaled, 0, 255).astype(jnp.uint8)

    @property
    def range(self) -> tuple[float, float]:
        """The full covered interval, half a bin wider than [min, max] on each side."""
        dx = self.dx
        return (self.min - dx / 2, self.max + dx / 2)

    @property
    def dx(self) -> float:
        """Width of a single bin."""
        return (self.max - self.min) / (self.k - 1)
