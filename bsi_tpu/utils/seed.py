"""Seed handling.

The reference derives all randomness from one ``np.random.SeedSequence``,
storing the (possibly generated) big-int seed back into the config as a
string so runs are reproducible (bsi/utils/seed.py:8-20). In JAX the
algorithmic randomness is a PRNG key threaded through the train state; here
we resolve the seed and derive the key / numpy generators.
"""

from __future__ import annotations

import numpy as np

_MAX_JAX_SEED = 2**63 - 1


def resolve_seed(config: dict) -> int:
    """Return the run seed, generating one if the config has none, and store
    it back into the config (as an int; JSON-safe)."""
    seed = config.get("seed")
    if seed is None:
        seed = int(np.random.SeedSequence().entropy % _MAX_JAX_SEED)
    seed = int(seed) % _MAX_JAX_SEED
    config["seed"] = seed
    return seed
