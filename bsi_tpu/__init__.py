"""bsi_tpu: a TPU-native framework for Bayesian Sample Inference generative models.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of the
reference PyTorch codebase (martenlienen/bsi, arXiv:2502.07580): the BSI
algorithm plus VDM and BFN baselines, DiT and VDM-UNet denoisers, a
data-parallel training harness over TPU meshes, and the full evaluation suite
(ELBO/bits-per-dim, FID, sampling tooling).
"""

from .core import BFN, BSI, VDM, Discretization, LogUniform, broadcast_right

__version__ = "0.1.0"

__all__ = [
    "BSI",
    "VDM",
    "BFN",
    "Discretization",
    "LogUniform",
    "broadcast_right",
    "__version__",
]
