"""Frechet Inception Distance machinery.

Mirrors the reference's FID stack (bsi/tasks/metrics/fid.py +
scripts/compute_fid_stats.py): real-dataset statistics are precomputed once
and stored as ``.npz`` with keys ``n``, ``sum``, ``cov_sum`` — the exact
torchmetrics state format, so stats files are interchangeable between the
torch reference and this framework. Generated-sample statistics are
accumulated streaming (sum + covariance sum), and the distance follows
torchmetrics' ``_compute_fid`` (trace of the matrix square root via
eigenvalues of cov1 @ cov2).
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional

import numpy as np


class FeatureStats:
    """Streaming (n, sum, cov_sum) accumulator over embedding batches."""

    def __init__(self, dim: int):
        self.n = 0
        self.sum = np.zeros(dim, np.float64)
        self.cov_sum = np.zeros((dim, dim), np.float64)

    def update(self, embeddings: np.ndarray) -> None:
        e = np.asarray(embeddings, np.float64)
        self.n += len(e)
        self.sum += e.sum(axis=0)
        self.cov_sum += e.T @ e

    def mean_cov(self) -> tuple[np.ndarray, np.ndarray]:
        if self.n < 2:
            raise ValueError("Need at least two samples for covariance")
        mean = self.sum / self.n
        cov = (self.cov_sum - self.n * np.outer(mean, mean)) / (self.n - 1)
        return mean, cov

    def save_npz(self, path: str | Path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(path, n=np.asarray(self.n), sum=self.sum, cov_sum=self.cov_sum)

    @classmethod
    def from_npz(cls, path: str | Path) -> "FeatureStats":
        with np.load(path) as z:
            stats = cls(len(z["sum"]))
            stats.n = int(np.asarray(z["n"]).item())
            stats.sum = z["sum"].astype(np.float64)
            stats.cov_sum = z["cov_sum"].astype(np.float64)
        return stats


def reduce_stats_across_processes(stats: FeatureStats) -> FeatureStats:
    """Sum a host-local :class:`FeatureStats` across all JAX processes.

    The accumulator is additive in (n, sum, cov_sum) — the same property
    torchmetrics relies on for its DDP state reduction
    (bsi/tasks/metrics/fid.py:72-77) — so multi-host validation-time FID is
    one all-gather of the packed statistics. No-op single-process."""
    import jax

    if jax.process_count() == 1:
        return stats
    from jax.experimental import multihost_utils

    packed = np.concatenate(
        [np.asarray([stats.n], np.float64), stats.sum, stats.cov_sum.ravel()]
    )
    # Ship the f64 payload BIT-EXACTLY as uint32 pairs: without
    # jax_enable_x64 (production never sets it) device transfer would
    # silently round the f64 stats to f32, corrupting the covariance sums.
    gathered = np.asarray(
        multihost_utils.process_allgather(packed.view(np.uint32))
    )  # [P, 2 * len]
    total = gathered.view(np.float64).sum(axis=0)
    dim = len(stats.sum)
    out = FeatureStats(dim)
    out.n = int(round(total[0]))
    out.sum = total[1 : 1 + dim]
    out.cov_sum = total[1 + dim :].reshape(dim, dim)
    return out


def frechet_distance(
    mean1: np.ndarray, cov1: np.ndarray, mean2: np.ndarray, cov2: np.ndarray
) -> float:
    """FID between two Gaussians, computed like torchmetrics' ``_compute_fid``:
    ``|m1-m2|^2 + tr(c1) + tr(c2) - 2 sum(sqrt(eigvals(c1 @ c2)).real)``."""
    a = np.atleast_1d(np.asarray(mean1, np.float64))
    b = np.atleast_1d(np.asarray(mean2, np.float64))
    c1 = np.atleast_2d(np.asarray(cov1, np.float64))
    c2 = np.atleast_2d(np.asarray(cov2, np.float64))
    diff = a - b
    eigvals = np.linalg.eigvals(c1 @ c2)
    tr_covmean = np.sqrt(eigvals.astype(np.complex128)).real.sum()
    return float(diff @ diff + np.trace(c1) + np.trace(c2) - 2.0 * tr_covmean)


def fid_from_stats(stats1: FeatureStats, stats2: FeatureStats) -> float:
    m1, c1 = stats1.mean_cov()
    m2, c2 = stats2.mean_cov()
    return frechet_distance(m1, c1, m2, c2)


def fid_stats_path(root: str | Path, dataset_name: str, split: str) -> Path:
    """Canonical location of precomputed stats (reference:
    scripts/compute_fid_stats.py:64-66)."""
    return Path(root) / "data" / "fid-stats" / dataset_name / f"{split}.npz"


class FIDScore:
    """FID against precomputed real-set statistics.

    ``embed_fn`` maps a uint8 image batch ``[N, H, W, 3]`` to ``[N, dim]``
    embeddings (see :mod:`bsi_tpu.metrics.inception`). Updates run in blocks
    to bound device memory (reference: bsi/tasks/metrics/fid.py:66-70).
    """

    def __init__(
        self,
        embed_fn: Callable[[np.ndarray], np.ndarray],
        real_stats: FeatureStats,
        *,
        block_size: int = 256,
        dim: Optional[int] = None,
    ):
        self.embed_fn = embed_fn
        self.real_stats = real_stats
        self.block_size = block_size
        self.fake_stats = FeatureStats(dim or len(real_stats.sum))

    def update(self, images_uint8: np.ndarray) -> None:
        for start in range(0, len(images_uint8), self.block_size):
            block = images_uint8[start : start + self.block_size]
            self.fake_stats.update(np.asarray(self.embed_fn(block)))

    def compute(self) -> float:
        return fid_from_stats(self.fake_stats, self.real_stats)

    def reset(self) -> None:
        self.fake_stats = FeatureStats(len(self.real_stats.sum))


def images_to_uint8(batch01: np.ndarray) -> np.ndarray:
    """[0,1]-clamped float images -> uint8, the FID input convention
    (reference: scripts/eval_fid.py:164-166)."""
    return (255 * np.clip(batch01, 0.0, 1.0)).astype(np.uint8)


def build_validation_fid(
    data,
    *,
    stages: tuple[str, ...] = ("val", "train", "test"),
    stats_root: str | Path = ".",
    weights_path: Optional[str | Path] = None,
    embed_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    block_size: int = 256,
    warn: Optional[Callable[[str], None]] = None,
) -> dict[str, "FIDScore"]:
    """Per-stage FIDScore metrics for training-time validation.

    Mirrors the reference's lazy metric construction (bsi/tasks/bsi.py:168-178):
    FID is only active for 3-channel image data, and only for stages whose
    precomputed real statistics exist at ``<stats_root>/data/fid-stats/
    <dataset>/<stage>.npz``; missing stats produce a warning, not an error.
    ``embed_fn`` overrides the InceptionV3 embedder (tests use a stub); when
    absent, inception weights are located via :func:`default_weights_path`.
    Returns ``{}`` when FID cannot be computed, so callers can always pass the
    result to :class:`~bsi_tpu.train.loop.Trainer`.
    """
    warn = warn or (lambda msg: None)
    shape = data.data_shape()
    if len(shape) != 3 or shape[-1] != 3:
        return {}

    stats: dict[str, FeatureStats] = {}
    for stage in stages:
        path = fid_stats_path(stats_root, data.short_name(), stage)
        if path.is_file():
            stats[stage] = FeatureStats.from_npz(path)
        else:
            warn(f"No precomputed FID statistics for {stage} found.")
    if not stats:
        return {}

    if embed_fn is None:
        from .inception import default_weights_path, load_params, make_embed_fn

        weights = weights_path or default_weights_path()
        if weights is None:
            warn(
                "FID stats found but no InceptionV3 weights; set "
                "BSI_TPU_INCEPTION_WEIGHTS to enable validation-time FID."
            )
            return {}
        embed_fn = make_embed_fn(load_params(weights))

    return {
        stage: FIDScore(embed_fn, real, block_size=block_size)
        for stage, real in stats.items()
    }
