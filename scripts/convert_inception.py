#!/usr/bin/env python
"""Convert the official FID InceptionV3 torch checkpoint to .npz — the
one-command FID-readiness step.

The reference downloads ``pt_inception-2015-12-05-6726825d.pth`` at first
use (bsi/tasks/metrics/fid.py:35-48, via pytorch-fid). This environment has
no egress, so the day the .pth file lands (scp, mounted bucket, ...) run:

    python scripts/convert_inception.py /path/to/pt_inception-*.pth

which writes ``data/pt_inception.npz`` (HWIO conv layout, fc head dropped —
see bsi_tpu/metrics/inception.py::convert_torch_state_dict), verifies the
converted graph against the torch checkpoint on a random image batch, and
prints the env var export that enables validation-time FID. From there the
driver's FID protocol is the existing two commands:

    python scripts/compute_fid_stats.py cifar10 train
    python scripts/eval_fid.py <run_dir> ...   (reference: scripts/eval_fid.py:141-178)
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

from _common import REPO_ROOT  # noqa: F401  (sys.path side effect)

from bsi_tpu.metrics.inception import load_params, make_embed_fn


def convert(pth_path: Path, out_path: Path, *, verify: bool = True) -> Path:
    params = load_params(pth_path)  # .pth branch: torch load + OIHW->HWIO
    out_path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(out_path, **params)

    if verify:
        # Round-trip check: the .npz reload must embed identically to the
        # freshly converted params (and both must produce finite 2048-d
        # features). The torch-vs-jax graph equivalence itself is covered by
        # tests/test_metrics.py::test_inception_full_graph_matches_torch_mirror.
        imgs = np.random.default_rng(0).integers(
            0, 256, size=(4, 299, 299, 3), dtype=np.uint8
        )
        ours = np.asarray(make_embed_fn(params)(imgs))
        reloaded = np.asarray(make_embed_fn(load_params(out_path))(imgs))
        if ours.shape != (4, 2048) or not np.isfinite(ours).all():
            raise SystemExit(f"converted graph produced bad features: {ours.shape}")
        np.testing.assert_array_equal(ours, reloaded)
        print(f"verified: finite [4, 2048] features, npz round-trip exact")
    return out_path


def self_test() -> None:
    """One-command FID-readiness re-verification (no weights file needed).

    Drives the FULL pipeline — uint8 images -> bilinear resize -> InceptionV3
    embed -> streaming (n, sum, cov_sum) stats -> Frechet distance — at
    random weights against the EXECUTED torch oracle (the independent
    pt_inception transcription in tests/test_metrics.py) and prints the
    torch-vs-jax deltas. The day the real .pth lands, only the weights
    change, not any code this exercises. Oracle semantics:
    /root/reference/bsi/tasks/metrics/fid.py:20-84.
    """
    import torch

    sys.path.insert(0, str(REPO_ROOT / "tests"))
    import test_metrics as oracle  # the executed-torch mirror + rich weights

    from bsi_tpu.metrics import FeatureStats, FIDScore, fid_from_stats

    params = {k: v.astype(np.float32) for k, v in oracle._rich_random_params(3).items()}
    embed = make_embed_fn(params)

    mirror = oracle._torch_pt_inception_mirror(torch).eval()
    state = {}
    for key, value in params.items():
        if key.endswith("conv.weight"):
            state[key] = torch.tensor(value.transpose(3, 2, 0, 1))
        else:
            state[key] = torch.tensor(value)
    missing, unexpected = mirror.load_state_dict(state, strict=False)
    assert not unexpected, unexpected

    rng = np.random.default_rng(11)
    real_u8 = rng.integers(0, 256, size=(12, 32, 32, 3), dtype=np.uint8)
    fake_u8 = rng.integers(32, 224, size=(10, 32, 32, 3), dtype=np.uint8)

    def torch_feats(u8):
        x01 = torch.tensor(u8.transpose(0, 3, 1, 2)).float() / 255.0
        with torch.no_grad():
            return mirror(x01).double().numpy()

    ours_real, ours_fake = np.asarray(embed(real_u8)), np.asarray(embed(fake_u8))
    t_real, t_fake = torch_feats(real_u8), torch_feats(fake_u8)
    delta = max(
        np.abs(ours_real - t_real).max(), np.abs(ours_fake - t_fake).max()
    )
    print(f"max |jax - torch| embedding delta: {delta:.3e} (2048-d, {len(real_u8)}+{len(fake_u8)} images)")

    # production stats objects (block_size < n exercises the streaming path)
    real_stats = FeatureStats(2048)
    real_stats.update(ours_real)
    score = FIDScore(embed, real_stats, block_size=4)
    score.update(fake_u8)
    fid_full = fid_from_stats(score.fake_stats, real_stats)

    # distance cross-check on a 256-d slice (a full 2048-d nonsymmetric eig
    # is minutes of CPU; the formula is dimension-independent either way)
    dim = 256
    ours_slice = FeatureStats(dim)
    ours_slice.update(ours_fake[:, :dim])
    real_slice = FeatureStats(dim)
    real_slice.update(ours_real[:, :dim])
    fid_slice = fid_from_stats(ours_slice, real_slice)

    fr, ff = torch.tensor(t_real[:, :dim]), torch.tensor(t_fake[:, :dim])
    m1, m2 = ff.mean(0), fr.mean(0)
    c1 = (ff - m1).T @ (ff - m1) / (len(ff) - 1)
    c2 = (fr - m2).T @ (fr - m2) / (len(fr) - 1)
    eig = torch.linalg.eigvals(c1 @ c2)
    torch_fid = float(
        ((m1 - m2) @ (m1 - m2)).item()
        + torch.trace(c1).item()
        + torch.trace(c2).item()
        - 2 * eig.sqrt().real.sum().item()
    )
    fid_delta = abs(fid_slice - torch_fid) / max(abs(torch_fid), 1e-12)
    print(f"FID pipeline (ours, full 2048-d): {fid_full:.6f}")
    print(f"FID {dim}-d slice: ours {fid_slice:.6f} vs torch formula {torch_fid:.6f} (rel delta {fid_delta:.2e})")

    if delta > 1e-3 or fid_delta > 1e-4:
        raise SystemExit("SELF-TEST FAILED: torch-vs-jax pipeline deltas too large")
    print("SELF-TEST OK")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "pth", nargs="?", help="pt_inception-*.pth torch checkpoint"
    )
    parser.add_argument(
        "--out", default=str(REPO_ROOT / "data" / "pt_inception.npz")
    )
    parser.add_argument("--no-verify", action="store_true")
    parser.add_argument(
        "--self-test", action="store_true",
        help="verify the full uint8->resize->embed->stats->distance pipeline "
        "against the executed torch oracle at random weights (no .pth needed)",
    )
    args = parser.parse_args()

    if args.self_test:
        self_test()
        return
    if args.pth is None:
        parser.error("pth is required unless --self-test is given")

    out = convert(Path(args.pth), Path(args.out), verify=not args.no_verify)
    print(f"wrote {out}")
    print(f"export BSI_TPU_INCEPTION_WEIGHTS={out}")


if __name__ == "__main__":
    main()
