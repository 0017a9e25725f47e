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


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("pth", help="pt_inception-*.pth torch checkpoint")
    parser.add_argument(
        "--out", default=str(REPO_ROOT / "data" / "pt_inception.npz")
    )
    parser.add_argument("--no-verify", action="store_true")
    args = parser.parse_args()

    out = convert(Path(args.pth), Path(args.out), verify=not args.no_verify)
    print(f"wrote {out}")
    print(f"export BSI_TPU_INCEPTION_WEIGHTS={out}")


if __name__ == "__main__":
    main()
