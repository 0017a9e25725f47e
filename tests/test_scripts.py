"""End-to-end tests of the offline eval/analysis scripts.

Trains a tiny model via the CLI, then drives the scripts against its
checkpoint in-process (the scripts' main() with patched argv).
"""

import json
import runpy
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent
SCRIPTS = REPO / "scripts"


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ckpt_run")
    sys.path.insert(0, str(REPO))
    import train as train_cli

    rc = train_cli.main(
        [
            "data=synthetic",
            "data.n_train=64",
            "data.n_val=16",
            "data.batch_size=16",
            "task.model=mlp",
            "task.algorithm.k=4",
            "task.ema.update_after_step=1",
            "trainer.max_steps=3",
            "trainer.val_check_interval=2",
            "trainer.log_every_n_steps=1",
            "trainer.limit_eval_batches=1",
            "trainer.plots=no",
            "seed=11",
            f"run_root={tmp}/runs",
        ]
    )
    assert rc == 0
    ckpts = sorted(tmp.glob("runs/*/*/ckpt_last"))
    assert ckpts
    return ckpts[0]


def run_script(name: str, argv: list[str], monkeypatch):
    monkeypatch.syspath_prepend(str(SCRIPTS))
    monkeypatch.setattr(sys, "argv", [name] + argv)
    runpy.run_path(str(SCRIPTS / name), run_name="__main__")


def test_eval_elbo(checkpoint, tmp_path, monkeypatch):
    out = tmp_path / "elbo.json"
    run_script(
        "eval_elbo.py",
        ["-c", str(checkpoint), "-o", str(out), "-k", "inf", "4", "--split", "val",
         "-r", "2", "-m", "2", "data.eval_batch_size=16"],
        monkeypatch,
    )
    results = json.loads(out.read_text())
    assert "inf" in results["bpd_means"] and "4" in results["bpd_means"]
    assert np.isfinite(results["bpd_means"]["inf"])
    assert results["bpd_mean_vars"]["inf"] > 0


def test_generate_samples_and_render(checkpoint, tmp_path, monkeypatch):
    out = tmp_path / "samples.npz"
    run_script(
        "generate_samples.py",
        ["-c", str(checkpoint), "-o", str(out), "-n", "12", "-k", "4",
         "data.eval_batch_size=8"],
        monkeypatch,
    )
    with np.load(out) as z:
        assert z["samples"].shape == (12, 8, 8, 3)
        assert np.isfinite(z["samples"]).all()

    png = tmp_path / "grid.png"
    run_script("render_samples.py", [str(out), str(png), "--cols", "4"], monkeypatch)
    assert png.exists()


def test_generate_sample_history(checkpoint, tmp_path, monkeypatch):
    out = tmp_path / "hist.npz"
    run_script(
        "generate_sample_history.py",
        ["-c", str(checkpoint), "-o", str(out), "-n", "3", "-k", "4"],
        monkeypatch,
    )
    with np.load(out) as z:
        assert z["mus"].shape == (5, 3, 8, 8, 3)
        assert z["x_hats"].dtype == np.uint8
        assert z["ys"].shape == (4, 3, 8, 8, 3)


def test_sample_h_alpha(checkpoint, tmp_path, monkeypatch):
    out = tmp_path / "h_alpha.npz"
    run_script(
        "sample_h_alpha.py",
        ["-c", str(checkpoint), "-o", str(out), "-n", "16", "--split", "val",
         "data.eval_batch_size=16"],
        monkeypatch,
    )
    with np.load(out) as z:
        assert z["lambda"].shape == (16,)
        errs = z["squared_error_samples_bpd"]
        assert errs.shape[0] == 16
        assert np.isfinite(errs).all()


def test_eval_overrides(checkpoint, tmp_path, monkeypatch, capsys):
    out = tmp_path / "metrics.json"
    run_script(
        "eval_overrides.py",
        ["-c", str(checkpoint), "-o", str(out), "trainer.limit_eval_batches=1"],
        monkeypatch,
    )
    metrics = json.loads(out.read_text())
    assert any(k.startswith("test/") for k in metrics)


def test_eval_fid_requires_weights(checkpoint, tmp_path, monkeypatch):
    with pytest.raises(SystemExit, match="Inception weights"):
        run_script(
            "eval_fid.py",
            ["-c", str(checkpoint), "-o", str(tmp_path / "fid.json"), "-k", "4"],
            monkeypatch,
        )


def test_convert_inception_self_test(monkeypatch, capsys):
    """The one-command FID-readiness check (README): full pipeline at random
    weights vs the executed torch oracle, exits zero and prints the deltas."""
    run_script("convert_inception.py", ["--self-test"], monkeypatch)
    out = capsys.readouterr().out
    assert "SELF-TEST OK" in out
    assert "embedding delta" in out


def test_eval_fid_happy_path(checkpoint, tmp_path, monkeypatch):
    """The full eval_fid flow (checkpoint -> schedule sweep -> sample ->
    embed -> stats -> train+test FID -> JSON) with a stub embedder and
    synthetic real-statistics files. Oracle:
    /root/reference/scripts/eval_fid.py:99-195."""
    import bsi_tpu.metrics as M
    from bsi_tpu.metrics import FeatureStats, fid_from_stats, fid_stats_path, images_to_uint8

    def stub_embed(imgs_uint8):
        x = np.asarray(imgs_uint8, np.float64) / 255.0
        return np.concatenate([x.mean(axis=(1, 2)), x.std(axis=(1, 2))], axis=1)

    # swap the InceptionV3 for the stub at the module boundary the script
    # imports from (the weights file itself is bypassed)
    monkeypatch.setattr(M, "load_params", lambda path: {})
    monkeypatch.setattr(M, "make_embed_fn", lambda params: stub_embed)

    # precomputed "real" stats from the checkpoint's own data module, in the
    # same .npz layout compute_fid_stats.py writes
    monkeypatch.syspath_prepend(str(SCRIPTS))
    from _common import load_trainer

    _, _, data = load_trainer(str(checkpoint), [])
    split_stats = {}
    for split, arr in (
        ("train", data.eval_splits()["train"]),
        ("test", data.test_splits()["test"]),
    ):
        stats = FeatureStats(6)
        stats.update(stub_embed(images_to_uint8((np.asarray(arr) + 1) / 2)))
        stats.save_npz(fid_stats_path(tmp_path, data.short_name(), split))
        split_stats[split] = stats

    # the sweep: 2 k-values x 2 schedules
    outs = {}
    for sched in ("linear", "cosine"):
        out = tmp_path / f"fid_{sched}.json"
        run_script(
            "eval_fid.py",
            [
                "-c", str(checkpoint), "-o", str(out), "-k", "2", "4",
                "-s", sched, "-n", "16", "--fid-stats-root", str(tmp_path),
                "--inception-weights", "stubbed", "--batch-size", "16",
                "data.eval_batch_size=16",
            ],
            monkeypatch,
        )
        outs[sched] = json.loads(out.read_text())

    model_fids = []
    for sched, res in outs.items():
        assert res["config"]["schedule"] == sched
        assert res["config"]["k"] == [2, 4]
        assert set(res["fid"]) == {"2", "4"}
        for k, by_split in res["fid"].items():
            assert set(by_split) == {"train", "test"}
            for v in by_split.values():
                assert np.isfinite(v) and v > -1e-6  # a squared distance
                model_fids.append(v)

    # sampling from the real distribution itself (the test data) scores far
    # better than the 3-step model: the metric discriminates
    real_vs_real = fid_from_stats(split_stats["test"], split_stats["train"])
    assert real_vs_real < 0.5 * min(model_fids), (real_vs_real, min(model_fids))


def test_paired_noise_eval_parity(tmp_path, monkeypatch):
    """Same weights + IDENTICAL noise realizations in both frameworks: the
    bpd gap must be machine epsilon (the definitive form of the 1e-3 bpd
    parity target; scripts/parity_eval.py::run_paired). Tiny MC counts keep
    it fast — the pairing mechanism, not the estimator quality, is under test."""
    monkeypatch.syspath_prepend(str(SCRIPTS))
    import parity_eval as pe

    out = tmp_path / "paired.json"
    summary = pe.run(
        ("bsi", "vdm", "bfn"), steps=5, n_train=64, n_val=16, n_recon=2,
        n_measure=8, bs=8, paired_only=True, out=str(out),
    )
    assert summary["all_paired_pass_1e-3"]
    # the real bar: identical integrand sample path => float-epsilon gap
    assert summary["max_paired_per_example_gap"] < 1e-9
    for r in summary["results"]:
        sites = r["paired"]["draw_sites"]
        assert any("perm" in k for k in sites), sites
    assert json.loads(out.read_text())["all_paired_pass_1e-3"]
