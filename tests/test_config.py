"""Tests for the config composition engine, interpolation, and instantiation."""

from pathlib import Path

import pytest

from bsi_tpu.config import (
    ConfigError,
    ConfigLoader,
    instantiate,
    resolve_interpolations,
)

CONFIG_DIR = Path(__file__).parent.parent / "configs"


@pytest.fixture(scope="module")
def loader():
    return ConfigLoader(CONFIG_DIR)


def test_default_composition(loader):
    cfg = loader.load("train", ["data=synthetic"])
    assert cfg["task"]["name"] == "bsi"
    assert cfg["task"]["algorithm"]["_target_"] == "bsi_tpu.core.BSI"
    assert cfg["task"]["model"]["name"] == "unet"
    assert cfg["task"]["model"]["pos_emb"]["_target_"] == "bsi_tpu.nn.NyquistPositionalEmbedding"
    # task body overrides the optimizer group defaults
    assert cfg["task"]["optimizer"]["lr"] == 3e-4
    assert cfg["task"]["optimizer"]["betas"] == [0.9, 0.99]
    assert cfg["trainer"]["max_steps"] == 50000
    assert cfg["debug"] is False


def test_group_override(loader):
    cfg = loader.load("train", ["data=synthetic", "task=vdm"])
    assert cfg["task"]["name"] == "vdm"
    assert cfg["task"]["algorithm"]["_target_"] == "bsi_tpu.core.VDM"
    assert cfg["task"]["algorithm"]["snr_max"] == 597195.613793


def test_subgroup_override(loader):
    cfg = loader.load("train", ["data=synthetic", "task.model=dit"])
    assert cfg["task"]["model"]["name"] == "dit"
    assert cfg["task"]["model"]["patch_size"] == 2
    # dit has no pos_emb subgroup and no stale unet keys
    assert "levels" not in cfg["task"]["model"]
    assert "pos_emb" not in cfg["task"]["model"]


def test_value_overrides(loader):
    cfg = loader.load(
        "train",
        ["data=synthetic", "task.optimizer.lr=1e-5", "trainer.max_steps=7", "+extra.note=hi"],
    )
    assert cfg["task"]["optimizer"]["lr"] == 1e-5
    assert cfg["trainer"]["max_steps"] == 7
    assert cfg["extra"]["note"] == "hi"


def test_unknown_value_override_rejected(loader):
    with pytest.raises(ConfigError):
        loader.load("train", ["task.optimizer.does_not_exist=1"])


def test_unknown_group_option_rejected(loader):
    with pytest.raises(ConfigError):
        loader.load("train", ["task=nonexistent"])


def test_experiment_overlay(loader):
    cfg = loader.load("train", ["experiment=cifar10-vdm"])
    assert cfg["data"]["name"] == "cifar10"
    assert cfg["data"]["batch_size"] == 128
    assert cfg["data"]["eval_batch_size"] == 512
    assert cfg["task"]["optimizer"]["lr"] == 2e-4
    assert cfg["task"]["optimizer"]["weight_decay"] == 1e-2
    assert cfg["trainer"]["max_steps"] == 10000000
    assert cfg["eval_testset"] is True
    # interpolations referencing group values
    assert cfg["name"] == "bsi"
    assert cfg["title"] == "bsi-cifar10-vdm"


def test_experiment_regroups_without_stale_keys(loader):
    cfg = loader.load("train", ["experiment=imagenet32"])
    assert cfg["task"]["model"]["name"] == "DiT-L-2"
    assert "levels" not in cfg["task"]["model"]
    assert cfg["task"]["lr_scheduler"]["name"] == "cosine"
    assert cfg["task"]["lr_scheduler"]["end_lr"] == 5e-5
    assert cfg["sweep"]["task"] == ["vdm", "bfn", "bsi"]
    # CLI wins over the experiment's group re-selection
    cfg2 = loader.load("train", ["experiment=imagenet32", "task=vdm", "task.model=dit"])
    assert cfg2["task"]["algorithm"]["_target_"] == "bsi_tpu.core.VDM"


def test_cosine_end_lr_eval_resolver(loader):
    cfg = loader.load(
        "train", ["data=synthetic", "task.lr_scheduler=cosine", "task.optimizer.lr=4e-4"]
    )
    ls = cfg["task"]["lr_scheduler"]
    assert ls["end_lr"] == pytest.approx(4e-6)
    assert ls["max_steps"] == cfg["trainer"]["max_steps"]


def test_interpolation_relative_and_eval():
    cfg = resolve_interpolations(
        {
            "a": {"x": 3, "b": {"y": "${..x}", "z": "${eval:'2 * ${.y}'}"}},
            "s": "n=${a.x}",
        }
    )
    assert cfg["a"]["b"]["y"] == 3
    assert cfg["a"]["b"]["z"] == 6
    assert cfg["s"] == "n=3"


def test_eval_resolver_rejects_non_arithmetic():
    with pytest.raises(ConfigError):
        resolve_interpolations({"x": "${eval:'__import__(\"os\")'}"})


def test_instantiate():
    from bsi_tpu.core import BSI

    obj = instantiate(
        {
            "_target_": "bsi_tpu.core.BSI",
            "name": "ignored",
            "lambda_0": 1e-2,
            "alpha_M": 1e6,
            "alpha_R": 2e6,
            "k": 5,
            "preconditioning": None,
        },
        data_shape=(4,),
    )
    assert isinstance(obj, BSI)
    assert obj.k == 5


def test_instantiate_recursive():
    from bsi_tpu.nn import FourierFeatures

    obj = instantiate(
        {
            "_target_": "bsi_tpu.nn.FourierFeatures",
            "n_min": 1,
            "n_max": 2,
        }
    )
    assert isinstance(obj, FourierFeatures)


def test_train_cli_end_to_end(tmp_path, monkeypatch):
    """Drive the train.py main() with the debug mode on synthetic data."""
    import sys

    sys.path.insert(0, str(CONFIG_DIR.parent))
    import train as train_cli

    monkeypatch.chdir(tmp_path)
    rc = train_cli.main(
        [
            "data=synthetic",
            "mode=debug",
            "task.model=mlp",
            "task.ema.update_after_step=1",
            "seed=7",
            f"run_root={tmp_path}/runs",
            "eval_testset=yes",
        ]
    )
    assert rc == 0
    run_dirs = list((tmp_path / "runs").glob("*/*"))
    assert run_dirs, "run directory created"
    assert (run_dirs[0] / "metrics.jsonl").exists()
    assert (run_dirs[0] / "ckpt_last" / "meta.json").exists()
