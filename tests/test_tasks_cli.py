"""CLI smoke tests: every task (bsi/vdm/bfn) and model config trains a step."""

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent


@pytest.mark.parametrize("task", ["bsi", "vdm", "bfn"])
def test_task_trains_via_cli(task, tmp_path):
    sys.path.insert(0, str(REPO))
    import train as train_cli

    rc = train_cli.main(
        [
            f"task={task}",
            "data=synthetic",
            "data.n_train=32",
            "data.n_val=8",
            "data.batch_size=8",
            "task.model=mlp",
            "task.model.hidden_width=32",
            "task.algorithm.k=3",
            "task.ema.update_after_step=1",
            "mode=debug",
            "seed=1",
            f"run_root={tmp_path}/runs",
        ]
    )
    assert rc == 0


@pytest.mark.parametrize("model,extra", [
    ("unet", ["task.model.dim=32", "task.model.levels=1"]),
    ("dit", ["task.model.dim=32", "task.model.depth=1", "task.model.heads=2",
             "task.model.patch_size=2", "task.model.remat=yes"]),
])
def test_model_configs_train_via_cli(model, extra, tmp_path):
    sys.path.insert(0, str(REPO))
    import train as train_cli

    rc = train_cli.main(
        [
            f"task.model={model}",
            *extra,
            "data=synthetic",
            "data.n_train=16",
            "data.n_val=8",
            "data.batch_size=8",
            "task.algorithm.k=3",
            "task.ema.update_after_step=1",
            "mode=debug",
            "seed=1",
            f"run_root={tmp_path}/runs",
        ]
    )
    assert rc == 0


def test_model_parallelism_via_cli(tmp_path):
    """trainer.model_parallelism carves a model axis out of the device grid
    and the run trains with Megatron TP shardings (tensor.py)."""
    sys.path.insert(0, str(REPO))
    import train as train_cli

    rc = train_cli.main(
        [
            "task.model=dit",
            "task.model.dim=32",
            "task.model.depth=1",
            "task.model.heads=2",
            "task.model.patch_size=2",
            "trainer.model_parallelism=2",
            "data=synthetic",
            "data.n_train=16",
            "data.n_val=8",
            "data.batch_size=8",
            "task.algorithm.k=3",
            "task.ema.update_after_step=1",
            "mode=debug",
            "seed=1",
            f"run_root={tmp_path}/runs",
        ]
    )
    assert rc == 0


def test_eval_testset_tests_best_checkpoint(tmp_path):
    """eval_testset=yes restores ckpt_best before testing (the reference's
    trainer.test(ckpt_path='best'), /root/reference/train.py:219-221)."""
    sys.path.insert(0, str(REPO))
    import train as train_cli

    rc = train_cli.main(
        [
            "task=bsi",
            "data=synthetic",
            "data.n_train=32",
            "data.n_val=8",
            "data.batch_size=8",
            "task.model=mlp",
            "task.model.hidden_width=32",
            "task.algorithm.k=3",
            "task.ema.update_after_step=1",
            "mode=debug",
            "eval_testset=yes",
            "trainer.max_steps=4",
            "trainer.val_check_interval=2",
            "seed=1",
            f"run_root={tmp_path}/runs",
        ]
    )
    assert rc == 0
    run_dir = next((tmp_path / "runs" / "exploring").iterdir())
    assert (run_dir / "ckpt_best").exists()
    metrics = [
        __import__("json").loads(line)
        for line in (run_dir / "metrics.jsonl").read_text().splitlines()
    ]
    assert any(any(k.startswith("test/") for k in m) for m in metrics)
