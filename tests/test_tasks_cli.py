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
