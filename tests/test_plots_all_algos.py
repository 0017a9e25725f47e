"""Plots callback across all three algorithms + 'none' fourier config."""

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent


@pytest.mark.parametrize("task", ["bsi", "vdm", "bfn"])
def test_plots_render_for_all_algorithms(task, tmp_path):
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
            "task.model.hidden_width=16",
            "task.algorithm.k=3",
            "task.ema.update_after_step=1",
            "trainer.max_steps=2",
            "trainer.val_check_interval=2",
            "trainer.limit_eval_batches=1",
            "trainer.num_sanity_val_steps=0",
            "trainer.plots=yes",
            "seed=1",
            f"run_root={tmp_path}/runs",
        ]
    )
    assert rc == 0
    plots = list((tmp_path / "runs").glob("*/*/plots/step_2/*.png"))
    names = {p.name for p in plots}
    assert "val_samples.png" in names
    assert "val_histories.png" in names
    assert "val_denoisings.png" in names, f"denoisings missing for {task}: {names}"


def test_fourier_none_option(tmp_path):
    sys.path.insert(0, str(REPO))
    import train as train_cli

    rc = train_cli.main(
        [
            "data=synthetic",
            "data.n_train=16",
            "data.n_val=8",
            "data.batch_size=8",
            "task.model=mlp",
            "task.model.fourier_features=none",
            "task.algorithm.k=2",
            "mode=debug",
            "seed=1",
            f"run_root={tmp_path}/runs",
        ]
    )
    assert rc == 0
