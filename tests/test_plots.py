"""Test the validation plots callback end-to-end on a tiny run."""

from pathlib import Path

from bsi_tpu.core import BSI
from bsi_tpu.data import SyntheticDataModule
from bsi_tpu.models import DenoisingMLP
from bsi_tpu.nn import NyquistPositionalEmbedding
from bsi_tpu.tasks.plots import PlotsCallback
from bsi_tpu.train import EMAConfig, Trainer, make_optimizer


def test_plots_written(tmp_path):
    algo = BSI(data_shape=(8, 8, 3), lambda_0=1e-2, alpha_M=1e6, alpha_R=2e6, k=3)
    model = DenoisingMLP(
        data_shape=(8, 8, 3), pos_emb=NyquistPositionalEmbedding(16, 100),
        hidden_width=32, layers=1,
    )
    data = SyntheticDataModule(n_train=32, n_val=8, batch_size=8, train_eval_size=8)
    trainer = Trainer(
        algorithm=algo,
        model=model,
        optimizer=make_optimizer(1e-3),
        data=data,
        ema=EMAConfig(update_after_step=0),
        max_steps=2,
        val_check_interval=2,
        limit_eval_batches=1,
        run_dir=tmp_path,
        callbacks=(PlotsCallback(n_samples=8, n_histories=2, n_quantiles=3),),
    )
    trainer.fit()
    plot_dir = tmp_path / "plots" / "step_2"
    assert (plot_dir / "val_samples.png").exists()
    assert (plot_dir / "val_histories.png").exists()
    assert (plot_dir / "val_denoisings.png").exists()
