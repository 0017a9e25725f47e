"""Worker for the multi-process CPU integration test (test_multiprocess.py).

Each spawned process joins a ``jax.distributed`` CPU cluster THROUGH THE
PRODUCTION ENTRY PATH — env vars + ``initialize_distributed()`` (the route a
real TPU pod takes via train.py) — before any other JAX API call. It then
runs two phases:

1. exactness: feeds its host shard of a constant dataset (so batch-assembly
   order cannot influence the loss), trains a few steps through the full
   Trainer, and writes its final metrics as JSON. Run with nproc=1 for the
   single-process ground truth.
2. run_one: drives ``train.py``'s ``run_one`` end-to-end (config ->
   data/task/Trainer -> fit -> checkpoint), then resumes it ``from_ckpt``,
   recording the run dir so the test can assert all hosts agreed on it.

Usage: _mp_worker.py <coordinator> <process_id> <num_processes> <out_json>
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo_root)


def main() -> None:
    coordinator, pid, nproc, out_json = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )
    # Production multi-host contract: the decision to initialize is taken
    # from env vars alone, and jax.distributed.initialize runs before any
    # backend-instantiating JAX API (parallel/distributed.py). Config
    # updates below are pure settings — backends initialize lazily — and are
    # needed because this image's sitecustomize pre-imports jax pinned to
    # the TPU tunnel, so the env vars alone cannot switch it to CPU.
    if nproc > 1:
        os.environ["JAX_COORDINATOR_ADDRESS"] = coordinator
        os.environ["JAX_NUM_PROCESSES"] = str(nproc)
        os.environ["JAX_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from bsi_tpu.parallel.distributed import host_shard, initialize_distributed

    initialize_distributed()
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 2 * nproc

    import numpy as np

    from bsi_tpu.core import BSI
    from bsi_tpu.data import ArrayDataModule
    from bsi_tpu.models import DenoisingMLP
    from bsi_tpu.nn import NyquistPositionalEmbedding
    from bsi_tpu.parallel import make_mesh
    from bsi_tpu.train import EMAConfig, Trainer, make_optimizer

    shape = (4, 4, 3)
    # All examples identical: the global loss is invariant to how hosts
    # assemble the batch, so 2-process must match 1-process exactly.
    value = 2 * (128 / 255) - 1  # an exact 8-bit bin center
    train = np.full((32,) + shape, value, np.float32)
    # val fills the eval batch exactly: no padding, so the mask (and hence
    # the noise-position pairing of the fixed eval RNG) is identical under
    # any host sharding and metrics must match bitwise up to reduction order
    val = np.full((16,) + shape, value, np.float32)

    shard_id, num_shards = host_shard()
    data = ArrayDataModule(
        train,
        val,
        batch_size=16,
        train_eval_size=16,
        seed=0,
        shard_id=shard_id,
        num_shards=num_shards,
    )
    algo = BSI(
        data_shape=shape, lambda_0=1e-2, alpha_M=1e6, alpha_R=2e6, k=4,
        preconditioning="edm",
    )
    model = DenoisingMLP(
        data_shape=shape, pos_emb=NyquistPositionalEmbedding(8, 100),
        hidden_width=32, layers=2,
    )
    # Validation-time FID with a stub embedder: per-host sample shards are
    # accumulated locally and summed across processes at compute time, so the
    # 2-process value must equal the 1-process value (identical global
    # samples from the same fixed eval key).
    from bsi_tpu.metrics.fid import FeatureStats, FIDScore

    def stub_embed(images_uint8):
        x = np.asarray(images_uint8, np.float64) / 255.0
        return np.stack(
            [x.mean(axis=(1, 2, 3)), x.std(axis=(1, 2, 3)),
             x[:, 0].mean(axis=(1, 2)), x[:, -1].mean(axis=(1, 2))], axis=1
        )

    real_stats = FeatureStats(4)
    real_stats.update(stub_embed((255 * (0.5 * (val + 1))).astype(np.uint8)))
    fid_metrics = {"val": FIDScore(stub_embed, real_stats)}

    run_dir = os.path.join(os.path.dirname(out_json), f"run_nproc{nproc}")
    trainer = Trainer(
        algorithm=algo,
        model=model,
        optimizer=make_optimizer(1e-3),
        data=data,
        ema=EMAConfig(update_after_step=1),
        max_steps=4,
        val_check_interval=100,
        log_every=2,
        run_dir=run_dir,
        seed=0,
        mesh=make_mesh(),
        fid_metrics=fid_metrics,
    )
    metrics = trainer.fit()

    param_sum = float(
        sum(
            np.abs(np.asarray(jax.device_get(leaf))).sum()
            for leaf in jax.tree.leaves(trainer.state.params)
        )
    )

    # ---- phases 1b/1c: TP and PP meshes across the live cluster ----------
    # TP: (data=nproc, model=2) — the model axis lies INSIDE each host (2
    # local devices), the data axis across hosts. Exercises the Megatron
    # weight shardings under real multi-process SPMD AND the validation-FID
    # replica-dedup guard (train/loop.py::_update_fid): with a model axis,
    # each host's two devices hold identical batch shards that must be
    # deduped, and the process-locality check must pass on this mesh.
    # PP: (data=nproc, pipe=2) — GPipe stages inside each host.
    from bsi_tpu.models import DenoisingDiT
    from bsi_tpu.nn import FourierFeatures

    extra = {}
    for phase, mesh_kw, model_kw, trainer_kw in (
        ("tp", dict(model_parallelism=2), {}, {}),
        (
            "pp",
            dict(pipeline_parallelism=2),
            dict(scan_blocks=True),
            dict(pp_microbatches=2),
        ),
    ):
        dit = DenoisingDiT(
            data_shape=shape,
            patch_size=2,
            dim=16,
            depth=2,
            heads=2,
            fourier_features=FourierFeatures(n_min=6, n_max=7),
            **model_kw,
        )
        ph_fid = {"val": FIDScore(stub_embed, real_stats)}
        ph_trainer = Trainer(
            algorithm=algo,
            model=dit,
            optimizer=make_optimizer(1e-3),
            data=data,
            ema=EMAConfig(update_after_step=1),
            max_steps=4,
            val_check_interval=100,
            log_every=2,
            run_dir=os.path.join(os.path.dirname(out_json), f"run_{phase}{nproc}"),
            seed=0,
            mesh=make_mesh(2 * nproc, **mesh_kw) if nproc > 1 else make_mesh(2),
            fid_metrics=ph_fid,
            **trainer_kw,
        )
        ph_metrics = ph_trainer.fit()
        extra[f"{phase}_loss"] = ph_metrics["train/loss"]
        extra[f"{phase}_val_bpd"] = ph_metrics["val/bpd"]
        extra[f"{phase}_val_fid"] = ph_metrics["val/fid-4"]
        extra[f"{phase}_param_sum"] = float(
            sum(
                np.abs(np.asarray(jax.device_get(leaf))).sum()
                for leaf in jax.tree.leaves(ph_trainer.state.params)
            )
        )

        if phase == "tp":
            # 2-process mid-run save + restore on the TP mesh: the orbax
            # multi-host save and Trainer.restore's device_put-to-sharded-
            # layout path (train/loop.py) under a live cluster with a
            # model axis. The resumed run continues 4 -> 6.
            ckpt = ph_trainer.save("resume")
            res_trainer = Trainer(
                algorithm=algo,
                model=dit,
                optimizer=make_optimizer(1e-3),
                data=data,
                ema=EMAConfig(update_after_step=1),
                max_steps=6,
                val_check_interval=100,
                log_every=2,
                run_dir=os.path.join(
                    os.path.dirname(out_json), f"run_{phase}{nproc}_res"
                ),
                seed=0,
                mesh=make_mesh(2 * nproc, **mesh_kw) if nproc > 1 else make_mesh(2),
                fid_metrics={"val": FIDScore(stub_embed, real_stats)},
                **trainer_kw,
            )
            res_metrics = res_trainer.fit(from_checkpoint=ckpt)
            extra["tp_resumed_loss"] = res_metrics["train/loss"]
            extra["tp_resumed_val_bpd"] = res_metrics["val/bpd"]
            extra["tp_resumed_param_sum"] = float(
                sum(
                    np.abs(np.asarray(jax.device_get(leaf))).sum()
                    for leaf in jax.tree.leaves(res_trainer.state.params)
                )
            )

    # ---- phase 2: train.py run_one end-to-end under the live cluster ----
    from bsi_tpu.config import ConfigLoader
    import train as train_cli

    root = os.path.join(os.path.dirname(out_json), "run_one_root")
    overrides = [
        "task=bsi",
        "data=synthetic",
        "data.n_train=32",
        "data.n_val=8",
        "data.batch_size=8",
        "task.model=mlp",
        "task.model.hidden_width=16",
        "task.algorithm.k=3",
        "task.ema.update_after_step=1",
        "trainer.max_steps=3",
        "trainer.val_check_interval=2",
        "trainer.log_every_n_steps=1",
        "trainer.num_sanity_val_steps=0",
        "trainer.plots=no",
        "trainer.fid=no",
        "seed=7",
        f"run_root={root}",
    ]
    loader = ConfigLoader(os.path.join(repo_root, "configs"))
    config = loader.load("train", overrides)
    config.pop("sweep", None)
    run_one_metrics = train_cli.run_one(config)
    run_dirs = [str(p) for p in __import__("pathlib").Path(root).rglob("ckpt_last")]
    assert len(run_dirs) == 1, run_dirs
    run_one_dir = os.path.dirname(run_dirs[0])

    # resume the finished run from its checkpoint through the same path
    config2 = loader.load(
        "train", overrides + [f"from_ckpt={run_dirs[0]}", "trainer.max_steps=5"]
    )
    config2.pop("sweep", None)
    resumed_metrics = train_cli.run_one(config2)

    result = {
        "process_id": pid,
        "num_processes": nproc,
        "devices": len(jax.devices()),
        "loss": metrics["train/loss"],
        "val_bpd": metrics["val/bpd"],
        "val_fid": metrics["val/fid-4"],
        "val_count_ok": True,
        "param_sum": param_sum,
        "run_one_dir": run_one_dir,
        "run_one_val_bpd": run_one_metrics.get("val/bpd"),
        "resumed_val_bpd": resumed_metrics.get("val/bpd"),
        **extra,
    }
    with open(out_json, "w") as f:
        json.dump(result, f)
    print("worker done:", result)


if __name__ == "__main__":
    main()
