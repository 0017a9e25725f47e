"""Generic generative-modeling task: config -> Trainer.

The reference has three near-identical 310-line Lightning task modules
(bsi/tasks/{bsi,vdm,bfn}.py) differing only in which algorithm they wrap
(SURVEY.md §7 step 6). Our algorithms share one functional surface, so one
builder covers all three: it instantiates the denoiser model, the algorithm,
the optimizer + LR schedule, and the EMA config, and assembles a
:class:`~bsi_tpu.train.loop.Trainer`.

Precision policy (the TrainOnlyAMP analogue, bsi/lightning/plugins.py:7-24):
``trainer.precision: "bf16"`` builds the *training* model with bfloat16
compute while the *eval* model stays float32 — parameters are float32 either
way, so both share the same param tree.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Optional

import jax.numpy as jnp

from bsi_tpu.config import instantiate
from bsi_tpu.train import (
    EMAConfig,
    Trainer,
    make_optimizer,
    warmup_cosine_schedule,
    warmup_schedule,
)
from bsi_tpu.utils.logging import MetricLogger


def build_model(model_cfg: dict, data_shape: tuple[int, ...], dtype=None):
    cfg = dict(model_cfg)
    # optional sub-components selected as 'none' compose to a target-less
    # stub dict; the model expects None
    for key in ("fourier_features", "pos_emb"):
        if isinstance(cfg.get(key), dict) and "_target_" not in cfg[key]:
            cfg[key] = None
    return instantiate(cfg, data_shape=tuple(data_shape), dtype=dtype)


def build_algorithm(algo_cfg: dict, data_shape: tuple[int, ...], discretization):
    return instantiate(
        algo_cfg, data_shape=tuple(data_shape), discretization=discretization
    )


def build_schedule(ls_cfg: Optional[dict], opt_cfg: dict, max_steps: int):
    lr = float(opt_cfg["lr"])
    if ls_cfg is None:
        return lr
    name = ls_cfg.get("name", "warmup")
    if name == "warmup":
        return warmup_schedule(
            lr,
            warmup_steps=int(ls_cfg.get("warmup_steps", 1000)),
            start_lr=float(ls_cfg.get("start_lr", 1e-8)),
        )
    if name == "cosine":
        return warmup_cosine_schedule(
            lr,
            warmup_steps=int(ls_cfg.get("warmup_steps", 1000)),
            max_steps=int(ls_cfg.get("max_steps", max_steps)),
            start_lr=float(ls_cfg.get("start_lr", 1e-8)),
            end_lr=float(ls_cfg["end_lr"]) if ls_cfg.get("end_lr") is not None else None,
        )
    raise ValueError(f"Unknown lr_scheduler {name!r}")


def build_optimizer(opt_cfg: dict, ls_cfg: Optional[dict], max_steps: int, gradient_clip):
    """Returns ``(optimizer, schedule)`` — the schedule also feeds train/lr
    logging (the LearningRateMonitor analogue, /root/reference/train.py:120)."""
    schedule = build_schedule(ls_cfg, opt_cfg, max_steps)
    return make_optimizer(
        schedule,
        name=opt_cfg.get("name", "adamw"),
        betas=tuple(opt_cfg.get("betas", (0.9, 0.999))),
        weight_decay=float(opt_cfg.get("weight_decay", 0.01)),
        gradient_clip=gradient_clip,
        mu_dtype=opt_cfg.get("mu_dtype"),
        nu_dtype=opt_cfg.get("nu_dtype"),
    ), schedule


def build_ema(ema_cfg: Optional[dict]) -> EMAConfig:
    if ema_cfg is None:
        return EMAConfig()
    fields = {f.name for f in dataclasses.fields(EMAConfig)}
    return EMAConfig(**{k: v for k, v in ema_cfg.items() if k in fields})


def build_task(
    config: dict,
    data,
    *,
    run_dir: str | Path,
    seed: int = 0,
    mesh=None,
    logger: Optional[MetricLogger] = None,
    callbacks: tuple = (),
    preemption=None,
) -> Trainer:
    """Assemble a Trainer from a fully-resolved config and a data module."""
    task_cfg: dict[str, Any] = config["task"]
    trainer_cfg: dict[str, Any] = config.get("trainer", {})
    data_shape = data.data_shape()

    precision = str(trainer_cfg.get("precision", "32"))
    train_dtype = jnp.bfloat16 if precision in ("bf16", "bf16-mixed") else None
    pp = int(trainer_cfg.get("pipeline_parallelism", 1) or 1)
    model_cfg = dict(task_cfg["model"])
    if pp > 1:
        # pipeline parallelism shards stacked transformer blocks; only the
        # DiT family supports the stacked (scan_blocks) layout
        model_cfg["scan_blocks"] = True
    model = build_model(model_cfg, data_shape, dtype=train_dtype)
    eval_model = (
        build_model(model_cfg, data_shape, dtype=None)
        if train_dtype is not None
        else model
    )

    algorithm = build_algorithm(
        task_cfg["algorithm"], data_shape, data.discretization()
    )
    if trainer_cfg.get("plots", True):
        from .plots import PlotsCallback

        callbacks = tuple(callbacks) + (PlotsCallback(),)

    # Validation-time FID (reference: bsi/tasks/bsi.py:168-178) — active when
    # precomputed stats + inception weights exist, silently absent otherwise
    fid_metrics = None
    if trainer_cfg.get("fid", True):
        import logging

        from bsi_tpu.metrics.fid import build_validation_fid

        fid_metrics = build_validation_fid(
            data,
            stats_root=trainer_cfg.get("fid_stats_root", "."),
            warn=logging.getLogger(__name__).warning,
        )

    profiler = None
    if trainer_cfg.get("profile_steps"):
        from bsi_tpu.utils.profiling import StepWindowProfiler

        profiler = StepWindowProfiler(
            Path(run_dir) / "profile", num_steps=int(trainer_cfg["profile_steps"])
        )

    # Tensor / pipeline parallelism: carve model / pipe axes out of the
    # device grid; the Trainer applies Megatron column/row weight shardings
    # (model axis) or stacked-block GPipe sharding (pipe axis) when > 1
    tp = int(trainer_cfg.get("model_parallelism", 1) or 1)
    dcn = int(trainer_cfg.get("dcn_data_parallelism", 1) or 1)
    if mesh is None and (tp > 1 or pp > 1 or dcn > 1):
        from bsi_tpu.parallel import make_mesh

        mesh = make_mesh(
            model_parallelism=tp,
            pipeline_parallelism=pp,
            dcn_data_parallelism=dcn,
        )

    max_steps = int(trainer_cfg.get("max_steps", 10000))
    optimizer, lr_schedule = build_optimizer(
        task_cfg["optimizer"],
        task_cfg.get("lr_scheduler"),
        max_steps,
        trainer_cfg.get("gradient_clip_val", 1.0),
    )

    return Trainer(
        algorithm=algorithm,
        model=model,
        eval_model=eval_model,
        optimizer=optimizer,
        data=data,
        ema=build_ema(task_cfg.get("ema")),
        max_steps=max_steps,
        val_check_interval=int(trainer_cfg.get("val_check_interval", max_steps)),
        log_every=int(trainer_cfg.get("log_every_n_steps", 50)),
        n_elbo_recon_samples=int(task_cfg.get("n_elbo_recon_samples", 1)),
        n_elbo_measure_samples=int(task_cfg.get("n_elbo_measure_samples", 1)),
        limit_eval_batches=trainer_cfg.get("limit_eval_batches"),
        sanity_val_batches=int(trainer_cfg.get("num_sanity_val_steps", 0) or 0),
        run_dir=run_dir,
        logger=logger,
        config=config,
        seed=seed,
        mesh=mesh,
        callbacks=callbacks,
        preemption=preemption,
        profiler=profiler,
        fsdp=bool(trainer_cfg.get("fsdp", False)),
        async_checkpointing=bool(trainer_cfg.get("async_checkpointing", True)),
        sequence_parallel=bool(trainer_cfg.get("sequence_parallel", False)),
        fid_metrics=fid_metrics,
        accumulate_grad_batches=int(trainer_cfg.get("accumulate_grad_batches", 1) or 1),
        lr_schedule=lr_schedule,
        pp_microbatches=(
            int(trainer_cfg["pp_microbatches"])
            if trainer_cfg.get("pp_microbatches")
            else None
        ),
        dropout_prng_impl=trainer_cfg.get("dropout_prng_impl") or None,
        stall_timeout_s=(
            float(trainer_cfg["stall_timeout_s"])
            if trainer_cfg.get("stall_timeout_s")
            else None
        ),
    )
