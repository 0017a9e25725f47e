"""Tests for EMA semantics, the fused train step, the Trainer loop, the
data-parallel mesh, and checkpoint/resume."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from bsi_tpu.core import BSI
from bsi_tpu.data import SyntheticDataModule
from bsi_tpu.models import DenoisingMLP
from bsi_tpu.nn import NyquistPositionalEmbedding
from bsi_tpu.parallel import make_mesh
from bsi_tpu.train import (
    EMAConfig,
    Trainer,
    ema_decay,
    ema_update,
    make_optimizer,
    warmup_cosine_schedule,
    warmup_schedule,
)

DATA_SHAPE = (8, 8, 3)


def test_ema_decay_matches_reference_formula():
    torch = pytest.importorskip("torch")
    from bsi.tasks.ema_pytorch import EMA as RefEMA

    ref = RefEMA(
        torch.nn.Linear(2, 2),
        beta=0.9999,
        update_after_step=10,
        update_every=1,
        inv_gamma=1.0,
        power=2 / 3,
        include_online_model=False,
    )
    cfg = EMAConfig(beta=0.9999, update_after_step=10, update_every=1, inv_gamma=1.0, power=2 / 3)
    for step in [0, 1, 5, 10, 11, 12, 50, 1000, 100000]:
        ref.step = step
        want = float(ref.get_current_decay())
        got = float(ema_decay(cfg, jnp.asarray(step)))
        npt.assert_allclose(got, want, rtol=1e-6, atol=1e-9)


def test_ema_update_copy_then_lerp():
    cfg = EMAConfig(beta=0.9, update_after_step=2, update_every=1, inv_gamma=1.0, power=1.0)
    ema = {"w": jnp.zeros(3)}
    params = {"w": jnp.ones(3)}
    # steps 0..2: copy (epoch <= 0)
    for step in range(3):
        out = ema_update(cfg, jnp.asarray(step), ema, params)
        npt.assert_allclose(np.asarray(out["w"]), 1.0)
    # step 4: epoch = 1, decay = min(1 - (1+1)^-1, 0.9) = 0.5
    out = ema_update(cfg, jnp.asarray(4), {"w": jnp.zeros(3)}, params)
    npt.assert_allclose(np.asarray(out["w"]), 0.5)


def test_ema_update_every_skips():
    cfg = EMAConfig(beta=0.5, update_after_step=0, update_every=2)
    ema = {"w": jnp.zeros(3)}
    params = {"w": jnp.ones(3)}
    # step 3 is off-cycle: no change
    out = ema_update(cfg, jnp.asarray(3), ema, params)
    npt.assert_allclose(np.asarray(out["w"]), 0.0)


def test_schedules():
    s = warmup_schedule(1e-3, warmup_steps=10, start_lr=1e-8)
    assert float(s(0)) == pytest.approx(1e-8)
    assert float(s(10)) == pytest.approx(1e-3)
    assert float(s(100)) == pytest.approx(1e-3)

    c = warmup_cosine_schedule(1e-3, warmup_steps=10, max_steps=110, end_lr=1e-5)
    assert float(c(10)) == pytest.approx(1e-3, rel=1e-3)
    assert float(c(110)) == pytest.approx(1e-5, rel=1e-3)
    mid = float(c(60))
    assert 1e-5 < mid < 1e-3


def make_trainer(tmp_path, mesh=None, **kwargs):
    algo = BSI(
        data_shape=DATA_SHAPE, lambda_0=1e-2, alpha_M=1e6, alpha_R=2e6, k=8,
        preconditioning="edm",
    )
    model = DenoisingMLP(
        data_shape=DATA_SHAPE, pos_emb=NyquistPositionalEmbedding(16, 100),
        hidden_width=64, layers=2,
    )
    data = SyntheticDataModule(
        n_train=64, n_val=16, data_shape=DATA_SHAPE, batch_size=16, train_eval_size=16
    )
    schedule = warmup_schedule(1e-3, 5)
    opt = make_optimizer(schedule, betas=(0.9, 0.99), weight_decay=1e-4)
    defaults = dict(
        algorithm=algo, model=model, optimizer=opt, data=data, lr_schedule=schedule,
        ema=EMAConfig(update_after_step=2),
        max_steps=12, val_check_interval=6, log_every=4,
        run_dir=tmp_path / "run", config={"seed": 0, "note": "test"}, seed=0,
        mesh=mesh,
    )
    defaults.update(kwargs)
    return Trainer(**defaults)


def test_trainer_end_to_end(tmp_path):
    trainer = make_trainer(tmp_path)
    metrics = trainer.fit()
    assert "train/loss" in metrics and math.isfinite(metrics["train/loss"])
    assert "val/bpd" in metrics and math.isfinite(metrics["val/bpd"])
    # train-subset eval logs under the plain "train" prefix like the
    # reference (bsi/tasks/bsi.py:205-211), alongside elbo loss parts
    assert "train/bpd" in metrics
    assert "val/l_recon" in metrics and math.isfinite(metrics["val/l_recon"])
    assert "val/l_measure" in metrics
    assert "best/bpd" in metrics and metrics["best/bpd"] <= metrics["val/bpd"] + 1e-9
    assert "train/lr" in metrics and metrics["train/lr"] > 0
    assert (tmp_path / "run" / "metrics.jsonl").exists()
    assert (tmp_path / "run" / "ckpt_last" / "meta.json").exists()
    assert int(trainer.state.step) == 12


def test_trainer_resume_is_exact(tmp_path):
    # Train 12 steps in one go
    t1 = make_trainer(tmp_path / "a", max_steps=12, val_check_interval=100)
    t1.fit()
    w1 = jax.tree.leaves(t1.state.params)[0]

    # Train 6 steps, checkpoint, resume to 12 in a fresh trainer
    t2 = make_trainer(tmp_path / "b", max_steps=6, val_check_interval=100)
    t2.fit()
    ckpt = t2.save("resume")
    t3 = make_trainer(tmp_path / "c", max_steps=12, val_check_interval=100)
    t3.fit(from_checkpoint=ckpt)
    w3 = jax.tree.leaves(t3.state.params)[0]

    npt.assert_allclose(np.asarray(w1), np.asarray(w3), atol=1e-6)
    assert int(t3.state.step) == 12


def test_data_parallel_matches_single_device(tmp_path):
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    t1 = make_trainer(tmp_path / "dp1", mesh=make_mesh(1), max_steps=8, val_check_interval=100)
    m1 = t1.fit()
    t8 = make_trainer(tmp_path / "dp8", mesh=make_mesh(8), max_steps=8, val_check_interval=100)
    m8 = t8.fit()
    # same seed, same batches -> same training trajectory up to reduction order
    npt.assert_allclose(m1["train/loss"], m8["train/loss"], rtol=1e-4)
    w1 = np.asarray(jax.tree.leaves(t1.state.params)[0])
    w8 = np.asarray(jax.tree.leaves(t8.state.params)[0])
    npt.assert_allclose(w1, w8, atol=1e-5)


def test_eval_mask_excludes_padding(tmp_path):
    """Masked-out (padded) rows must not influence the eval metric sums."""
    from bsi_tpu.train import make_eval_step

    t = make_trainer(tmp_path, max_steps=1, val_check_interval=100)
    t.fit()
    eval_step = jax.jit(make_eval_step(t.algorithm, t.eval_apply))

    rng = jax.random.key(0)
    good = next(t.data.train_batches(6))
    mask = jnp.asarray([1, 1, 1, 1, 1, 1, 0, 0], dtype=bool)
    garbage_a = np.concatenate([good, np.full((2,) + DATA_SHAPE, 1e3, np.float32)])
    garbage_b = np.concatenate([good, np.full((2,) + DATA_SHAPE, -7.0, np.float32)])
    out_a = eval_step(t.state, jnp.asarray(garbage_a), mask, rng)
    out_b = eval_step(t.state, jnp.asarray(garbage_b), mask, rng)
    assert float(out_a["count"]) == 6.0
    npt.assert_allclose(float(out_a["bpd_sum"]), float(out_b["bpd_sum"]), rtol=1e-6)
    assert math.isfinite(float(out_a["elbo_sum"]))


def test_validation_reproducible(tmp_path):
    """The eval-RNG contract (Trainer.validate docstring): every validate()
    call reseeds the same fixed key, so at the same params ALL metrics —
    including the FID over the identical generated sample set — are BITWISE
    repeatable across passes."""
    from bsi_tpu.metrics import FeatureStats, build_validation_fid, fid_stats_path, images_to_uint8

    data = SyntheticDataModule(
        n_train=64, n_val=16, data_shape=DATA_SHAPE, batch_size=16, train_eval_size=16
    )
    real = FeatureStats(6)
    val01 = (np.asarray(data.eval_splits()["val"], np.float64) + 1) / 2
    real.update(_stub_embed(images_to_uint8(val01)))
    real.save_npz(fid_stats_path(tmp_path, data.short_name(), "val"))
    fid_metrics = build_validation_fid(data, stats_root=tmp_path, embed_fn=_stub_embed)

    t = make_trainer(
        tmp_path, mesh=make_mesh(4), data=data, fid_metrics=fid_metrics,
        max_steps=2, val_check_interval=100,
    )
    t.fit()
    m_a = t.validate()
    m_b = t.validate()
    assert set(m_a) == set(m_b) and "val/fid-6" in m_a
    for k in m_a:
        assert m_a[k] == m_b[k], (k, m_a[k], m_b[k])


def _stub_embed(imgs_uint8):
    """Deterministic 6-d 'inception' stub: per-channel means and stds."""
    x = np.asarray(imgs_uint8, np.float64) / 255.0
    return np.concatenate([x.mean(axis=(1, 2)), x.std(axis=(1, 2))], axis=1)


def test_fid_in_validation_end_to_end(tmp_path):
    """FID flows through Trainer.validate: samples drawn per eval batch,
    distance logged per stage, accumulator reset (reference semantics:
    bsi/tasks/bsi.py:168-178,218-264)."""
    from bsi_tpu.metrics import (
        FeatureStats,
        build_validation_fid,
        fid_stats_path,
        images_to_uint8,
    )

    data = SyntheticDataModule(
        n_train=64, n_val=16, data_shape=DATA_SHAPE, batch_size=16, train_eval_size=16
    )
    # Precompute "real" statistics from the val split through the stub embedder
    real = FeatureStats(6)
    val01 = (np.asarray(data.eval_splits()["val"], np.float64) + 1) / 2
    real.update(_stub_embed(images_to_uint8(val01)))
    real.save_npz(fid_stats_path(tmp_path, data.short_name(), "val"))

    fid_metrics = build_validation_fid(data, stats_root=tmp_path, embed_fn=_stub_embed)
    assert set(fid_metrics) == {"val"}  # no stats for train/test -> no metric

    trainer = make_trainer(
        tmp_path, data=data, fid_metrics=fid_metrics, max_steps=6, val_check_interval=6
    )
    metrics = trainer.fit()
    assert "val/fid-6" in metrics and math.isfinite(metrics["val/fid-6"])
    assert metrics["val/fid-6"] > -1e-6  # a squared distance, up to fp error
    assert fid_metrics["val"].fake_stats.n == 0  # reset after compute
    assert "fid-6" in (tmp_path / "run" / "metrics.jsonl").read_text()

    # FID only applies to 3-channel image data (reference: bsi/tasks/bsi.py:170)
    gray = SyntheticDataModule(n_train=8, n_val=4, data_shape=(8, 8, 1))
    assert build_validation_fid(gray, stats_root=tmp_path, embed_fn=_stub_embed) == {}


def test_best_checkpoint_monotonic_across_restore(tmp_path):
    """best_bpd persists in checkpoint meta, so a requeued run never
    overwrites ckpt_best with a worse model."""
    t1 = make_trainer(tmp_path / "a", max_steps=6, val_check_interval=3)
    t1.fit()
    assert math.isfinite(t1.best_bpd)
    t1.best_bpd = -1.0  # pretend an earlier, better validation existed
    ckpt = t1.save("resume")

    t2 = make_trainer(tmp_path / "b", max_steps=12, val_check_interval=3)
    t2.restore(ckpt)
    assert t2.best_bpd == -1.0
    t2.fit()  # steps 6..12; every real bpd is worse than the restored best
    assert not (tmp_path / "b" / "run" / "ckpt_best").exists()
    assert (tmp_path / "b" / "run" / "ckpt_last").exists()


def test_batch_divisibility_guard(tmp_path):
    data = SyntheticDataModule(
        n_train=64, n_val=16, data_shape=DATA_SHAPE, batch_size=6, train_eval_size=16
    )
    t = make_trainer(tmp_path, data=data, mesh=make_mesh(4))
    with pytest.raises(ValueError, match="divisible"):
        t.fit()


def test_dropout_prng_impl_rbg(tmp_path):
    """The opt-in rbg dropout bit-generator (trainer.dropout_prng_impl): the
    rerouted key is valid, deterministic per (seed, step), distinct across
    inputs, and the full Trainer runs with it. Only dropout draws reroute —
    algorithm noise stays threefry (bsi_tpu/train/step.py::dropout_key_for)."""
    from bsi_tpu.train.step import dropout_key_for

    k = jax.random.key(7)
    assert dropout_key_for(None, k) is k
    r1, r2 = dropout_key_for("rbg", k), dropout_key_for("rbg", k)
    npt.assert_array_equal(jax.random.key_data(r1), jax.random.key_data(r2))
    other = dropout_key_for("rbg", jax.random.key(8))
    assert not np.array_equal(jax.random.key_data(r1), jax.random.key_data(other))
    # bulk draws through the rerouted key are well-formed
    bits = jax.random.bernoulli(r1, 0.1, (1024,))
    assert 0 < int(bits.sum()) < 1024

    from bsi_tpu.models import DenoisingDiT
    from bsi_tpu.nn import FourierFeatures

    model = DenoisingDiT(
        data_shape=DATA_SHAPE, patch_size=2, dim=32, depth=2, heads=2,
        dropout=0.2, fourier_features=FourierFeatures(n_min=6, n_max=7),
    )
    t = make_trainer(
        tmp_path, model=model, max_steps=4, val_check_interval=100,
        dropout_prng_impl="rbg",
    )
    m = t.fit()
    assert math.isfinite(m["train/loss"])


def test_grad_accumulation_matches_manual_average(tmp_path):
    """The fused accumulation step (lax.scan over micro-batches) must equal
    the hand-rolled oracle: per-micro grads with the same RNG splits,
    averaged, then ONE optimizer update."""
    import optax

    from bsi_tpu.train import make_train_step

    t = make_trainer(tmp_path, max_steps=1, val_check_interval=100)
    t.fit()
    state = t.state
    batch = jnp.asarray(next(t.data.train_batches(16))).reshape(4, 4, *DATA_SHAPE)

    step_fn = jax.jit(
        make_train_step(t.algorithm, t.train_apply, t.optimizer, t.ema_cfg, accum_steps=4)
    )
    new_state, metrics = step_fn(state, batch)

    rng_step = jax.random.fold_in(state.rng, state.step)
    rng_algo, rng_dropout = jax.random.split(rng_step)
    rngs_a = jax.random.split(rng_algo, 4)
    rngs_d = jax.random.split(rng_dropout, 4)
    losses, grads_list = [], []
    for i in range(4):
        def loss_fn(p):
            model_fn = lambda mu, tt: t.train_apply(p, mu, tt, rngs_d[i])
            return t.algorithm.train_loss(model_fn, rngs_a[i], batch[i]).mean()

        li, gi = jax.value_and_grad(loss_fn)(state.params)
        losses.append(li)
        grads_list.append(gi)
    want_loss = float(sum(losses) / 4)
    want_grads = jax.tree.map(lambda *gs: sum(gs) / 4, *grads_list)
    updates, _ = t.optimizer.update(want_grads, state.opt_state, state.params)
    want_params = optax.apply_updates(state.params, updates)

    npt.assert_allclose(float(metrics["train/loss"]), want_loss, rtol=1e-5)
    got_leaf = np.asarray(jax.tree.leaves(new_state.params)[0])
    want_leaf = np.asarray(jax.tree.leaves(want_params)[0])
    npt.assert_allclose(got_leaf, want_leaf, rtol=1e-5, atol=1e-7)
    assert int(new_state.step) == int(state.step) + 1  # ONE optimizer step


def test_grad_accumulation_end_to_end(tmp_path):
    data = SyntheticDataModule(
        n_train=64, n_val=16, data_shape=DATA_SHAPE, batch_size=16, train_eval_size=16
    )
    t = make_trainer(
        tmp_path, data=data, mesh=make_mesh(2), accumulate_grad_batches=4,
        max_steps=4, val_check_interval=100,
    )
    m = t.fit()
    assert math.isfinite(m["train/loss"]) and int(t.state.step) == 4

    bad = make_trainer(
        tmp_path / "bad", data=SyntheticDataModule(
            n_train=64, n_val=16, data_shape=DATA_SHAPE, batch_size=16,
            train_eval_size=16,
        ),
        mesh=make_mesh(8), accumulate_grad_batches=4,  # 16 % (4*8) != 0
    )
    with pytest.raises(ValueError, match="accumulate_grad_batches"):
        bad.fit()


def test_dcn_hybrid_mesh_matches_single_device(tmp_path):
    """Multi-slice layout (dcn_data_parallelism): the data axis is laid out
    slice-major (DCN factor outermost, ICI factors inner) — the SPMD program
    is identical to plain data parallelism, so the trajectory must match a
    single device. Also checks the grid shape/axis invariants directly."""
    mesh = make_mesh(8, dcn_data_parallelism=2)
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["data"] == 8

    # composition with a model axis: 2 slices x (2 data x 2 model) per slice
    m2 = make_mesh(8, model_parallelism=2, dcn_data_parallelism=2)
    assert m2.shape == {"data": 4, "model": 2}

    import pytest

    with pytest.raises(ValueError, match="dcn_data_parallelism"):
        make_mesh(8, dcn_data_parallelism=3)

    t1 = make_trainer(tmp_path / "a", mesh=make_mesh(1), max_steps=6,
                      val_check_interval=100)
    m1 = t1.fit()
    td = make_trainer(tmp_path / "b", mesh=mesh, max_steps=6,
                      val_check_interval=100)
    md = td.fit()
    npt.assert_allclose(m1["train/loss"], md["train/loss"], rtol=1e-4)
    w1 = np.asarray(jax.tree.leaves(t1.state.params)[0])
    wd = np.asarray(jax.tree.leaves(td.state.params)[0])
    npt.assert_allclose(w1, wd, atol=1e-5)


def test_async_checkpointing_overlap_and_consistency(tmp_path):
    """Async checkpoint writes (the default) must preserve the exact save
    semantics: overlapping saves to rotating tags commit in order, meta.json
    appears only with a committed state (the crash-consistency contract in
    train/checkpoint.py::AsyncCheckpointWriter), restore() flushes in-flight
    writes, and the restored state round-trips bit-exactly."""
    t = make_trainer(tmp_path / "a", max_steps=4, val_check_interval=100)
    t.fit()
    # several overlapped saves without waiting, incl. same-path overwrites
    t.best_bpd = 1.25
    t.save("spin", wait=False)
    t.save("spin", wait=False)
    p = t.save("final", wait=False)
    snap = jax.tree.map(np.asarray, t.state.params)
    t.flush_checkpoints()
    assert (p / "meta.json").exists()
    meta = __import__("json").loads((p / "meta.json").read_text())
    assert meta["extra"]["best_bpd"] == 1.25
    assert meta["data_state"] == t.data.state_dict()

    # restore into a fresh trainer goes through the flush path
    t2 = make_trainer(tmp_path / "b", max_steps=4, val_check_interval=100)
    t2.restore(p)
    for a, b in zip(jax.tree.leaves(snap), jax.tree.leaves(t2.state.params)):
        npt.assert_array_equal(np.asarray(a), np.asarray(b))

    # sync mode still works and is what wait=True degenerates to
    t3 = make_trainer(tmp_path / "c", max_steps=2, val_check_interval=100,
                      async_checkpointing=False)
    t3.fit()
    p3 = t3.save("manual")
    assert (p3 / "meta.json").exists()
