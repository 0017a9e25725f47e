"""Pipeline parallelism: stacked-block DiT layout, GPipe shard_map forward
and gradients, state sharding, and end-to-end Trainer trajectory equality.

Beyond reference capability (the torch reference is data-parallel only,
SURVEY.md §2.8); correctness is defined as equality with the non-pipelined
model on the same seed."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from bsi_tpu.core import BSI
from bsi_tpu.data import SyntheticDataModule
from bsi_tpu.models import DenoisingDiT
from bsi_tpu.models.dit import stack_block_params, unstack_block_params
from bsi_tpu.nn import FourierFeatures
from bsi_tpu.parallel import make_mesh
from bsi_tpu.parallel.pipeline import make_pipeline_apply, pp_state_sharding
from bsi_tpu.train import EMAConfig, Trainer, make_optimizer, warmup_schedule

DATA_SHAPE = (8, 8, 3)


def make_dit(**kw):
    args = dict(
        data_shape=DATA_SHAPE,
        patch_size=2,
        dim=32,
        depth=4,
        heads=2,
        fourier_features=FourierFeatures(n_min=6, n_max=7),
    )
    args.update(kw)
    return DenoisingDiT(**args)


def _inputs(batch=8):
    mu = jax.random.normal(jax.random.key(0), (batch,) + DATA_SHAPE, jnp.float32)
    t = jnp.linspace(0.0, 1.0, batch, dtype=jnp.float32)
    return mu, t


def test_scan_blocks_matches_loop_layout():
    """DiT(scan_blocks=True) is the same function as the loop layout once the
    params are packed; converters round-trip exactly."""
    loop, scan = make_dit(), make_dit(scan_blocks=True)
    mu, t = _inputs()
    p_loop = loop.init(jax.random.key(1), mu, t)
    p_packed = stack_block_params(p_loop, depth=4)
    y_loop = loop.apply(p_loop, mu, t)
    y_scan = scan.apply(p_packed, mu, t)
    npt.assert_array_equal(np.asarray(y_loop), np.asarray(y_scan))

    p_rt = unstack_block_params(p_packed)
    assert jax.tree.all(jax.tree.map(lambda a, b: bool((a == b).all()), p_rt, p_loop))

    # native scan init produces the stacked layout directly
    p_scan = scan.init(jax.random.key(1), mu, t)
    stacked = p_scan["params"]["dit"]["blocks"]["block"]
    assert all(leaf.shape[0] == 4 for leaf in jax.tree.leaves(stacked))


def _randomized_f64(params):
    """Random f64 params: adaLN-Zero init makes every block the identity
    (zero gates), which would mask block-level bugs; f64 makes the
    pipelined-vs-plain comparison exact up to ~1e-12."""
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.key(42), len(leaves))
    return jax.tree.unflatten(
        treedef,
        [
            0.05 * jax.random.normal(k, l.shape, jnp.float64)
            for k, l in zip(keys, leaves)
        ],
    )


@pytest.mark.parametrize("n_pipe,n_micro", [(2, 2), (4, 2), (4, 4)])
def test_pipeline_matches_plain_forward_and_grad(n_pipe, n_micro):
    model = make_dit(scan_blocks=True)
    mu, t = _inputs(batch=8)
    mu, t = mu.astype(jnp.float64), t.astype(jnp.float64)
    params = _randomized_f64(model.init(jax.random.key(1), mu, t))
    mesh = make_mesh(8, pipeline_parallelism=n_pipe)
    papply = make_pipeline_apply(model, mesh, microbatches=n_micro)

    y_ref = model.apply(params, mu, t)
    y_pipe = jax.jit(lambda p: papply(p, mu, t, None, deterministic=True))(params)
    npt.assert_allclose(np.asarray(y_pipe), np.asarray(y_ref), rtol=1e-10, atol=1e-10)

    def loss_ref(p):
        return (model.apply(p, mu, t) ** 2).mean()

    def loss_pipe(p):
        return (papply(p, mu, t, None, deterministic=True) ** 2).mean()

    g_ref = jax.grad(loss_ref)(params)
    g_pipe = jax.jit(jax.grad(loss_pipe))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pipe)):
        npt.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-8, atol=1e-10)


def test_pipeline_dropout_keys():
    """Dropout in the pipelined path: rng-dependent, deterministic per rng."""
    model = make_dit(scan_blocks=True, dropout=0.5)
    mu, t = _inputs(batch=8)
    # random params: at the adaLN-Zero init every block is the identity and
    # dropout inside the gated branches cannot reach the output
    params = jax.tree.map(
        lambda l: l.astype(jnp.float32),
        _randomized_f64(model.init(jax.random.key(1), mu, t)),
    )
    mesh = make_mesh(8, pipeline_parallelism=4)
    papply = make_pipeline_apply(model, mesh, microbatches=2)
    f = jax.jit(lambda p, r: papply(p, mu, t, r, deterministic=False))
    y1 = f(params, jax.random.key(5))
    y1b = f(params, jax.random.key(5))
    y2 = f(params, jax.random.key(6))
    npt.assert_array_equal(np.asarray(y1), np.asarray(y1b))
    assert float(jnp.abs(y1 - y2).max()) > 0
    assert bool(jnp.isfinite(y1).all())


def test_pp_state_sharding_layout():
    model = make_dit(scan_blocks=True)
    mu, t = _inputs(batch=8)
    params = model.init(jax.random.key(1), mu, t)
    mesh = make_mesh(8, pipeline_parallelism=4)
    sh = pp_state_sharding(params, mesh)
    stacked_spec = sh["params"]["dit"]["blocks"]["block"]["attn"]["to_qkv"]["kernel"].spec
    assert stacked_spec[0] == "pipe"
    assert sh["params"]["dit"]["patch_encoder"]["kernel"].spec == jax.sharding.PartitionSpec(
        None, None
    )
    # with FSDP, a second dim of large stacked leaves shards over data
    sh_fsdp = pp_state_sharding(params, mesh, fsdp=True, min_size=1)
    spec = sh_fsdp["params"]["dit"]["blocks"]["block"]["attn"]["to_qkv"]["kernel"].spec
    assert spec[0] == "pipe" and "data" in spec


def _make_pp_trainer(tmp_path, mesh, model, **kw):
    algo = BSI(
        data_shape=DATA_SHAPE, lambda_0=1e-2, alpha_M=1e6, alpha_R=2e6, k=4,
        preconditioning="edm",
    )
    data = SyntheticDataModule(
        n_train=64, n_val=16, data_shape=DATA_SHAPE, batch_size=16, train_eval_size=16
    )
    defaults = dict(
        algorithm=algo, model=model, optimizer=make_optimizer(warmup_schedule(1e-3, 5)),
        data=data, ema=EMAConfig(update_after_step=2), max_steps=6,
        val_check_interval=3, log_every=2, run_dir=tmp_path, seed=0, mesh=mesh,
    )
    defaults.update(kw)
    return Trainer(**defaults)


def test_trainer_pipeline_matches_single_device(tmp_path):
    """Full Trainer (train + eval) under PP(4)xDP(2) reproduces the
    single-device trajectory with the same seed."""
    model = make_dit(scan_blocks=True)
    t1 = _make_pp_trainer(tmp_path / "one", make_mesh(1), model)
    m1 = t1.fit()
    tp = _make_pp_trainer(
        tmp_path / "pp", make_mesh(8, pipeline_parallelism=4), model, pp_microbatches=2
    )
    mp = tp.fit()
    npt.assert_allclose(mp["train/loss"], m1["train/loss"], rtol=1e-4)
    npt.assert_allclose(mp["val/bpd"], m1["val/bpd"], rtol=1e-4)
    w1 = np.asarray(jax.tree.leaves(t1.state.params)[0])
    # pipelined params are stacked-layout like the single-device scan model
    wp = np.asarray(jax.tree.leaves(tp.state.params)[0])
    npt.assert_allclose(wp, w1, atol=1e-5)
    assert math.isfinite(mp["val/bpd"])


def test_trainer_pipeline_fsdp_smoke(tmp_path):
    """PP(2) composed with ZeRO-3 on the data axis runs and stays finite."""
    model = make_dit(scan_blocks=True)
    tr = _make_pp_trainer(
        tmp_path, make_mesh(8, pipeline_parallelism=2), model, fsdp=True, max_steps=2,
        val_check_interval=100,
    )
    m = tr.fit()
    assert math.isfinite(m["train/loss"])


def test_pipeline_requires_scan_blocks(tmp_path):
    model = make_dit()  # loop layout
    with pytest.raises(ValueError, match="scan_blocks"):
        _make_pp_trainer(tmp_path, make_mesh(8, pipeline_parallelism=4), model)


def test_pipeline_microbatch_divisibility(tmp_path):
    model = make_dit(scan_blocks=True)
    with pytest.raises(ValueError, match="pp_microbatches"):
        tr = _make_pp_trainer(
            tmp_path, make_mesh(8, pipeline_parallelism=4), model, pp_microbatches=3
        )
        tr.fit()


def test_pipeline_tp_matches_plain_forward_and_grad():
    """PP(2) x TP(2) x DP(2): the shard_map is manual over (data, pipe) only,
    the model axis stays AUTO, so the stacked blocks' Megatron column/row
    shardings (pp_state_sharding) drive GSPMD to insert the TP collectives
    inside each stage. Must equal the plain unsharded model."""
    model = make_dit(scan_blocks=True)
    mu, t = _inputs(batch=8)
    mu, t = mu.astype(jnp.float64), t.astype(jnp.float64)
    params = _randomized_f64(model.init(jax.random.key(1), mu, t))
    mesh = make_mesh(8, pipeline_parallelism=2, model_parallelism=2)

    sh = pp_state_sharding(params, mesh)
    # the TP rules fired on the stacked rank-3 leaves: [pipe, None, model]
    qkv_spec = sh["params"]["dit"]["blocks"]["block"]["attn"]["to_qkv"]["kernel"].spec
    assert qkv_spec[0] == "pipe" and qkv_spec[-1] == "model"
    out_spec = sh["params"]["dit"]["blocks"]["block"]["attn"]["to_out"]["kernel"].spec
    assert out_spec[0] == "pipe" and out_spec[-2] == "model"
    params_sh = jax.device_put(params, sh)

    papply = make_pipeline_apply(model, mesh, microbatches=2)
    y_ref = model.apply(params, mu, t)
    y_pipe = jax.jit(lambda p: papply(p, mu, t, None, deterministic=True))(params_sh)
    npt.assert_allclose(np.asarray(y_pipe), np.asarray(y_ref), rtol=1e-10, atol=1e-10)

    def loss_ref(p):
        return (model.apply(p, mu, t) ** 2).mean()

    def loss_pipe(p):
        return (papply(p, mu, t, None, deterministic=True) ** 2).mean()

    g_ref = jax.grad(loss_ref)(params)
    g_pipe = jax.jit(jax.grad(loss_pipe))(params_sh)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pipe)):
        npt.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-8, atol=1e-10)


def test_pipeline_sp_tp_matches_plain_forward_and_grad():
    """SP under PP: the token stream shards its SEQUENCE dim over the (AUTO)
    model axis inside the pipeline's (data, pipe)-manual shard_map —
    make_pipeline_apply rewrites the full [data, model, None] token sharding
    to the model axis only for the in-map blocks. Equality with the plain
    unsharded, non-SP model."""
    from bsi_tpu.parallel.sequence import apply_sequence_parallelism

    model = make_dit(scan_blocks=True)
    mu, t = _inputs(batch=8)
    mu, t = mu.astype(jnp.float64), t.astype(jnp.float64)
    params = _randomized_f64(model.init(jax.random.key(1), mu, t))
    mesh = make_mesh(8, pipeline_parallelism=2, model_parallelism=2)
    sp_model = apply_sequence_parallelism(model, mesh)
    params_sh = jax.device_put(params, pp_state_sharding(params, mesh))

    papply = make_pipeline_apply(sp_model, mesh, microbatches=2)
    y_ref = model.apply(params, mu, t)
    y_pipe = jax.jit(lambda p: papply(p, mu, t, None, deterministic=True))(params_sh)
    npt.assert_allclose(np.asarray(y_pipe), np.asarray(y_ref), rtol=1e-10, atol=1e-10)

    g_ref = jax.grad(lambda p: (model.apply(p, mu, t) ** 2).mean())(params)
    g_pipe = jax.jit(
        jax.grad(lambda p: (papply(p, mu, t, None, deterministic=True) ** 2).mean())
    )(params_sh)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pipe)):
        npt.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-8, atol=1e-10)


def test_trainer_pipeline_sp_tp_matches_single_device(tmp_path):
    """Full Trainer under SP(2)xPP(2)xDP(2) (sequence_parallel=True on a
    pipe+model mesh) reproduces the single-device trajectory."""
    model = make_dit(scan_blocks=True)
    t1 = _make_pp_trainer(tmp_path / "one", make_mesh(1), model)
    m1 = t1.fit()
    tsp = _make_pp_trainer(
        tmp_path / "sppptp",
        make_mesh(8, pipeline_parallelism=2, model_parallelism=2),
        model,
        pp_microbatches=2,
        sequence_parallel=True,
    )
    msp = tsp.fit()
    npt.assert_allclose(msp["train/loss"], m1["train/loss"], rtol=1e-4)
    npt.assert_allclose(msp["val/bpd"], m1["val/bpd"], rtol=1e-4)


def test_trainer_pipeline_tp_matches_single_device(tmp_path):
    """Full Trainer under PP(2)xTP(2)xDP(2) reproduces the single-device
    trajectory with the same seed."""
    model = make_dit(scan_blocks=True)
    t1 = _make_pp_trainer(tmp_path / "one", make_mesh(1), model)
    m1 = t1.fit()
    tp = _make_pp_trainer(
        tmp_path / "pptp",
        make_mesh(8, pipeline_parallelism=2, model_parallelism=2),
        model,
        pp_microbatches=2,
    )
    mp = tp.fit()
    npt.assert_allclose(mp["train/loss"], m1["train/loss"], rtol=1e-4)
    npt.assert_allclose(mp["val/bpd"], m1["val/bpd"], rtol=1e-4)
