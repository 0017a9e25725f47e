"""GPipe-style pipeline parallelism over the mesh's ``pipe`` axis.

Beyond reference capability (the torch reference is data-parallel only,
SURVEY.md §2.8). The DiT's transformer blocks are stored STACKED (one leaf
per weight with a leading ``depth`` axis — ``DenoisingDiT(scan_blocks=True)``)
and that leading axis is sharded over ``pipe``: each pipeline stage holds
``depth / n_pipe`` contiguous blocks. The forward runs under ``jax.shard_map``
(manual over ``data`` and ``pipe``):

- embed (patchify/encoder/pos-emb/t-conditioning) and decode run OUTSIDE the
  pipeline, replicated over ``pipe`` — they are <1% of the FLOPs;
- each stage applies its local blocks with a ``lax.scan`` over the stacked
  leaves, activations move stage-to-stage with ONE ``ppermute`` per tick
  (point-to-point over the ICI ring — the cheapest collective there is);
- the per-device batch is split into ``microbatches`` so stages overlap;
  the classic GPipe bubble is ``(P-1)/(M+P-1)`` of the ticks;
- the last stage's outputs are returned to every stage with one masked
  ``psum`` so downstream (loss) code sees a pipe-invariant value.

Differentiable end-to-end: ``shard_map`` transposes the ``ppermute``s and
inserts the gradient reductions implied by the in_specs, so ``jax.grad`` of
a pipelined loss just works — the train step, optimizer, EMA, and
checkpointing are untouched.

Scheduling note: this is the GPipe fill-drain schedule, chosen because it
composes with the fused single-program train step (no per-stage optimizer
phases). A 1F1B schedule would shrink peak activation memory, not the
bubble; with ``M >= 4`` microbatches the bubble is already <= 1/3 ticks and
overlaps with the data-parallel gradient all-reduce.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS, PIPE_AXIS


def _stacked_depth(path_str: str, leaf) -> bool:
    """True for stacked transformer-block leaves (scan layout)."""
    return "/blocks/block/" in path_str or path_str.endswith("/blocks/block")


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)


def pp_state_sharding(state, mesh: Mesh, *, fsdp: bool = False, min_size: int = 2**14):
    """Per-leaf shardings for a TrainState under pipeline parallelism.

    Stacked block leaves shard their leading (depth) axis over ``pipe``.
    When the mesh also has a ``model`` axis > 1, block weight matrices
    additionally shard tensor-parallel in Megatron column/row pairs on their
    trailing dims (bsi_tpu/parallel/tensor.py rules — the stacked leaves'
    paths still end in ``to_qkv/kernel`` etc., and ``tp_leaf_spec`` operates
    on the LAST two dims, so rank-3 stacked kernels work unchanged). With
    ``fsdp`` every leaf additionally shards its largest remaining divisible
    dim over ``data`` (ZeRO-3). Everything else is replicated (or ZeRO-3
    sharded)."""
    from .fsdp import assign_zero3_dim
    from .tensor import tp_leaf_spec

    n_pipe = mesh.shape[PIPE_AXIS]
    tp = mesh.shape.get(MODEL_AXIS, 1)
    data_size = mesh.shape[DATA_AXIS]

    def to_sharding(path, leaf):
        shape = getattr(leaf, "shape", ())
        spec = tp_leaf_spec(_path_str(path), shape, tp)
        if _stacked_depth(_path_str(path), leaf) and len(shape) >= 1 and shape[0] % n_pipe == 0:
            spec[0] = PIPE_AXIS
        if fsdp:
            spec = assign_zero3_dim(spec, shape, data_size, min_size)
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(to_sharding, state)


def make_pipeline_apply(model, mesh: Mesh, *, microbatches: int | None = None):
    """Build a pipelined ``apply(params, mu, t, rng, deterministic)`` for a
    ``DenoisingDiT(scan_blocks=True)`` over a mesh with a ``pipe`` axis.

    Drop-in replacement for ``model.apply`` in the train/eval steps: same
    params tree (stacked layout), same output. ``microbatches`` defaults to
    the pipe-axis size; the per-device batch must divide by it."""
    from bsi_tpu.models.dit import DiTBlock

    n_pipe = int(mesh.shape[PIPE_AXIS])
    n_micro = int(microbatches or n_pipe)
    depth = int(model.depth)
    if depth % n_pipe:
        raise ValueError(f"model depth {depth} not divisible by pipe axis {n_pipe}")
    # Tensor parallelism composes via partial-manual shard_map: the map below
    # is manual over (data, pipe) only, the `model` axis stays AUTO, so the
    # stacked weights enter with their Megatron column/row shardings intact
    # (pp_state_sharding) and GSPMD inserts the TP collectives inside each
    # stage exactly as in the unpipelined case.
    n_model = int(mesh.shape.get(MODEL_AXIS, 1))
    # Sequence parallelism under PP: the batch dim is manual (per-shard)
    # inside the map, so the model's full [data, model, None] token sharding
    # cannot be used there — constrain only the AUTO model axis on the
    # sequence dim; embed/decode outside the map keep the full sharding.
    inner_token_sharding = None
    if getattr(model, "token_sharding", None) is not None and n_model > 1:
        inner_token_sharding = P(None, MODEL_AXIS, None)
    block = DiTBlock(
        heads=model.heads,
        mlp_ratio=model.mlp_ratio,
        dropout=model.dropout,
        dtype=model.dtype,
        token_sharding=inner_token_sharding,
    )
    n_local = depth // n_pipe
    remat = bool(getattr(model, "remat", False))

    def _gpipe_local(stacked_local, tokens, c, key, deterministic: bool):
        """Manual (per-device) GPipe tick loop. tokens: [b_loc, S, D]."""
        b_loc = tokens.shape[0]
        if b_loc % n_micro:
            raise ValueError(
                f"per-device batch {b_loc} not divisible by microbatches={n_micro}"
            )
        xs = tokens.reshape(n_micro, b_loc // n_micro, *tokens.shape[1:])
        cs = c.reshape(n_micro, b_loc // n_micro, *c.shape[1:])
        stage = jax.lax.axis_index(PIPE_AXIS)
        # global layer ids of this stage's blocks, for per-layer dropout keys
        layer_ids = stage * n_local + jnp.arange(n_local)

        def stage_fn(tok, c_mb, mb_idx):
            def body(tok_, layer):
                lp, lid = layer
                rngs = None
                if key is not None:
                    # distinct mask per (layer, microbatch); the data-axis
                    # fold happens once outside (in `run`)
                    rngs = {"dropout": jax.random.fold_in(key, lid * n_micro + mb_idx)}
                tok_ = block.apply(
                    {"params": lp}, tok_, c_mb, deterministic, rngs=rngs
                )
                return tok_, None

            if remat:
                body = jax.checkpoint(
                    body,
                    policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                )
            tok, _ = jax.lax.scan(body, tok, (stacked_local, layer_ids))
            return tok

        def tick(carry, i):
            state, outs = carry
            # stage 0 injects microbatch i (clipped during drain)
            inj = jax.lax.dynamic_index_in_dim(xs, jnp.clip(i, 0, n_micro - 1), keepdims=False)
            state = jnp.where(stage == 0, inj, state)
            # stage s processes microbatch i - s at tick i
            mb_idx = jnp.clip(i - stage, 0, n_micro - 1)
            c_mb = jax.lax.dynamic_index_in_dim(cs, mb_idx, keepdims=False)
            state = stage_fn(state, c_mb, mb_idx)
            # the last stage has just finished microbatch i - (P-1)
            out_i = i - (n_pipe - 1)
            safe = jnp.clip(out_i, 0, n_micro - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, safe, keepdims=False)
            write = jnp.logical_and(stage == n_pipe - 1, out_i >= 0)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(write, state, cur), safe, 0
            )
            # rotate activations one stage down the ring
            state = jax.lax.ppermute(
                state, PIPE_AXIS, [(p, (p + 1) % n_pipe) for p in range(n_pipe)]
            )
            return (state, outs), None

        outs0 = jnp.zeros_like(xs)
        (_, outs), _ = jax.lax.scan(
            tick, (jnp.zeros_like(xs[0]), outs0), jnp.arange(n_micro + n_pipe - 1)
        )
        # broadcast the last stage's outputs to every stage (pipe-invariant)
        outs = jax.lax.psum(
            jnp.where(stage == n_pipe - 1, outs, jnp.zeros_like(outs)), PIPE_AXIS
        )
        return outs.reshape(b_loc, *tokens.shape[1:])

    def apply(params, mu, t, rng, *, deterministic: bool):
        tokens, c = model.apply(params, mu, t, method="embed")
        stacked = params["params"]["dit"]["blocks"]["block"]
        if rng is not None and not deterministic and (model.dropout or 0.0) > 0.0:
            key = rng
        else:
            key = None

        def run(stacked_l, tok, cc, k):
            if k is not None:
                # decorrelate dropout across data shards: same key would give
                # every shard's examples identical masks
                k = jax.random.fold_in(k, jax.lax.axis_index(DATA_AXIS))
            return _gpipe_local(stacked_l, tok, cc, k, deterministic)

        key_specs = () if key is None else (P(),)
        keys = () if key is None else (key,)
        out = jax.shard_map(
            lambda s, tok, cc, *k: run(s, tok, cc, k[0] if k else None),
            mesh=mesh,
            in_specs=(P(PIPE_AXIS), P(DATA_AXIS), P(DATA_AXIS)) + key_specs,
            out_specs=P(DATA_AXIS),
            axis_names={DATA_AXIS, PIPE_AXIS},
            check_vma=False,
        )(stacked, tokens, c, *keys)
        return model.apply(params, out, method="decode")

    return apply
