"""Tensor-parallel (Megatron-style) parameter sharding over the ``model`` axis.

Beyond reference capability (the torch reference is data-parallel only,
SURVEY.md §2.8): weight matrices are sharded over the mesh's ``model`` axis
in column/row pairs so each pair costs ONE all-reduce of the pair's output —
XLA GSPMD inserts the collectives from the parameter shardings alone, no
model-code changes:

- attention: the full Megatron pair — ``to_qkv`` column-parallel,
  ``to_out`` row-parallel (partial products + ONE all-reduce per block).
  ``to_qkv``'s output axis is packed in the GROUPED layout ``(g qkv x)``
  (see :func:`bsi_tpu.nn.attention.repack_qkv_grouped`; the torch
  reference's ``(qkv h c)`` layout is repacked by the weight-transfer
  converters), so a plain column sharding is group-aligned (whole heads
  with their q|k|v per rank) and GSPMD keeps the per-head slices local —
  no activation reshard at the split, and the zero-copy fused kernels'
  sharding rules shard the same ``g`` factor. Alignment holds when the
  model-axis size divides the group count ``heads / heads_per_group``
  (true for all DiT recipes: 8 head pairs vs model axes of 2-8); otherwise
  GSPMD still computes the same result with an extra reshard.
- MLP pairs inside transformer blocks (path ``*/mlp/Dense_{even,odd}``):
  alternating column/row — one all-reduce per MLP. Scoped to ``mlp/`` so a
  lone unpaired Dense elsewhere in the tree is never column-sharded into a
  silent per-step activity reshard.
- adaLN conditioning: ``ada_in`` column-parallel, ``ada_out`` row-parallel
  (``ada_out``'s packed 6-way split happens on its REPLICATED output, after
  the pair's all-reduce, so no boundary issue).
- Everything else (norms, biases, embeddings, conv bodies) stays replicated.

Rules are name-based over the flax param tree and apply uniformly to params,
EMA params, and optimizer moments (their pytrees mirror the param names).
Composes with FSDP: leaves get their TP dim on ``model`` and, when ``fsdp``
is set, their largest remaining divisible dim on ``data`` (ZeRO-3).
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

# column-parallel: shard the OUTPUT dim (last); row-parallel: shard the
# INPUT dim (second-to-last — also correct for NHWC conv kernels [kh,kw,in,out])
_COL_RULES = (
    r"(^|/)ada_in/kernel$",
    r"(^|/)to_qkv/kernel$",
    r"(^|/)mlp/Dense_(\d*[02468])/kernel$",
)
_ROW_RULES = (
    r"(^|/)to_out/kernel$",
    r"(^|/)ada_out/kernel$",
    r"(^|/)mlp/Dense_(\d*[13579])/kernel$",
)
_COL = tuple(re.compile(p) for p in _COL_RULES)
_ROW = tuple(re.compile(p) for p in _ROW_RULES)


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)


def tp_leaf_spec(path_str: str, shape, tp: int) -> list:
    """The per-leaf TP assignment: [axis-name-or-None] * rank."""
    spec = [None] * len(shape)
    if len(shape) < 2 or tp <= 1:
        return spec
    if any(r.search(path_str) for r in _COL) and shape[-1] % tp == 0:
        spec[-1] = MODEL_AXIS
    elif any(r.search(path_str) for r in _ROW) and shape[-2] % tp == 0:
        spec[-2] = MODEL_AXIS
    return spec


def tp_state_sharding(
    state, mesh: Mesh, *, fsdp: bool = False, min_size: int = 2**14
):
    """Per-leaf NamedShardings for a TrainState: TP over ``model`` (and
    optionally ZeRO-3 over ``data`` on a second dim)."""
    from .fsdp import assign_zero3_dim

    tp = mesh.shape[MODEL_AXIS]
    data_size = mesh.shape[DATA_AXIS]

    def to_sharding(path, leaf):
        shape = getattr(leaf, "shape", ())
        spec = tp_leaf_spec(_path_str(path), shape, tp)
        if fsdp:
            spec = assign_zero3_dim(spec, shape, data_size, min_size)
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(to_sharding, state)
