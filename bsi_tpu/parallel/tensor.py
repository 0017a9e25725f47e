"""Tensor-parallel (Megatron-style) parameter sharding over the ``model`` axis.

Beyond reference capability (the torch reference is data-parallel only,
SURVEY.md §2.8): weight matrices are sharded over the mesh's ``model`` axis
in column/row pairs so each pair costs ONE all-reduce of the pair's output —
XLA GSPMD inserts the collectives from the parameter shardings alone, no
model-code changes:

- attention: ``to_qkv`` column-parallel (heads split across chips),
  ``to_out`` row-parallel. The Pallas attention kernels' sharding rules
  (bsi_tpu/ops/flash_attention.py) leave the head factor free, so the fused
  kernels run on their local heads.
- MLP stacks: alternating column/row by layer index (``Dense_0`` column,
  ``Dense_1`` row, ...).
- adaLN conditioning: ``ada_in`` column-parallel, ``ada_out`` row-parallel.
- Everything else (norms, biases, embeddings, conv bodies) stays replicated.

Rules are name-based over the flax param tree and apply uniformly to params,
EMA params, and optimizer moments (their pytrees mirror the param names).
Composes with FSDP: leaves get their TP dim on ``model`` and, when ``fsdp``
is set, their largest remaining divisible dim on ``data`` (ZeRO-3).
"""

from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

# column-parallel: shard the OUTPUT dim (last); row-parallel: shard the
# INPUT dim (second-to-last — also correct for NHWC conv kernels [kh,kw,in,out])
_COL_RULES = (
    r"(^|/)to_qkv/kernel$",
    r"(^|/)ada_in/kernel$",
    r"(^|/)Dense_(\d*[02468])/kernel$",
)
_ROW_RULES = (
    r"(^|/)to_out/kernel$",
    r"(^|/)ada_out/kernel$",
    r"(^|/)Dense_(\d*[13579])/kernel$",
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
    tp = mesh.shape[MODEL_AXIS]
    data_size = mesh.shape[DATA_AXIS]

    def to_sharding(path, leaf):
        shape = getattr(leaf, "shape", ())
        spec = tp_leaf_spec(_path_str(path), shape, tp)
        if fsdp and shape and int(np.prod(shape)) >= min_size:
            for i in sorted(range(len(shape)), key=lambda i: -shape[i]):
                if spec[i] is None and shape[i] % data_size == 0:
                    spec[i] = DATA_AXIS
                    break
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(to_sharding, state)
