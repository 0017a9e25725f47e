"""Sequence parallelism (Megatron-SP) over the mesh's ``model`` axis.

Beyond-reference capability (the torch reference is data-parallel only,
SURVEY.md §2.8/§5.7). Tensor parallelism (bsi_tpu/parallel/tensor.py) shards
the matmuls of each Megatron column/row pair but leaves everything BETWEEN
the pairs — LayerNorms, modulate, dropout, residual adds, and their [B, S, D]
activations — replicated on every model rank. Sequence parallelism shards
that residual stream over the SEQUENCE dim on the same ``model`` axis
(Korthikanti et al., arXiv:2205.05198), so per rank:

- the fused LayerNorm+modulate kernels, dropout, gates, and residual adds
  each touch only ``S / tp`` tokens (elementwise time and activation memory
  shard tp-ways);
- the column-parallel matmul's input is all-gathered over seq right before
  the matmul, and the row-parallel matmul's partial sums leave as a
  reduce-scatter instead of an all-reduce — same total bytes on the wire as
  plain TP (an all-reduce IS a reduce-scatter + all-gather), so the extra
  parallelism is communication-neutral.

TPU-native mechanics: no explicit collectives — the DiT applies
``with_sharding_constraint`` at the stream's boundary points
(bsi_tpu/models/dit.py, the ``token_sharding`` field) and XLA GSPMD derives
the all-gather/reduce-scatter pairs. The fused LayerNorm+modulate kernel
partitions over seq-sharded tokens natively, psum-ing its conditioning
gradients over the seq axes (bsi_tpu/ops/ln_modulate.py).

Enable with ``trainer.sequence_parallel=true`` (requires
``trainer.model_parallelism > 1`` and a model that carries a
``token_sharding`` field, i.e. the DiT family).
"""

from __future__ import annotations

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def token_stream_sharding(mesh: Mesh) -> NamedSharding:
    """The [B, S, D] token-stream sharding for sequence parallelism: batch on
    ``data``, sequence on ``model``, features replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None))


def apply_sequence_parallelism(model, mesh: Mesh):
    """Return ``model`` cloned with the sequence-parallel token sharding, or
    raise if the mesh/model cannot support it."""
    if mesh.shape.get(MODEL_AXIS, 1) <= 1:
        raise ValueError(
            "sequence_parallel=true requires model_parallelism > 1 (the "
            "sequence shards over the mesh's model axis)"
        )
    if "token_sharding" not in type(model).__dataclass_fields__:
        raise ValueError(
            f"sequence_parallel=true needs a token-stream model with a "
            f"token_sharding field (the DiT family); got {type(model).__name__}"
        )
    return model.clone(token_sharding=token_stream_sharding(mesh))
