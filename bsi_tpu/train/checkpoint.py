"""Orbax checkpointing with the config-in-checkpoint contract.

The reference embeds the fully resolved config in every checkpoint
(bsi/lightning/callbacks.py:7-16) and all offline tooling reconstructs the
training setup from it (scripts/eval_fid.py:119-126). We keep that contract:
each checkpoint directory holds the orbax state tree plus ``config.json``
and the data-stream cursor, making checkpoints self-describing.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_checkpoint(
    path: str | Path,
    state: Any,
    *,
    config: Optional[dict] = None,
    data_state: Optional[dict] = None,
    extra: Optional[dict] = None,
) -> None:
    """Save a train state (+ config + data cursor + extra meta) to ``path``.

    ``extra`` carries small scalar bookkeeping (e.g. the best validation bpd
    so far, so a requeued run does not overwrite ``ckpt_best`` with a worse
    model — the reference gets this from Lightning's ModelCheckpoint state).
    """
    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path / "state", state, force=True)
    meta = {"config": config, "data_state": data_state, "extra": extra or {}}
    (path / "meta.json").write_text(json.dumps(meta, indent=2, default=str))


class AsyncCheckpointWriter:
    """Checkpoint writer that overlaps disk writes with training.

    The reference blocks training for the whole checkpoint write (Lightning's
    ``ModelCheckpoint`` saves synchronously inside the loop). TPU-native
    posture: ``save`` blocks only for the device→host copy of the state
    (orbax ``AsyncCheckpointer``), the serialization + disk write runs in the
    background, and training resumes immediately — on a 10M-step CIFAR run
    with ``val_check_interval=100k`` (SURVEY §6) the multi-GB writes cost
    zero step time.

    Crash-consistency contract: ``meta.json`` (config + data cursor + best
    score) is written only AFTER the state commit it belongs to, so a crash
    mid-write leaves either the old complete checkpoint or a new state with
    the old cursor — resume then replays a few batches, never skips any.
    Orbax's own tmp-dir+rename makes the state directory itself atomic.

    Orbax serializes async saves internally (a new ``save`` waits for the
    previous commit), which is what makes the deferred-meta bookkeeping
    below deterministic without any threads of our own.
    """

    def __init__(self):
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        # metas of saves whose state commit has not been observed yet
        self._pending: list[tuple[Path, dict]] = []

    def save(
        self,
        path: str | Path,
        state: Any,
        *,
        config: Optional[dict] = None,
        data_state: Optional[dict] = None,
        extra: Optional[dict] = None,
    ) -> None:
        path = Path(path).absolute()
        path.parent.mkdir(parents=True, exist_ok=True)
        # Blocks for (a) the PREVIOUS save's commit and (b) this state's
        # device→host copy; the disk write itself proceeds in the background.
        self._ckptr.save(path / "state", args=ocp.args.StandardSave(state), force=True)
        # (a) means every previously pending save has committed: flush metas.
        self._flush_pending()
        meta = {"config": config, "data_state": data_state, "extra": extra or {}}
        self._pending.append((path, meta))

    def _flush_pending(self) -> None:
        for path, meta in self._pending:
            (path / "meta.json").write_text(json.dumps(meta, indent=2, default=str))
        self._pending.clear()

    def wait(self) -> None:
        """Block until all issued saves are committed and their metas written."""
        self._ckptr.wait_until_finished()
        self._flush_pending()

    def close(self) -> None:
        self.wait()
        self._ckptr.close()


def load_checkpoint(path: str | Path, target: Any) -> tuple[Any, dict]:
    """Restore a train state saved by :func:`save_checkpoint`.

    ``target`` is a pytree of the same structure (e.g. a freshly created
    state) providing shapes/dtypes/shardings for restoration.

    Returns ``(state, meta)`` where ``meta`` has ``config`` and ``data_state``.
    """
    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        state = ckptr.restore(path / "state", abstract)
    meta_file = path / "meta.json"
    meta = json.loads(meta_file.read_text()) if meta_file.exists() else {}
    return state, meta


def load_checkpoint_config(path: str | Path) -> dict:
    """Read only the embedded config (the scripts' entry point for
    reconstructing a training setup from a checkpoint)."""
    meta = json.loads((Path(path).absolute() / "meta.json").read_text())
    config = meta.get("config")
    if config is None:
        raise ValueError(f"Checkpoint at {path} does not embed a config")
    return config
