"""Shared plumbing for the offline eval/analysis scripts.

Every script reconstructs the exact training setup from the config embedded
in the checkpoint (the reference's ConfigInCheckpoint contract,
scripts/eval_fid.py:119-126) plus CLI-style overrides.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from bsi_tpu.config import instantiate, resolve_interpolations
from bsi_tpu.config.config import _set_path, _yaml_load  # shared engine internals
from bsi_tpu.tasks import build_task
from bsi_tpu.train import load_checkpoint_config
from bsi_tpu.utils.seed import resolve_seed


def load_trainer(ckpt_path: str, overrides: list[str] = (), *, run_dir="/tmp/bsi_tpu_eval"):
    """Rebuild (trainer, config, data) from a checkpoint + overrides and
    restore its state."""
    config = load_checkpoint_config(ckpt_path)
    for ov in overrides:
        key, _, raw = ov.partition("=")
        _set_path(config, key.lstrip("+"), _yaml_load(raw), allow_new=key.startswith("+"))
    config = resolve_interpolations(config)
    seed = resolve_seed(config)

    data = instantiate(config["data"], seed=seed)
    trainer = build_task(config, data, run_dir=run_dir, seed=seed)
    trainer.restore(ckpt_path)
    return trainer, config, data


def eval_dataloader(data, split: str):
    """Batches of the requested split ('test'/'val'/'train')."""
    splits = data.test_splits() if split == "test" else data.eval_splits()
    if split in splits:
        arr = splits[split]
    elif split == "train":
        arr = splits["train"]
    else:
        raise ValueError(f"Unknown split {split!r}; options: {sorted(splits)}")
    return data.eval_batches(arr)
