"""Metric logging: JSONL on disk, console summaries, optional W&B.

The reference logs exclusively to W&B (train.py:181-191). W&B is not
available in every environment, so the primary sink is a local JSONL file
(one record per log call) plus rank-zero console lines; a W&B run is
attached transparently when the package is importable and enabled.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path
from typing import Any, Mapping, Optional


class MetricLogger:
    def __init__(
        self,
        run_dir: str | Path,
        *,
        wandb_config: Optional[Mapping[str, Any]] = None,
        console: bool = True,
        is_main_process: bool = True,
    ):
        self.run_dir = Path(run_dir)
        self.console = console
        self.is_main = is_main_process
        self._file = None
        self._wandb = None
        if self.is_main:
            self.run_dir.mkdir(parents=True, exist_ok=True)
            self._file = (self.run_dir / "metrics.jsonl").open("a")
            if wandb_config is not None and wandb_config.get("mode") != "disabled":
                try:
                    import wandb

                    self._wandb = wandb.init(
                        dir=str(self.run_dir), **{k: v for k, v in wandb_config.items()}
                    )
                except Exception as e:  # wandb missing or offline failure
                    print(f"[logger] wandb unavailable ({e}); using JSONL only", file=sys.stderr)

    def log(self, step: int, metrics: Mapping[str, Any]) -> None:
        if not self.is_main:
            return
        record = {"step": int(step), "time": time.time()}
        record.update({k: _to_py(v) for k, v in metrics.items()})
        self._file.write(json.dumps(record) + "\n")
        self._file.flush()
        if self._wandb is not None:
            self._wandb.log(dict(metrics), step=step)

    def log_hyperparams(self, config: Mapping[str, Any]) -> None:
        if not self.is_main:
            return
        (self.run_dir / "config.json").write_text(json.dumps(config, indent=2, default=str))
        if self._wandb is not None:
            self._wandb.config.update(dict(config), allow_val_change=True)

    def console_line(self, text: str) -> None:
        if self.is_main and self.console:
            print(text, flush=True)

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
        if self._wandb is not None:
            self._wandb.finish()


def _to_py(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return v


def count_params(params) -> int:
    import jax
    import numpy as np

    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
