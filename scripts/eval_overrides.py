#!/usr/bin/env python
"""Re-run test evaluation on a checkpoint with config overrides.

Equivalent of the reference's scripts/eval_overrides.py (with its missing
imports fixed): rebuilds the training setup from the checkpoint's embedded
config, applies overrides, and runs the test loop.

Usage: eval_overrides.py -c <ckpt_dir> [overrides...]
"""

from __future__ import annotations

import argparse
import json

from _common import load_trainer


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--checkpoint", required=True)
    parser.add_argument("-o", "--out", default=None)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()

    trainer, config, data = load_trainer(args.checkpoint, args.overrides)
    metrics = trainer.test()
    print(json.dumps(metrics, indent=2))
    if args.out:
        from pathlib import Path

        Path(args.out).write_text(json.dumps(metrics))


if __name__ == "__main__":
    main()
