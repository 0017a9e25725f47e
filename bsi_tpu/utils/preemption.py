"""Preemption handling for requeueable training jobs.

The reference wires a SLURM USR1-before-timeout pipeline through submitit and
Lightning: the signal triggers an interrupt checkpoint and the job requeues,
resuming from it with the same W&B run (SURVEY.md §5.3). The TPU-pod
analogue: maintenance events deliver SIGTERM. This handler converts
SIGTERM/SIGUSR1 into a flag the training loop polls between steps; the loop
saves an interrupt checkpoint and exits cleanly so the scheduler can requeue
with ``from_ckpt=<run_dir>/ckpt_interrupt``.
"""

from __future__ import annotations

import signal
import sys
from typing import Iterable


class PreemptionHandler:
    def __init__(self, signals: Iterable[int] = (signal.SIGTERM, signal.SIGUSR1)):
        self.triggered = False
        self._signals = tuple(signals)
        self._previous: dict[int, object] = {}

    def _handle(self, signum, frame):
        self.triggered = True
        print(f"[preemption] received signal {signum}; will checkpoint and exit", file=sys.stderr)

    def install(self) -> "PreemptionHandler":
        for sig in self._signals:
            self._previous[sig] = signal.signal(sig, self._handle)
        return self

    def uninstall(self) -> None:
        for sig, prev in self._previous.items():
            signal.signal(sig, prev)
        self._previous.clear()
