"""Fail-fast stall detection for wedged device RPCs.

Failure mode observed in production (2026-08-21 soak, PERF_NOTES.md): a
remote-device transport stall wedged the host thread inside a device fetch
indefinitely — the step loop made no progress for 25+ minutes, SIGTERM could
not help (the preemption flag is polled *between* steps, and the wedged RPC
never returned), and only SIGKILL freed the job. A hung process holds its
SLURM allocation until walltime; the correct production behavior is to
fail fast with a distinctive exit code so the scheduler requeues from the
last checkpoint (the same recovery path as a preemption,
``from_ckpt=<run>/ckpt_last``).

``StallWatchdog`` is a daemon thread watching a heartbeat the training loop
touches at every host-synchronization point. If no beat arrives within
``timeout_s``, it reports the stall on stderr and calls ``on_stall`` —
by default ``os._exit(STALL_EXIT_CODE)``, which terminates even when the
main thread is unkillably blocked in a foreign RPC (a clean ``sys.exit``
would only raise in the watchdog thread).

Extends the reference's failure handling (SURVEY.md §5.2/§5.3: NaN guards +
SLURM requeue, /root/reference/train.py:40-47) with detection the torch
stack leaves to NCCL_TIMEOUT; on TPU there is no collective timeout to lean
on, so the framework provides its own.
"""

from __future__ import annotations

import os
import sys
import threading
import time
from typing import Callable, Optional

# 70 = BSD EX_SOFTWARE ("internal software error") — distinctive enough for
# schedulers/wrappers to recognise a stall kill vs an ordinary crash
STALL_EXIT_CODE = 70


class StallWatchdog:
    """Daemon-thread heartbeat monitor; fail fast when the loop stops.

    Usage::

        with StallWatchdog(timeout_s=1800) as dog:
            for step in ...:
                ...train step, host fetch...
                dog.beat()

    ``beat()`` marks forward progress. If ``timeout_s`` elapses with no
    beat, ``on_stall()`` runs once from the watchdog thread (default:
    diagnostic to stderr + ``os._exit(STALL_EXIT_CODE)``). ``timeout_s``
    must exceed the longest *legitimate* gap between beats (a validation
    pass, a synchronous checkpoint write).
    """

    def __init__(
        self,
        timeout_s: float,
        on_stall: Optional[Callable[[], None]] = None,
        poll_s: Optional[float] = None,
    ):
        if timeout_s <= 0:
            raise ValueError(f"timeout_s must be positive, got {timeout_s}")
        self.timeout_s = float(timeout_s)
        self._on_stall = on_stall
        self._poll_s = poll_s if poll_s is not None else min(timeout_s / 4, 15.0)
        self._last = time.monotonic()  # float store/load is atomic under the GIL
        self._stop = threading.Event()
        self._fired = False
        self._thread: Optional[threading.Thread] = None

    # ------------------------------------------------------------- lifecycle
    def start(self) -> "StallWatchdog":
        if self._thread is not None:
            raise RuntimeError("watchdog already started")
        self._last = time.monotonic()
        self._thread = threading.Thread(
            target=self._run, name="stall-watchdog", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=self._poll_s + 1.0)
            self._thread = None

    def __enter__(self) -> "StallWatchdog":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # ------------------------------------------------------------- interface
    def beat(self) -> None:
        """Mark forward progress (call after every host-sync point)."""
        self._last = time.monotonic()

    @property
    def fired(self) -> bool:
        return self._fired

    # -------------------------------------------------------------- internal
    def _run(self) -> None:
        while not self._stop.wait(self._poll_s):
            idle = time.monotonic() - self._last
            if idle > self.timeout_s:
                self._fired = True
                print(
                    f"[watchdog] no training progress for {idle:.0f}s "
                    f"(timeout {self.timeout_s:.0f}s) — the host thread is "
                    f"likely wedged in a device RPC; exiting so the "
                    f"scheduler can requeue from the last checkpoint",
                    file=sys.stderr,
                    flush=True,
                )
                if self._on_stall is not None:
                    self._on_stall()
                else:
                    os._exit(STALL_EXIT_CODE)
                return
