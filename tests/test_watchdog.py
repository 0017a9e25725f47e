"""Stall watchdog (bsi_tpu/utils/watchdog.py).

Fail-fast detection for wedged device RPCs — the failure mode observed in
the round-5 production soak (a transport stall froze the host thread inside
a device fetch for 25+ minutes; SIGTERM could not run the preemption path
because the flag is polled between steps). The reference stack leaves this
to NCCL_TIMEOUT; on TPU the framework provides its own (SURVEY.md §5.2/§5.3).
"""

import threading
import time

import pytest

from bsi_tpu.utils.watchdog import STALL_EXIT_CODE, StallWatchdog


def test_fires_after_timeout_without_beats():
    fired = threading.Event()
    dog = StallWatchdog(timeout_s=0.3, on_stall=fired.set, poll_s=0.05)
    dog.start()
    try:
        assert fired.wait(timeout=3.0), "watchdog never fired"
        assert dog.fired
    finally:
        dog.stop()


def test_beats_defer_firing():
    fired = threading.Event()
    with StallWatchdog(timeout_s=0.4, on_stall=fired.set, poll_s=0.05) as dog:
        deadline = time.monotonic() + 1.2  # 3x the timeout, kept alive by beats
        while time.monotonic() < deadline:
            dog.beat()
            time.sleep(0.05)
        assert not fired.is_set()
        assert not dog.fired


def test_stop_prevents_firing():
    fired = threading.Event()
    dog = StallWatchdog(timeout_s=0.2, on_stall=fired.set, poll_s=0.05)
    dog.start()
    dog.stop()
    assert not fired.wait(timeout=0.8)


def test_fires_once_not_repeatedly():
    count = []
    dog = StallWatchdog(timeout_s=0.1, on_stall=lambda: count.append(1), poll_s=0.03)
    dog.start()
    try:
        time.sleep(0.8)
        assert count == [1], count
    finally:
        dog.stop()


def test_rejects_nonpositive_timeout():
    with pytest.raises(ValueError):
        StallWatchdog(timeout_s=0.0)


def test_exit_code_is_distinctive():
    # pinned: schedulers/wrappers key requeue-on-stall off this value
    assert STALL_EXIT_CODE == 70



def test_trainer_arms_after_first_fetch_and_stops_on_exit(tmp_path):
    """End-to-end through Trainer.fit: the watchdog arms at the first logged
    step, beats keep it quiet through training AND validation, and fit()'s
    finally tears it down (a leaked armed watchdog would os._exit a later
    process-idle period)."""
    from test_train import make_trainer

    trainer = make_trainer(tmp_path, stall_timeout_s=120.0, max_steps=6,
                           val_check_interval=3, log_every=2)
    metrics = trainer.fit()
    assert "val/bpd" in metrics
    # fit() must tear the armed watchdog down on exit
    assert trainer._watchdog is None
