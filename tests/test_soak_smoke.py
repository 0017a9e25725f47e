"""Smoke-mode run of the kill/resume soak harness (scripts/soak_test.py).

Pins the harness itself — launch ``train.py``, SIGTERM mid-run, verify the
interrupt checkpoint + data cursor, requeue from it, assert continuation /
best-bpd monotonicity / rate stability — on the virtual CPU mesh, so the
production soak (the on-chip run recorded in PERF_NOTES.md) can't rot
between rounds. Reference semantics being protected: submitit's
USR1-before-timeout requeue + Lightning's interrupt checkpoint
(SURVEY.md §5.3/§5.4).
"""

import json
import subprocess
import sys
from pathlib import Path

SCRIPT = Path(__file__).parent.parent / "scripts" / "soak_test.py"


def test_soak_smoke_kill_resume_cycle(tmp_path):
    out = tmp_path / "soak.json"
    proc = subprocess.run(
        [
            sys.executable,
            str(SCRIPT),
            "--max-steps", "40",
            "--kill-at", "20",
            "--small",
            "--batch", "16",
            "--n-train", "256",
            "--root", str(tmp_path / "root"),
            "--out", str(out),
        ],
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-4000:]

    timeline = json.loads(out.read_text())
    events = {e["event"]: e for e in timeline["events"]}
    # every stage of the kill/resume cycle ran and its assertions held
    for name in (
        "launched",
        "sigterm_sent",
        "run1_exited",
        "interrupt_ckpt_verified",
        "requeued",
        "run2_exited",
        "continuation_verified",
        "best_monotonic",
        "rate_stable",
    ):
        assert name in events, (name, list(events))
    assert events["interrupt_ckpt_verified"]["step"] >= 20
    assert events["continuation_verified"]["final_step"] == 40
    # cursor restored: exactly max_steps * batch examples consumed in total
    assert events["continuation_verified"]["cursor_examples"] == 40 * 16
