#!/usr/bin/env python
"""Production-scale soak: long CIFAR-recipe run with a mid-run SIGTERM.

Drives the REAL entry path (train.py subprocess) on synthetic CIFAR-shaped
data through a preemption/requeue cycle — the semantics SURVEY.md §5.3/§5.4
protect (reference: submitit's USR1-before-timeout + Lightning requeue):

1. launch `train.py` (CIFAR recipe shapes: UNet dim128x32, batch 128) for
   `--max-steps`;
2. poll the run's metrics.jsonl; at `--kill-at` steps deliver SIGTERM to the
   child (by pid — never by pattern) like a TPU maintenance event;
3. assert the child exits 0 after writing `ckpt_interrupt` at the kill step
   with the data cursor exactly `step * batch` examples in;
4. requeue: relaunch with `from_ckpt=<run>/ckpt_interrupt`;
5. assert the resumed run CONTINUES (first logged step follows the interrupt
   step; cursor ends at exactly `max_steps * batch` — an unrestored cursor
   would end `kill_at * batch` short), `best/bpd` is monotone non-increasing
   across both runs, and steps/sec is stable between the pre-kill and
   post-resume halves.

Writes a machine-readable timeline to `--out` (JSON) for PERF_NOTES.md.

Smoke mode (CI): `--max-steps 40 --kill-at 20 --small` shrinks the model so
the whole cycle runs on the CPU mesh in ~a minute; the production soak is
`python scripts/soak_test.py --max-steps 50000 --kill-at 25000` on the chip.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from _common import REPO_ROOT  # noqa: E402


def _overrides(args, root: Path) -> list[str]:
    ov = [
        "task=bsi",
        "task.model=unet",
        "task.optimizer.lr=2e-4",
        "task.optimizer.weight_decay=1e-2",
        "data=synthetic",
        f"data.n_train={args.n_train}",
        "data.n_val=512",
        "data.data_shape=[32, 32, 3]",
        f"data.batch_size={args.batch}",
        "data.eval_batch_size=256",
        f"trainer.max_steps={args.max_steps}",
        f"trainer.val_check_interval={max(args.max_steps // 4, 10)}",
        "trainer.limit_eval_batches=2",
        "trainer.log_every_n_steps=10",
        "trainer.plots=no",
        "seed=7",
        f"run_root={root}",
        "title=soak",
        "name=soak",
    ]
    if args.small:
        ov += ["task.model.dim=32", "task.model.levels=2"]
    else:
        # the CIFAR recipe model (configs/experiment/cifar10-vdm.yaml)
        ov += [
            "task.model.dim=128",
            "task.model.levels=32",
            "task.model.dropout=0.1",
            "task.model.pos_emb_mult=4",
        ]
    return ov


def _launch(overrides: list[str], log: Path) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, str(REPO_ROOT / "train.py"), *overrides],
        stdout=log.open("w"),
        stderr=subprocess.STDOUT,
        cwd=REPO_ROOT,
    )


def _metrics_path(root: Path) -> Path | None:
    hits = sorted(root.rglob("metrics.jsonl"))
    return hits[-1] if hits else None


def _read_metrics(path: Path) -> list[dict]:
    out = []
    for line in path.read_text().splitlines():
        try:
            out.append(json.loads(line))
        except json.JSONDecodeError:
            pass  # partially written tail line
    return out


def _latest_step(root: Path) -> int:
    path = _metrics_path(root)
    if path is None:
        return 0
    recs = _read_metrics(path)
    return max((r.get("step", 0) for r in recs), default=0)


def _steps_per_sec(recs: list[dict]) -> list[tuple[int, float]]:
    """(step, steps/sec) between consecutive train-loss log records."""
    pts = [(r["step"], r["time"]) for r in recs if "train/loss" in r]
    return [
        (s2, (s2 - s1) / (t2 - t1))
        for (s1, t1), (s2, t2) in zip(pts, pts[1:])
        if t2 > t1 and s2 > s1
    ]


def _cursor_examples(meta: dict, n_train: int) -> int:
    # data modules nest the sampler cursor; find the (epoch, pos) dict
    def find(d):
        if isinstance(d, dict):
            if set(d) >= {"epoch", "pos"}:
                return d
            for v in d.values():
                got = find(v)
                if got is not None:
                    return got
        return None

    c = find(meta["data_state"])
    assert c is not None, f"no cursor in {meta['data_state']}"
    return int(c["epoch"]) * n_train + int(c["pos"])


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--max-steps", type=int, default=50000)
    p.add_argument("--kill-at", type=int, default=25000)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--n-train", type=int, default=50000)
    p.add_argument("--small", action="store_true", help="tiny model for CI smoke")
    p.add_argument("--root", default="/tmp/bsi_tpu_soak")
    p.add_argument("--out", default=None, help="timeline JSON (default <root>/soak.json)")
    args = p.parse_args()

    root = Path(args.root)
    if root.exists():
        import shutil

        shutil.rmtree(root)
    root.mkdir(parents=True)
    timeline: dict = {"events": [], "config": vars(args)}

    def ev(name, **kw):
        rec = {"event": name, "t": round(time.time() - t0, 1), **kw}
        timeline["events"].append(rec)
        print(f"[soak +{rec['t']}s] {name} {kw}", flush=True)

    t0 = time.time()
    overrides = _overrides(args, root)
    proc = _launch(overrides, root / "run1.log")
    ev("launched", pid=proc.pid, max_steps=args.max_steps)

    # ---- poll until kill threshold, then SIGTERM (the maintenance event)
    while True:
        if proc.poll() is not None:
            raise SystemExit(
                f"run1 exited early rc={proc.returncode}:\n"
                + (root / "run1.log").read_text()[-3000:]
            )
        step = _latest_step(root)
        if step >= args.kill_at:
            proc.send_signal(signal.SIGTERM)
            ev("sigterm_sent", at_step=step)
            break
        time.sleep(2)
    rc = proc.wait(timeout=900)
    assert rc == 0, f"run1 rc={rc}:\n" + (root / "run1.log").read_text()[-3000:]
    ev("run1_exited", rc=rc)

    run_dirs = sorted(d.parent for d in root.rglob("ckpt_interrupt"))
    assert len(run_dirs) == 1, run_dirs
    run1 = run_dirs[0]
    meta1 = json.loads((run1 / "ckpt_interrupt" / "meta.json").read_text())
    cursor1 = _cursor_examples(meta1, args.n_train)
    # the cursor advances exactly batch examples per optimizer step, so it
    # must land on a step boundary at (or just past) the kill threshold
    assert cursor1 % args.batch == 0, (cursor1, args.batch)
    int_step = cursor1 // args.batch
    assert int_step >= args.kill_at, (int_step, args.kill_at)
    recs1 = _read_metrics(run1 / "metrics.jsonl")
    rate1 = _steps_per_sec(recs1)
    ev("interrupt_ckpt_verified", step=int_step, cursor_examples=cursor1)

    # ---- requeue from the interrupt checkpoint
    proc2 = _launch(
        overrides + [f"from_ckpt={run1 / 'ckpt_interrupt'}"], root / "run2.log"
    )
    ev("requeued", pid=proc2.pid, from_step=int_step)
    rc2 = proc2.wait(timeout=72 * 3600)
    assert rc2 == 0, f"run2 rc={rc2}:\n" + (root / "run2.log").read_text()[-3000:]
    ev("run2_exited", rc=rc2)

    run2 = [d.parent for d in root.rglob("ckpt_last") if d.parent != run1]
    assert len(run2) == 1, run2
    run2 = run2[0]
    recs2 = _read_metrics(run2 / "metrics.jsonl")
    steps2 = [r["step"] for r in recs2 if "train/loss" in r]
    assert steps2 and steps2[0] > int_step, (steps2[:3], int_step)
    assert max(steps2) == args.max_steps, (max(steps2), args.max_steps)
    meta2 = json.loads((run2 / "ckpt_last" / "meta.json").read_text())
    cursor2 = _cursor_examples(meta2, args.n_train)
    assert cursor2 == args.max_steps * args.batch, (cursor2, args.max_steps)
    ev("continuation_verified", first_logged=steps2[0], final_step=max(steps2),
       cursor_examples=cursor2)

    # best-checkpoint monotonicity across the kill: run2's recorded best is
    # no worse than run1's (restored from meta, VERDICT r1 weak #6) and
    # equals the min val/bpd observed anywhere in the timeline
    best1 = float(meta1["extra"]["best_bpd"])
    best2 = float(meta2["extra"]["best_bpd"])
    vals = [r["val/bpd"] for r in recs1 + recs2 if "val/bpd" in r]
    assert best2 <= best1 + 1e-12, (best1, best2)
    if vals:
        assert abs(best2 - min(vals)) < 1e-9, (best2, min(vals))
    ev("best_monotonic", run1_best=best1, run2_best=best2, n_vals=len(vals))

    # steps/sec stability: medians of pre-kill vs post-resume (skip each
    # run's first windows = compile + warmup)
    rate2 = _steps_per_sec(recs2)
    import statistics

    med1 = statistics.median(r for _, r in rate1[2:]) if len(rate1) > 4 else None
    med2 = statistics.median(r for _, r in rate2[2:]) if len(rate2) > 4 else None
    timeline["steps_per_sec"] = {"run1_median": med1, "run2_median": med2}
    if med1 and med2:
        drift = abs(med2 - med1) / med1
        timeline["steps_per_sec"]["drift"] = round(drift, 4)
        assert drift < 0.15, f"steps/sec drifted {drift:.1%} across the kill"
    ev("rate_stable", run1=med1, run2=med2)

    out = Path(args.out or root / "soak.json")
    out.write_text(json.dumps(timeline, indent=2))
    print(f"SOAK OK -> {out}")


if __name__ == "__main__":
    main()
