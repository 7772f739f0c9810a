#!/usr/bin/env python
"""Round-5 remainder queue (replaces round5_runner.py after the lr cells).

Rationale (recorded in the journal): lr21 landed composite 0.9412 with a
val-curve plateau from epoch 11 (0.9408/0.9412/0.9411) — the residual gap
to the round-3 batch-4 0.947 tracks the halved optimizer-step count at
equal epochs, not the lr, so the 2x-lr cell's expected information does
not justify 5400s while the compile cache is cold (environment reset):
bench.py MUST be warmed for the driver's end-of-round benchmark, and the
endpoint sigma cell / median e2e estimator / s2d cell each close a
separate VERDICT item.  The lr=3e-4 cell was killed ~14 min in and is
journaled as cut_for_budget.

Order: cheap-first, must-haves before stretch: hard_eval -> bench ->
sigma3 -> e2e(8) -> s2d -> focal/multihost (budget-gated).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = "/root/data"
JOURNAL = os.path.join(DATA, "R5_QUEUE.json")
DEADLINE = float(os.environ.get("R5_DEADLINE", 0))

with open(JOURNAL) as f:
    journal = json.load(f)
journal["remainder"] = {
    "steps": [],
    "lr30": "cut_for_budget: killed 14min in; lr21 plateau from ep11 "
            "implies step-count not lr is the residual lever; chip-hours "
            "reallocated to bench warm + endpoint cell + e2e median + s2d",
}
steps = journal["remainder"]["steps"]


def left():
    return DEADLINE - time.time()


def save():
    with open(JOURNAL, "w") as f:
        json.dump(journal, f, indent=1)


def run(name, need_s, cmd, timeout=None):
    rec = {"name": name, "need_s": need_s, "left_s": round(left())}
    if left() < need_s:
        rec["status"] = "skipped_budget"
        steps.append(rec)
        save()
        print(f"=== SKIP (budget) {name}", flush=True)
        return None
    print(f"=== START {name} ({left():.0f}s left)", flush=True)
    t0 = time.time()
    try:
        p = subprocess.run(cmd, cwd=REPO, timeout=timeout or need_s * 2.5)
        rec["status"] = "ok" if p.returncode == 0 else f"rc={p.returncode}"
    except subprocess.TimeoutExpired:
        rec["status"] = "timeout"
    rec["wall_s"] = round(time.time() - t0, 1)
    steps.append(rec)
    save()
    print(f"=== DONE {name} {rec['status']} {rec['wall_s']}s", flush=True)
    return rec["status"]


def main():
    assert DEADLINE > time.time(), "set R5_DEADLINE"
    py = sys.executable
    best_ckpt = f"{DATA}/soak_lr21/ckpt/best"

    run("hard_eval", 900,
        [py, "tools/soak_run.py", "--stages", "validate",
         "--data-root", f"{DATA}/synth256_hard", "--ckpt", best_ckpt,
         "--log-dir", f"{DATA}/hard_eval",
         "--out", f"{DATA}/HARD_EVAL.json"], timeout=2700)

    run("bench_headline", 1800, [py, "bench.py"], timeout=3600)

    run("endp_sigma3_6ep", 2200,
        [py, "tools/soak_run.py", "--stages", "train", "--epochs", "6",
         "--data-root", f"{DATA}/synth1024_s3",
         "--set", "optimizer.lr=0.00021", "--set", "scheduler.T_max=1216",
         "--set", "total_iter=1216",
         "--log-dir", f"{DATA}/soak_endp_sig3",
         "--out", f"{DATA}/ENDP_CELL_sig3.json"], timeout=4200)

    run("e2e_median8", 3400,
        [py, "tools/stream_bench.py", "--ckpt", best_ckpt,
         "--runs", "8"], timeout=5400)

    run("s2d_cell", 2200,
        [py, "tools/train_mfu_sweep.py", "--batches", "8",
         "--policies", "none", "--also-none-at", "0",
         "--sets", "s2d_stem=True",
         "--out", os.path.join(REPO, "TRAIN_BENCH_S2D.json")],
        timeout=3600)

    run("endp_focal_6ep", 2400,
        [py, "tools/soak_run.py", "--stages", "train", "--epochs", "6",
         "--data-root", f"{DATA}/synth1024",
         "--set", "optimizer.lr=0.00021", "--set", "scheduler.T_max=1216",
         "--set", "total_iter=1216", "--set", "heads.endp_pos_w=8.0",
         "--log-dir", f"{DATA}/soak_endp_focal",
         "--out", f"{DATA}/ENDP_CELL_focal.json"], timeout=4200)

    run("multihost_124", 2400, [py, "tools/multihost_test.py"],
        timeout=4200)

    journal["remainder"]["complete"] = True
    save()
    print("=== REMAINDER COMPLETE", flush=True)


if __name__ == "__main__":
    main()
