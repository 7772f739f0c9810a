#!/usr/bin/env python
"""Round-5 adaptive measurement queue (single chip, single host core).

Serial executor for the round-5 VERDICT items, with a wall-clock deadline:
each step declares its expected cost and is skipped (recorded as skipped)
when the remaining budget can't cover it.  Priority order:

  1. lr-sweep cell lr=2.1e-4, 16-epoch soak protocol (VERDICT r4 next-#1).
     If it recovers composite >= 0.947 the lr=3e-4 cell is SKIPPED (the
     "Done" criterion is met and the chip-hour goes to the next items);
     otherwise lr=3e-4 runs too.
  2. e2e stream bench, median-of-10 with link probes, on the winning ckpt
     (next-#5).
  3. hard-geometry eval of the benign-trained ckpt (next-#7).
  4. endpoint sigma=3 label cell, 6 epochs on the shared cosine prefix
     (next-#2; cheapest lever first — same compiled program, new labels).
  5. bench.py (refreshes the r5 headline + warms the driver's compile cache).
  6. multihost 1/2/4-proc regimes, CPU-only (next-#6).
  7. s2d-stem train cell under the TRAIN_BENCH protocol (next-#3).
  8. endpoint focal-weight cell (stretch).

Writes a running journal to /root/data/R5_QUEUE.json after every step.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = "/root/data"
LOG = os.path.join(DATA, "r5.log")
JOURNAL = os.path.join(DATA, "R5_QUEUE.json")
DEADLINE = float(os.environ.get("R5_DEADLINE", 0))  # unix ts; required

journal = {"steps": [], "deadline": DEADLINE}


def left():
    return DEADLINE - time.time()


def save():
    with open(JOURNAL, "w") as f:
        json.dump(journal, f, indent=1)


def run(name, need_s, cmd, timeout=None):
    """Run cmd if the remaining budget covers need_s; journal the result."""
    rec = {"name": name, "need_s": need_s, "left_s": round(left())}
    if left() < need_s:
        rec["status"] = "skipped_budget"
        journal["steps"].append(rec)
        save()
        print(f"=== SKIP (budget) {name}: need {need_s}s have {left():.0f}s",
              flush=True)
        return None
    print(f"=== START {name} ({left():.0f}s left): {' '.join(cmd)}",
          flush=True)
    t0 = time.time()
    p = subprocess.run(cmd, cwd=REPO, timeout=timeout or need_s * 2.5)
    rec.update(status="ok" if p.returncode == 0 else f"rc={p.returncode}",
               wall_s=round(time.time() - t0, 1))
    journal["steps"].append(rec)
    save()
    print(f"=== DONE {name} rc={p.returncode} {rec['wall_s']}s", flush=True)
    return p.returncode


def cell_best(path):
    try:
        with open(path) as f:
            return json.load(f)["train"]["best_composite"]
    except Exception:
        return -1.0


def main():
    assert DEADLINE > time.time(), "set R5_DEADLINE"
    py = sys.executable

    # 0. wait for the dataset generator, then render the sigma-3 variant
    while os.path.exists("/tmp/datagen.pid"):
        pid = open("/tmp/datagen.pid").read().strip()
        if subprocess.run(["kill", "-0", pid], capture_output=True
                          ).returncode != 0:
            break
        time.sleep(20)
    run("regen_sigma3", 600,
        [py, "tools/regen_endp_sigma.py", "--src", f"{DATA}/synth1024",
         "--dst", f"{DATA}/synth1024_s3", "--sigma", "3"])

    # 1. lr sweep cell(s), 16-epoch soak protocol
    run("lr21_16ep", 6600,
        [py, "tools/soak_run.py", "--stages", "train", "--epochs", "16",
         "--data-root", f"{DATA}/synth1024",
         "--set", "optimizer.lr=0.00021",
         "--log-dir", f"{DATA}/soak_lr21", "--out", f"{DATA}/LR_CELL_21.json"], timeout=10800)
    best_c, best_ckpt = (cell_best(f"{DATA}/LR_CELL_21.json"),
                         f"{DATA}/soak_lr21/ckpt/best")
    journal["lr21_composite"] = best_c
    if best_c < 0.947:
        run("lr30_16ep", 5400,
            [py, "tools/soak_run.py", "--stages", "train", "--epochs", "16",
             "--data-root", f"{DATA}/synth1024",
             "--set", "optimizer.lr=0.0003",
             "--log-dir", f"{DATA}/soak_lr30",
             "--out", f"{DATA}/LR_CELL_30.json"], timeout=9600)
        c30 = cell_best(f"{DATA}/LR_CELL_30.json")
        journal["lr30_composite"] = c30
        if c30 > best_c:
            best_c, best_ckpt = c30, f"{DATA}/soak_lr30/ckpt/best"
    else:
        journal["steps"].append({"name": "lr30_16ep",
                                 "status": "skipped_lr21_recovered"})
    journal["best_ckpt"] = best_ckpt
    journal["best_composite"] = best_c
    save()

    # 2. e2e median-of-N stream bench on the winning ckpt (N adapts to
    #    the remaining budget; VERDICT asks N>=10, 6 is the floor)
    if os.path.isdir(best_ckpt):
        n_runs = "10" if left() >= 4200 else "6"
        run("e2e_median%s" % n_runs, 2700 if n_runs == "6" else 4200,
            [py, "tools/stream_bench.py", "--ckpt", best_ckpt,
             "--runs", n_runs], timeout=6000)
        # 3. hard-geometry eval of the benign-trained ckpt
        run("hard_eval", 900,
            [py, "tools/soak_run.py", "--stages", "validate",
             "--data-root", f"{DATA}/synth256_hard", "--ckpt", best_ckpt,
             "--log-dir", f"{DATA}/hard_eval",
             "--out", f"{DATA}/HARD_EVAL.json"], timeout=2400)

    # 4. endpoint sigma=3 cell (6 epochs, shared cosine prefix: T_max pinned
    #    to the 16-epoch horizon so epoch-6 val compares against the lr21
    #    curve's epoch-6 point)
    run("endp_sigma3_6ep", 2400,
        [py, "tools/soak_run.py", "--stages", "train", "--epochs", "6",
         "--data-root", f"{DATA}/synth1024_s3",
         "--set", "optimizer.lr=0.00021", "--set", "scheduler.T_max=1216",
         "--set", "total_iter=1216",
         "--log-dir", f"{DATA}/soak_endp_sig3",
         "--out", f"{DATA}/ENDP_CELL_sig3.json"], timeout=4800)

    # 5. bench.py — r5 headline + warms the driver's compile cache
    run("bench_headline", 2100, [py, "bench.py"], timeout=3600)

    # 6. multihost 1/2/4-proc (CPU-only; chip idle, host must be idle)
    run("multihost_124", 3000, [py, "tools/multihost_test.py"],
        timeout=5400)

    # 7. s2d-stem train-step cell (TRAIN_BENCH protocol, shipped defaults)
    run("s2d_cell", 2400,
        [py, "tools/train_mfu_sweep.py", "--batches", "8",
         "--policies", "none", "--also-none-at", "0",
         "--sets", "s2d_stem=True",
         "--out", os.path.join(REPO, "TRAIN_BENCH_S2D.json")],
        timeout=3600)

    # 8. stretch: endpoint focal-weight cell
    run("endp_focal_6ep", 3000,
        [py, "tools/soak_run.py", "--stages", "train", "--epochs", "6",
         "--data-root", f"{DATA}/synth1024",
         "--set", "optimizer.lr=0.00021", "--set", "scheduler.T_max=1216",
         "--set", "total_iter=1216", "--set", "heads.endp_pos_w=8.0",
         "--log-dir", f"{DATA}/soak_endp_focal",
         "--out", f"{DATA}/ENDP_CELL_focal.json"], timeout=5400)

    journal["complete"] = True
    save()
    print("=== QUEUE COMPLETE", flush=True)


if __name__ == "__main__":
    main()
