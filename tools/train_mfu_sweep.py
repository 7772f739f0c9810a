#!/usr/bin/env python
"""Train-step MFU campaign (VERDICT r3 weak #1 / task #2).

Sweeps batch size x remat policy through `bench.py --train` on the attached
chip and writes the full table to TRAIN_BENCH.json (v2): s/step, train MFU
vs v5e bf16 peak, tiles/s.  Each cell is a fresh jitted program (~10-20 min
remote compile through the axon tunnel), so the grid is kept small and any
cell that fails (e.g. HBM OOM at large batch without remat) is recorded
rather than fatal.

Reference trains batch 6 (`configs/Proj_polyline_fpn_vit_vertex_2.py:123`
in /root/reference); round-3 measured only batch 4 x full-remat (0.207
s/step, 29.7% MFU).
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cell(batch: int, remat: str, iters: int, sets: str = "") -> dict:
    env = dict(os.environ, BENCH_TRAIN_BATCH=str(batch),
               BENCH_TRAIN_ITERS=str(iters))
    if remat == "none":
        env["BENCH_REMAT"] = "0"
    else:
        env["BENCH_REMAT"] = "1"
        env["BENCH_REMAT_POLICY"] = remat
    if sets:
        env["BENCH_SET"] = sets
    t0 = time.time()
    p = subprocess.run([sys.executable, os.path.join(REPO, "bench.py"),
                        "--train"], env=env, capture_output=True, text=True,
                       timeout=3600)
    cell = {"batch": batch, "remat_policy": remat,
            "wall_s": round(time.time() - t0, 1)}
    if sets:
        cell["set"] = sets
    rec = None
    for line in p.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                pass
    if p.returncode != 0 or rec is None:
        cell["error"] = (p.stderr or p.stdout)[-1500:]
        return cell
    cell.update({
        "sec_per_step": rec["value"],
        "train_mfu": rec.get("train_mfu_vs_v5e_bf16_peak"),
        "tiles_per_sec_train": rec.get("tiles_per_sec_train"),
        "step_flops": rec.get("step_flops"),
        "hbm_highwater_gb": rec.get("hbm_highwater_gb"),
    })
    return cell


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[4, 8, 16])
    ap.add_argument("--policies", nargs="+", default=["full", "dots"])
    ap.add_argument("--also-none-at", type=int, default=4,
                    help="additionally run remat=none at this batch "
                         "(0 to skip)")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--sets", default="",
                    help="semicolon-separated cfg overrides applied to every "
                         "cell via BENCH_SET (e.g. 's2d_stem=True')")
    ap.add_argument("--out", default=os.path.join(REPO, "TRAIN_BENCH.json"))
    args = ap.parse_args()

    record = {"metric": "train_sec_per_step_sweep",
              "img": 1152, "dtype": "bfloat16",
              "date": time.strftime("%Y-%m-%d"), "cells": []}
    if os.path.isfile(args.out):
        with open(args.out) as f:
            prev = json.load(f)
        # stash the single-cell round-3 record once; a re-run of the sweep
        # must not nest its own output (sweep format has "cells") under a
        # key that claims to be the round-3 baseline
        if "cells" in prev:
            if "round3_baseline" in prev:
                record["round3_baseline"] = prev["round3_baseline"]
        else:
            record["round3_baseline"] = prev

    cells = [(b, pol) for b in args.batches for pol in args.policies]
    if args.also_none_at:
        cells.append((args.also_none_at, "none"))
    for b, pol in cells:
        print(f"[mfu_sweep] batch={b} remat={pol} ...", flush=True)
        cell = run_cell(b, pol, args.iters, args.sets)
        record["cells"].append(cell)
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)
        print(json.dumps(cell), flush=True)

    ok = [c for c in record["cells"] if "sec_per_step" in c]
    if ok:
        best = max(ok, key=lambda c: c.get("train_mfu") or 0.0)
        fastest = max(ok, key=lambda c: c.get("tiles_per_sec_train") or 0.0)
        record["best_mfu"] = best
        record["best_tiles_per_sec"] = fastest
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)
        print("[mfu_sweep] best MFU:", json.dumps(best))


if __name__ == "__main__":
    main()
