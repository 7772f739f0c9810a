#!/usr/bin/env python
"""End-to-end streaming benchmark orchestrator (VERDICT r3 #7).

Round 3's E2E headline was a random-weights throughput proxy; the trained
checkpoint had only been streamed in slow tunnel phases.  This driver makes
the TRAINED-checkpoint rate the headline: it runs `stream_map --ckpt`
best-of-N across tunnel phases (the shared link fluctuates 2-3x between
runs), optionally a `--from-las` sensor-native leg with the same weights,
and writes E2E_BENCH.json with the full per-run history.

Usage:
  python tools/stream_bench.py --data-root /root/data/synth1024 \
      --ckpt /root/data/soak_logs_r4/ckpt/best --runs 3 --from-las
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLAGSHIP = os.path.join(REPO, "configs", "Proj_polyline_fpn_vit_vertex_2.py")


def run_stream(args, extra, out_dir, data_root=None):
    cmd = [sys.executable, os.path.join(REPO, "tools", "stream_map.py"),
           args.config, data_root or args.data_root, "--out", out_dir,
           "--bench-json", "--batch", str(args.batch)] + extra
    if args.ckpt:
        cmd += ["--ckpt", args.ckpt]
    p = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    bench = None
    for line in p.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and "tiles" in line:
            try:
                bench = json.loads(line)
            except json.JSONDecodeError:
                pass
    if bench is None:
        bench = {"error": (p.stderr or p.stdout)[-1200:], "rc": p.returncode}
    return bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=FLAGSHIP)
    ap.add_argument("--data-root", default="/root/data/synth1024")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--gap-s", type=int, default=60,
                    help="pause between runs so they sample different "
                         "tunnel phases")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--max-batches", type=int, default=16)
    ap.add_argument("--from-las", action="store_true")
    ap.add_argument("--las-root", default="/root/data/synth_lidar",
                    help="data root for the --from-las leg (needs las/ "
                         "tiles; the PNG legs use --data-root)")
    ap.add_argument("--out", default=os.path.join(REPO, "E2E_BENCH.json"))
    args = ap.parse_args()

    prev = None
    if os.path.isfile(args.out):
        with open(args.out) as f:
            prev = json.load(f)

    runs = []
    for i in range(args.runs):
        b = run_stream(args, ["--split", "infer_only", "--preload",
                              "--max-batches", str(args.max_batches)],
                       os.path.join("/tmp", f"stream_bench_{i}"))
        runs.append(b)
        print(json.dumps(b), flush=True)
        if i + 1 < args.runs:
            time.sleep(args.gap_s)

    ok = [r for r in runs if "value" in r]
    record = {
        "metric": "e2e_tiles_per_sec_per_chip",
        "estimator": "median",
        "weights": os.path.abspath(args.ckpt),
        "runs": runs,
        "date": time.strftime("%Y-%m-%d"),
        "provenance": "tools/stream_bench.py median-of-N stream_map --ckpt "
                      "runs (trained weights; real decoded lanes), flagship "
                      "config, bf16, axon tunnel; includes forward + XLA "
                      "decode + host tracker/NMS/semantics + lane-JSON "
                      "export; PNG decode excluded via --preload. Each run "
                      "carries an 8MB H2D/D2H link-phase probe + measured "
                      "readback/host-postprocess components (the shared "
                      "tunnel fluctuates 2-3x run-to-run; the median is the "
                      "headline, best/worst recorded as spread).",
    }
    if ok:
        # VERDICT r4 weak #3: best-of-N on a 3x-fluctuating link is the
        # wrong estimator — headline the MEDIAN, keep the spread visible
        vals = sorted(r["value"] for r in ok)
        med = vals[len(vals) // 2] if len(vals) % 2 else (
            0.5 * (vals[len(vals) // 2 - 1] + vals[len(vals) // 2]))
        med_run = min(ok, key=lambda r: abs(r["value"] - med))
        record["value"] = round(med, 2)
        record["unit"] = "tiles/s"
        record["km_lane_per_hour"] = med_run.get("km_lane_per_hour")
        record["runs_tiles_per_sec"] = [r["value"] for r in ok]
        record["best_of_n"] = vals[-1]
        record["worst_of_n"] = vals[0]
        record["n_runs_ok"] = len(ok)

    if args.from_las:
        b = run_stream(args, ["--from-las", "--split", "all",
                              "--batch", "4"], "/tmp/stream_bench_las",
                       data_root=args.las_root)
        record["from_las_run"] = b
        print(json.dumps(b), flush=True)

    if prev:
        if "r3_random_weights_proxy" in prev:
            # prev is already an r4-format record (trained weights): its
            # headline is NOT the random-init proxy — carry the original
            # proxy forward unchanged instead of relabeling trained numbers
            record["r3_random_weights_proxy"] = prev[
                "r3_random_weights_proxy"]
        else:
            record["r3_random_weights_proxy"] = {
                "tiles_per_sec": prev.get("value"),
                "km_lane_per_hour_throughput_proxy": prev.get(
                    "km_lane_per_hour"),
                "note": "round-3 random-init pipeline-throughput record "
                        "(headline until r4; kept for history)",
            }
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"[stream_bench] wrote {args.out}")


if __name__ == "__main__":
    main()
