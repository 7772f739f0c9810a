#!/usr/bin/env python
"""A/B the pipelined validate loop against the serial baseline (VERDICT r3
task #6: "measure the 128-tile validation wall before/after").

`Runner._validate_lanes` overlaps device dispatch with host postprocess via
a thread pool (`validate_workers`, default 4); `validate_workers=0` is the
round-3 serial dispatch->postprocess loop.  Both modes run the SAME jitted
program on the SAME checkpoint in one process (second run pays no compile),
so the wall delta isolates the overlap.  Metrics must agree exactly.

Reference analogue: the serial eval loop `engine/runner.py:223-353` in
/root/reference.

Usage:
  python tools/validate_ab.py --data-root /root/data/synth1024 \
      --ckpt /root/data/soak_logs_r4/ckpt/best
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FLAGSHIP = os.path.join(REPO, "configs", "Proj_polyline_fpn_vit_vertex_2.py")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=FLAGSHIP)
    ap.add_argument("--data-root", default="/root/data/synth1024")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max-batches", type=int, default=None)
    ap.add_argument("--repeats", type=int, default=2,
                    help="timed repeats per mode (walls fluctuate with the "
                         "tunnel; best-of is reported per mode)")
    ap.add_argument("--out", default=os.path.join(REPO, "VALIDATE_AB.json"))
    args = ap.parse_args()

    import jax
    from lanemapping_tpu.config.config import Config
    from lanemapping_tpu.engine.checkpoint import load_model
    from lanemapping_tpu.engine.runner import Runner

    cfg = Config.fromfile(args.config)
    cfg.batch_size = args.batch
    cfg.gt_cache = True
    for s in ("train", "val", "test"):
        cfg.dataset[s]["data_root"] = args.data_root

    runner = Runner(cfg, log_dir="/tmp/validate_ab_logs")
    runner.state = load_model(os.path.abspath(args.ckpt), runner.state)
    runner.best_metric = float("inf")

    record = {"ckpt": os.path.abspath(args.ckpt), "batch": args.batch,
              "backend": jax.default_backend(),
              "date": time.strftime("%Y-%m-%d"), "modes": {}}

    # warm-up: compile + first metrics (not timed against either mode)
    t0 = time.time()
    warm = runner.validate(max_batches=args.max_batches)
    record["warmup_wall_s"] = round(time.time() - t0, 1)

    for label, workers in (("serial_workers0", 0), ("pipelined_workers4", 4)):
        runner.cfg.validate_workers = workers
        walls, metrics = [], None
        for _ in range(args.repeats):
            t0 = time.time()
            m = runner.validate(max_batches=args.max_batches)
            walls.append(round(time.time() - t0, 1))
            metrics = {k: round(float(v), 4) for k, v in m.items()}
        record["modes"][label] = {"walls_s": walls,
                                  "best_wall_s": min(walls), **metrics}
        print(label, json.dumps(record["modes"][label]), flush=True)

    a = record["modes"]["serial_workers0"]["best_wall_s"]
    b = record["modes"]["pipelined_workers4"]["best_wall_s"]
    record["speedup_serial_over_pipelined"] = round(a / b, 2)
    record["metrics_equal"] = all(
        record["modes"]["serial_workers0"][k]
        == record["modes"]["pipelined_workers4"][k]
        for k in record["modes"]["serial_workers0"]
        if k not in ("walls_s", "best_wall_s"))
    assert warm is not None
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print("[validate_ab]", json.dumps({
        "speedup": record["speedup_serial_over_pipelined"],
        "metrics_equal": record["metrics_equal"]}))


if __name__ == "__main__":
    main()
