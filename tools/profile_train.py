#!/usr/bin/env python
"""Profile the full-size training step and attribute device time by op.

Runs the same jitted train step as `bench.py --train` (flagship 1152px,
bf16, shipping defaults) under `jax.profiler.trace`, then parses the
written trace.json.gz and aggregates device-track event durations by
fusion/op name.  Output: TRAIN_PROFILE.json with the top ops and their
share of a step — the measured form of the "structural ceiling"
attribution in ARCHITECTURE.md's MFU section.

The axon tunnel supports jax.profiler (verify SKILL round-2 facts);
scalar D2H still hangs, so completion is forced by array readback.
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_step(batch_size: int):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from lanemapping_tpu.config.config import Config
    from lanemapping_tpu.engine.optimizer import build_optimizer
    from lanemapping_tpu.engine.state import create_train_state, \
        make_train_step
    from lanemapping_tpu.models.head_losses import (column_proposal_loss,
                                                    head_hparams)
    from lanemapping_tpu.models.nets import build_model

    cfg = Config.fromfile(os.path.join(
        REPO, "configs", "Proj_polyline_fpn_vit_vertex_2.py"))
    cfg.batch_size = batch_size
    model = build_model(cfg)
    tx = build_optimizer(cfg)
    img = cfg.list_img_size_xy[0]
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, img, img, 3), jnp.float32))
    hp = head_hparams(cfg)
    step = jax.jit(make_train_step(
        model, tx, lambda out, b: column_proposal_loss(out, b, hp),
        compute_dtype=jnp.bfloat16), donate_argnums=(0,))

    B, S, P = batch_size, cfg.heads.row_size, cfg.heads.num_prop
    W = cfg.heads.prop_width + 2 * cfg.heads.prop_half_buff
    rng = np.random.RandomState(0)
    batch = {
        "proj": rng.rand(B, img, img, 3).astype(jnp.bfloat16),
        "prop_ext": rng.randint(0, 3, (B, P, S)).astype(np.uint8),
        "prop_coor": rng.uniform(-1, W, (B, P, S)).astype(np.float32),
        "prop_offset": rng.randn(B, P, S, W).astype(np.float32),
        "prop_offset_mask": rng.randint(0, 2, (B, P, S, W)).astype(
            np.float32),
        "lc_orient": rng.randint(0, 11, (B, S, S)).astype(np.uint8),
        "semantic_label_raw": rng.randint(0, 3, (B, img, img)).astype(
            np.uint8),
        "endp_map": np.where(rng.rand(B, img, img) > 0.999,
                             rng.rand(B, img, img), 0).astype(jnp.bfloat16),
        "prop_inst": np.where(rng.rand(B, img, img) < 0.01,
                              rng.randint(0, 12, (B, img, img)),
                              255).astype(np.uint8),
        "prop_best": rng.randint(0, 12, (B, P)).astype(np.uint8),
    }
    return step, state, jax.device_put(batch)


HBM_PEAK_GBS = 819.0  # TPU v5e HBM bandwidth (public spec)


def top_ops_from_trace(trace_dir: str, top_n: int = 20):
    """Aggregate the TPU 'XLA Ops' track by op name and by hlo_category.

    Each op event carries `hlo_category` and `bytes_accessed`, so besides
    the top-op table this computes, per category and per op, the achieved
    HBM bandwidth (bytes/dur) — ops near the 819 GB/s v5e peak are
    bandwidth-bound, which is the quantitative form of the "memory-bound
    tail" claim in ARCHITECTURE.md."""
    files = glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz"))
    if not files:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    by_name = defaultdict(lambda: [0.0, 0.0])   # name -> [us, bytes]
    by_cat = defaultdict(lambda: [0.0, 0.0])    # category -> [us, bytes]
    name_shape = {}
    total = 0.0
    for path in files:
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        events = data.get("traceEvents", [])
        tpu_pids = {e.get("pid") for e in events
                    if e.get("ph") == "M" and e.get("name") == "process_name"
                    and "/device:TPU" in str(e.get("args", {}).get("name"))}
        op_tids = {e.get("tid") for e in events
                   if e.get("ph") == "M" and e.get("name") == "thread_name"
                   and e.get("pid") in tpu_pids
                   and e.get("args", {}).get("name") == "XLA Ops"}
        for e in events:
            if e.get("ph") != "X" or "dur" not in e \
                    or e.get("pid") not in tpu_pids \
                    or e.get("tid") not in op_tids:
                continue
            dur = float(e["dur"])
            args = e.get("args", {})
            byt = float(args.get("bytes_accessed", 0) or 0)
            cat = args.get("hlo_category", "uncategorized")
            by_name[e["name"]][0] += dur
            by_name[e["name"]][1] += byt
            by_cat[cat][0] += dur
            by_cat[cat][1] += byt
            total += dur
            if e["name"] not in name_shape:
                long = str(args.get("long_name", ""))
                m = long.split(" = ", 1)
                name_shape[e["name"]] = (m[1][:100] if len(m) == 2 else "")
    def rows(d, top=None):
        items = sorted(d.items(), key=lambda kv: -kv[1][0])
        if top:
            items = items[:top]
        out = []
        for n, (us, byt) in items:
            row = {"name": n[:120], "total_us": round(us, 1),
                   "pct": round(100 * us / max(total, 1e-9), 2),
                   "gb_per_s": round(byt / max(us, 1e-9) / 1e3, 1),
                   "hbm_bw_util": round(
                       byt / max(us, 1e-9) / 1e3 / HBM_PEAK_GBS, 3)}
            if n in name_shape and name_shape[n]:
                row["result"] = name_shape[n]
            out.append(row)
        return out
    return rows(by_name, top_n), rows(by_cat), total


def main():
    import argparse
    import numpy as np
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--trace-dir", default="/tmp/train_profile")
    ap.add_argument("--out", default=os.path.join(REPO, "TRAIN_PROFILE.json"))
    ap.add_argument("--parse-only", action="store_true",
                    help="re-parse an existing trace dir without running")
    args = ap.parse_args()

    if args.parse_only:
        write_record(args)
        return

    step, state, batch = build_step(args.batch)
    rng = jax.random.PRNGKey(1)

    # warmup / compile outside the trace
    t0 = time.time()
    rng, sub = jax.random.split(rng)
    state, stats = step(state, batch, sub)
    # force completion via an ARRAY readback (scalar D2H hangs on axon)
    _ = np.asarray(state.params["heads"]["proposal_confidence"]["bias"])
    print(f"[profile] compile+first step {time.time()-t0:.1f}s", flush=True)

    jax.profiler.start_trace(args.trace_dir)
    for _ in range(args.steps):
        rng, sub = jax.random.split(rng)
        state, stats = step(state, batch, sub)
    # force completion with an array readback (axon: no block_until_ready)
    loss_arr = np.asarray(
        state.params["heads"]["proposal_confidence"]["bias"])
    jax.profiler.stop_trace()
    assert np.all(np.isfinite(loss_arr))
    write_record(args)


def write_record(args):
    ops, cats, total_us = top_ops_from_trace(args.trace_dir)
    record = {
        "metric": "train_step_device_time_by_op",
        "batch": args.batch,
        "steps_traced": args.steps,
        "device_total_us": round(total_us, 1),
        "per_step_ms": round(total_us / 1e3 / max(args.steps, 1), 2),
        "by_hlo_category": cats,
        "top_ops": ops,
        "provenance": "tools/profile_train.py, jax.profiler.trace over "
                      f"{args.steps} steps of the shipping train step "
                      "(flagship 1152px, batch 8, bf16, no remat), TPU "
                      "'XLA Ops' track only; gb_per_s = bytes_accessed/dur, "
                      "hbm_bw_util vs the 819 GB/s v5e peak. Axon tunnel, "
                      + time.strftime("%Y-%m-%d"),
    }
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"[profile] device {record['per_step_ms']} ms/step")
    for c in cats:
        print(f"  cat {c['pct']:6.2f}%  bw_util {c['hbm_bw_util']:5.2f}  "
              f"{c['name']}")
    for o in ops[:10]:
        print(f"{o['pct']:6.2f}%  bw_util {o['hbm_bw_util']:5.2f}  "
              f"{o['name']}")
    print(f"[profile] wrote {args.out}")


if __name__ == "__main__":
    main()
