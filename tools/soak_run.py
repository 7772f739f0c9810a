#!/usr/bin/env python
"""Scripted hardware soak of the full production loop (VERDICT r2 #1/#8).

Stages (each timed, results appended to --out after every stage):

  train   — flagship training on the synthetic set to an F1 plateau
            (bf16, batch 8, no remat — TRAIN_BENCH.json winners),
            in-training validation, best ckpt.
  endp    — the endpoint-decode three-way table (approx_topk / exact_topk /
            exact_host) evaluated on the CONVERGED checkpoint (r2 Weak #1).
  refkit  — reference-exact occupancy_filter delta on the same checkpoint.
  stream  — `stream_map --ckpt best` BEV streaming + 3-D lift + global merge
            (img2pc + merge_lines) with a non-empty-map assertion.
  lidar   — raw-point streaming through the LidarEncoder on a dense synthetic
            point split (throughput record; VERDICT r2 #2).

Usage:
  python tools/soak_run.py --data-root /root/data/synth1024 \
      --stages train,endp,refkit,stream,lidar --epochs 16
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FLAGSHIP = os.path.join(REPO, "configs", "Proj_polyline_fpn_vit_vertex_2.py")
LIDAR_CFG = os.path.join(REPO, "configs",
                         "Proj_polyline_lidarconv_vit_vertex_2.py")


def _save(out_path, record):
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)


def _train_cfg(args):
    import json as _json
    from lanemapping_tpu.config.config import Config, parse_dict_action
    cfg = Config.fromfile(args.config)
    cfg.train_compute_dtype = "bfloat16"
    # remat off: the r4 sweep measured no-remat fastest at every batch that
    # fits (even 16 fits at 14.2 GB); remat is purely an HBM-headroom lever
    # and can be re-engaged via --set remat=True
    cfg.remat = False
    cfg.batch_size = args.batch
    cfg.epochs = args.epochs
    cfg.eval_ep = args.eval_ep
    cfg.gt_cache = True
    cfg.save_ep = max(2, args.epochs // 4)
    split_file = os.path.join(args.data_root, "data_split-shuffle.json")
    with open(split_file) as f:
        n_train = len(_json.load(f)["train"])
    cfg.total_iter = (n_train // args.batch) * args.epochs
    cfg.scheduler = dict(type="CosineAnnealingLR", T_max=cfg.total_iter)
    for s in ("train", "val", "test"):
        cfg.dataset[s]["data_root"] = args.data_root
    # --set overrides last so they can beat the hard-coded defaults above;
    # merge_from_dict handles dotted keys (setattr would silently create a
    # literal 'heads.row_size' attribute)
    if args.set:
        overrides = parse_dict_action(args.set)
        cfg.merge_from_dict(overrides)
        # an epochs/batch_size override invalidates the schedule length
        # derived above — re-derive unless the user pinned it explicitly
        if ("epochs" in overrides or "batch_size" in overrides) \
                and "total_iter" not in overrides:
            cfg.total_iter = (n_train // cfg.batch_size) * cfg.epochs
            cfg.scheduler = dict(type="CosineAnnealingLR",
                                 T_max=cfg.total_iter)
    return cfg


def stage_train(args, rec):
    from lanemapping_tpu.engine.runner import Runner
    cfg = _train_cfg(args)
    log_dir = args.log_dir
    os.makedirs(log_dir, exist_ok=True)
    runner = Runner(cfg, log_dir=log_dir)
    resumed = runner.resume_latest()
    t0 = time.time()
    runner.train()
    wall = time.time() - t0
    curve = []
    val_path = os.path.join(log_dir, "val.jsonl")
    if os.path.isfile(val_path):
        with open(val_path) as f:
            curve = [json.loads(l) for l in f if l.strip()]
    rec["train"] = {
        "wall_s": round(wall, 1),
        "resumed": resumed,
        "epochs": cfg.epochs,
        "batch": cfg.batch_size,
        "steps": int(runner.state.step),
        "val_curve": [{k: round(v, 4) for k, v in c.items()
                       if isinstance(v, float)} for c in curve],
        "best_composite": round(runner.best_metric, 4),
        "ckpt": os.path.join(log_dir, "ckpt", "best"),
        "config": os.path.abspath(args.config),
    }


def _validate_with(args, ckpt, overrides, max_batches=None):
    import gc
    import jax
    from lanemapping_tpu.engine.runner import Runner
    from lanemapping_tpu.engine.checkpoint import load_model
    cfg = _train_cfg(args)
    for k, v in overrides.items():
        setattr(cfg, k, v)
    runner = Runner(cfg, log_dir=os.path.join(args.log_dir, "eval_tmp"))
    runner.state = load_model(ckpt, runner.state)
    # eval-only: never re-save a "best" checkpoint from inside validate
    runner.best_metric = float("inf")
    t0 = time.time()
    m = runner.validate(max_batches=max_batches)
    m = {k: round(float(v), 4) for k, v in m.items()}
    m["wall_s"] = round(time.time() - t0, 1)
    # successive Runners accumulate jit executables + their client buffers;
    # this process runs up to 3 of them back-to-back (the round-3 soak was
    # OOM-killed here before the fused-eval fix)
    del runner
    jax.clear_caches()
    gc.collect()
    return m


def stage_validate(args, rec):
    """Eval-only pass on --data-root with --ckpt (e.g. a hard-geometry set
    evaluated with a checkpoint trained on the benign benchmark set —
    VERDICT r4 #7's train/test stress split)."""
    ckpt = rec.get("train", {}).get("ckpt") or args.ckpt
    assert ckpt, "validate stage needs a checkpoint (run train or pass --ckpt)"
    rec["validate"] = {"ckpt": ckpt, "data_root": args.data_root,
                       **_validate_with(args, ckpt, {})}


def stage_endp(args, rec):
    ckpt = rec.get("train", {}).get("ckpt") or args.ckpt
    assert ckpt, "endp stage needs a checkpoint (run train or pass --ckpt)"
    table = {}
    for mode in ("approx_topk", "exact_topk", "exact_host"):
        table[mode] = _validate_with(args, ckpt, {"endp_decode": mode})
    rec["endp_decode_table"] = {"ckpt": ckpt, **table}


def stage_refkit(args, rec):
    ckpt = rec.get("train", {}).get("ckpt") or args.ckpt
    assert ckpt, "refkit stage needs a checkpoint"
    rec["ref_exact_occupancy_filter"] = {
        "default": _validate_with(args, ckpt, {}),
        "ref_exact": _validate_with(args, ckpt,
                                    {"ref_exact_occupancy_filter": True}),
    }


def stage_refkit_lidar(args, rec):
    """Reference-exact LiDAR deltas on a TRAINED checkpoint (VERDICT r2 #5):
    first-10-points voxel mean (mmdet3d ``max_num_points`` cap) and bicubic
    align_corners=False upsample (ref `lidarencoder.py:70-81`)."""
    ckpt = rec.get("train", {}).get("ckpt") or args.ckpt
    assert ckpt, "refkit_lidar stage needs a checkpoint"
    rec["ref_exact_lidar"] = {
        "ckpt": ckpt,
        "default": _validate_with(args, ckpt, {}),
        "voxel_cap_first10": _validate_with(
            args, ckpt, {"ref_exact_voxel_cap": True}),
        "bicubic_upsample": _validate_with(
            args, ckpt, {"ref_exact_bicubic_upsample": True}),
    }


def _run_stream(cmd):
    p = subprocess.run(cmd, capture_output=True, text=True)
    bench = None
    for line in p.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and "tiles" in line:
            try:
                bench = json.loads(line)
            except json.JSONDecodeError:
                pass
    return p, bench


def stage_stream(args, rec):
    ckpt = rec.get("train", {}).get("ckpt") or args.ckpt
    assert ckpt, "stream stage needs a checkpoint"
    out_dir = os.path.join(args.log_dir, "map_out")
    params_dir = os.path.join(args.data_root, "cropped_tiff_param")
    t0 = time.time()
    cmd = [sys.executable, os.path.join(REPO, "tools", "stream_map.py"),
           args.config, args.data_root, "--ckpt", ckpt, "--out", out_dir,
           "--split", "infer_only", "--batch", "16", "--preload",
           "--bench-json", "--max-batches", str(args.stream_batches)]
    if os.path.isdir(params_dir):
        cmd += ["--params-dir", params_dir]
    p, bench = _run_stream(cmd)
    entry = {"wall_s": round(time.time() - t0, 1), "bench": bench,
             "rc": p.returncode}
    if p.returncode != 0:
        entry["stderr_tail"] = p.stderr[-2000:]
    # global-map assertion: img2pc + merge must produce 3-D polylines
    merged = None
    for line in p.stdout.splitlines():
        if "global map:" in line:
            merged = line.split("global map:", 1)[1].strip()
    if merged and os.path.isfile(merged):
        with open(merged) as f:
            n_lines = sum(1 for _ in f)
        entry["merged_map"] = merged
        entry["merged_lines"] = n_lines
        assert n_lines > 0, "merged global map is empty"
    rec["stream_bev"] = entry


def stage_lidar(args, rec):
    lidar_root = args.lidar_root or os.path.join(
        os.path.dirname(args.data_root.rstrip("/")), "synth_lidar")
    if not os.path.isdir(os.path.join(lidar_root, "las")):
        from lanemapping_tpu.data.synthetic import generate_dataset
        t0 = time.time()
        generate_dataset(lidar_root, n_tiles=args.lidar_tiles, img=1152,
                         seed=7, with_points=True,
                         points_per_tile=args.lidar_points)
        print(f"[soak] generated {args.lidar_tiles} lidar tiles in "
              f"{time.time()-t0:.0f}s")
    t0 = time.time()
    cmd = [sys.executable, os.path.join(REPO, "tools", "stream_map.py"),
           args.lidar_config, lidar_root, "--out",
           os.path.join(args.log_dir, "map_out_lidar"), "--split", "all",
           "--batch", "4", "--bench-json",
           f"max_points={args.lidar_points}"]
    # the train-stage ckpt is only architecture-compatible when the train
    # stage actually used the lidar config (restoring a BEV-flagship ckpt
    # into the LidarEncoder template fails); else run random-weight
    # throughput as before
    trained = rec.get("train", {})
    lidar_ckpt = args.lidar_ckpt or (
        trained.get("ckpt")
        if trained.get("config") == os.path.abspath(args.lidar_config)
        else None)
    if lidar_ckpt:
        cmd += ["--ckpt", lidar_ckpt]
    p, bench = _run_stream(cmd)
    entry = {"wall_s": round(time.time() - t0, 1), "bench": bench,
             "rc": p.returncode,
             "points_per_tile": args.lidar_points,
             "ckpt": lidar_ckpt}
    if bench and bench.get("value"):
        entry["points_per_sec"] = round(
            bench["value"] * args.lidar_points, 0)
    if p.returncode != 0:
        entry["stderr_tail"] = p.stderr[-2000:]
    rec["stream_lidar"] = entry


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=FLAGSHIP)
    ap.add_argument("--lidar-config", default=LIDAR_CFG)
    ap.add_argument("--data-root", default="/root/data/synth1024")
    ap.add_argument("--stages", default="train,endp,refkit,stream,lidar")
    ap.add_argument("--epochs", type=int, default=16)
    ap.add_argument("--eval-ep", type=int, default=2)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--log-dir", default="/root/data/soak_logs")
    ap.add_argument("--ckpt", default=None,
                    help="existing checkpoint (skip train)")
    ap.add_argument("--out", default=os.path.join(REPO, "SOAK_RUN.json"))
    ap.add_argument("--stream-batches", type=int, default=8)
    ap.add_argument("--lidar-root", default=None)
    ap.add_argument("--lidar-tiles", type=int, default=24)
    ap.add_argument("--lidar-points", type=int, default=1 << 19)
    ap.add_argument("--lidar-ckpt", default=None)
    ap.add_argument("--set", action="append", default=[],
                    help="extra cfg overrides key=value (literal-evaled)")
    args = ap.parse_args()

    rec = {}
    if os.path.isfile(args.out):
        with open(args.out) as f:
            rec = json.load(f)
    import jax
    rec.setdefault("provenance", {})
    rec["provenance"].update({
        "data_root": args.data_root,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "date": time.strftime("%Y-%m-%d"),
    })
    stages = {"train": stage_train, "validate": stage_validate,
              "endp": stage_endp,
              "refkit": stage_refkit, "refkit_lidar": stage_refkit_lidar,
              "stream": stage_stream, "lidar": stage_lidar}
    for name in args.stages.split(","):
        name = name.strip()
        if not name:
            continue
        print(f"[soak] === stage {name} ===", flush=True)
        t0 = time.time()
        stages[name](args, rec)
        print(f"[soak] stage {name} done in {time.time()-t0:.0f}s",
              flush=True)
        _save(args.out, rec)
    print(f"[soak] record written to {args.out}")


if __name__ == "__main__":
    main()
