#!/usr/bin/env python
"""On-chip smoke of the non-flagship configs (VERDICT r3 #5).

Round 3 left 4 of the 6 reference configs CPU-tested only; this driver runs
each full-size config for a short real training leg (default 50 steps) plus
one validate on the attached TPU, recording s/step and the config's own
validation metric in CONFIG_SMOKE.json.  Any config that fails records the
error instead of aborting the others.

Reference analogue: all of these are first-class GPU configs
(`/root/reference/baseline/configs/*.py`) with their own eval branches
(`engine/runner.py:257-322`).

Usage: python tools/config_smoke.py --data-root /root/data/synth1024
"""

import argparse
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIGS = ["Proj28_GFC-T3_RowRef_82_73_laser",
           "Proj28_GFC-T3_Seg_82_11_laser",
           "Proj_polyline_fpn_mixseg_vertex",
           "Proj_FPN_Seg"]


def smoke_one(name: str, args) -> dict:
    import gc
    import jax
    import numpy as np
    from lanemapping_tpu.config.config import Config
    from lanemapping_tpu.data.loader import build_dataloader
    from lanemapping_tpu.engine.runner import Runner

    cfg = Config.fromfile(os.path.join(REPO, "configs", name + ".py"))
    cfg.batch_size = args.batch
    cfg.epochs = 1
    cfg.gt_cache = True
    cfg.train_compute_dtype = "bfloat16"
    cfg.remat = True
    cfg.log_every = 10
    for s in ("train", "val", "test"):
        cfg.dataset[s]["data_root"] = args.data_root
    log_dir = os.path.join(args.log_dir, name)
    runner = Runner(cfg, log_dir=log_dir)

    # manual step loop so warmup (compile) is excluded from the s/step
    loader = build_dataloader(cfg.dataset.train, cfg, is_train=True)
    it = iter(loader)
    losses = []
    t_compile = time.time()
    t0 = None
    n_timed = 0
    for i in range(args.steps):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            batch = next(it)
        runner.rng, rng = jax.random.split(runner.rng)
        runner.state, stats = runner._train_step(
            runner.state, runner._device_batch(batch), rng)
        if i == 0:
            # force first-step completion: compile + first dispatch
            first = {k: float(v) for k, v in jax.device_get(stats).items()}
            losses.append(first["loss"])
            compile_wall = time.time() - t_compile
            t0 = time.time()
        elif i == args.steps - 1:
            last = {k: float(v) for k, v in jax.device_get(stats).items()}
            losses.append(last["loss"])
            n_timed = i
    sec_per_step = (time.time() - t0) / max(n_timed, 1)

    t_val = time.time()
    metrics = runner.validate(max_batches=args.val_batches)
    val_wall = time.time() - t_val
    entry = {
        "config": name,
        "batch": args.batch,
        "steps": args.steps,
        "compile_plus_first_step_s": round(compile_wall, 1),
        "sec_per_step": round(sec_per_step, 4),
        "loss_first": round(losses[0], 3),
        "loss_last": round(losses[-1], 3),
        "loss_decreased": bool(losses[-1] < losses[0]),
        "val_wall_s": round(val_wall, 1),
        "val": {k: round(float(v), 4) for k, v in metrics.items()},
    }
    del runner
    jax.clear_caches()
    gc.collect()
    return entry


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="/root/data/synth1024")
    ap.add_argument("--configs", nargs="+", default=CONFIGS)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--val-batches", type=int, default=8)
    ap.add_argument("--log-dir", default="/root/data/config_smoke")
    ap.add_argument("--out", default=os.path.join(REPO, "CONFIG_SMOKE.json"))
    args = ap.parse_args()

    import jax
    provenance = {
        "data_root": args.data_root,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "date": time.strftime("%Y-%m-%d"),
    }
    record = {"provenance": provenance, "configs": {}}
    if os.path.isfile(args.out):
        # merge-resume: keep earlier configs' entries; each entry carries
        # its own measurement-time provenance, so carried-over entries are
        # not mislabeled as measured under this run's backend/data-root/date
        with open(args.out) as f:
            prior = json.load(f)
        for k, v in prior.get("configs", {}).items():
            v.setdefault("provenance", prior.get("provenance", {}))
            record["configs"][k] = v

    for name in args.configs:
        print(f"[config_smoke] === {name} ===", flush=True)
        try:
            entry = smoke_one(name, args)
        except Exception:
            entry = {"config": name, "error": traceback.format_exc()[-2000:]}
        entry["provenance"] = dict(provenance)
        record["configs"][name] = entry
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)
        print(json.dumps(entry)[:600], flush=True)


if __name__ == "__main__":
    main()
