#!/usr/bin/env python
"""Inference / evaluation CLI.

Replaces the reference eval script (`/root/reference/test_gpu_0.py`): loads a
checkpoint, runs lane decoding over the test split, reports buffered
coordinate / endpoint / semantic F1, and optionally writes per-tile lane-seq
JSONs for the offline global-mapping tools.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description="Evaluate / infer lane maps")
    ap.add_argument("config")
    ap.add_argument("--ckpt", default=None, help="checkpoint dir to load")
    ap.add_argument("--split", default="test", choices=["test", "val"])
    ap.add_argument("--max-batches", type=int, default=None)
    ap.add_argument("--save-lanes", default=None,
                    help="dir to write per-tile lane-seq JSONs")
    ap.add_argument("--view", action="store_true",
                    help="also write overlay PNGs next to the lane JSONs")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    from lanemapping_tpu.config.config import Config, parse_dict_action
    from lanemapping_tpu.engine.runner import Runner
    from lanemapping_tpu.engine.checkpoint import load_model
    from lanemapping_tpu.data.loader import build_dataloader

    cfg = Config.fromfile(args.config)
    if args.overrides:
        cfg.merge_from_dict(parse_dict_action(args.overrides))
    runner = Runner(cfg)
    if args.ckpt:
        runner.state = load_model(os.path.abspath(args.ckpt), runner.state)

    split_cfg = cfg.dataset[args.split if args.split in cfg.dataset else "test"]
    loader = build_dataloader(split_cfg, cfg, is_train=False)
    t0 = time.time()
    metrics = runner.validate(loader=loader, max_batches=args.max_batches)
    dt = time.time() - t0
    print(json.dumps({"metrics": metrics, "wall_s": round(dt, 2)}))

    if args.save_lanes:
        loader2 = build_dataloader(split_cfg, cfg, is_train=False)
        head_type = cfg.heads.type if "heads" in cfg else None
        if cfg.net.type == "Segmentor":
            m = runner.infer_segmentor_and_export(
                loader2, args.save_lanes, max_batches=args.max_batches,
                write_view=args.view)
            print(json.dumps({"segmentor_infer": m}))
            print(f"[infer] segmentor maps written to {args.save_lanes}")
        elif head_type in ("RowSharNotReducRef", "GridSeg"):
            runner.infer_grid_and_export(loader2, args.save_lanes,
                                         max_batches=args.max_batches,
                                         write_view=args.view)
            print(f"[infer] grid-head lane seqs written to {args.save_lanes}")
        else:
            runner.infer_and_export(loader2, args.save_lanes,
                                    max_batches=args.max_batches,
                                    write_view=args.view)
            print(f"[infer] lane seqs written to {args.save_lanes}")


if __name__ == "__main__":
    main()
