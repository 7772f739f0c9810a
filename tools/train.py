#!/usr/bin/env python
"""Training CLI.

Replaces the reference entry script (`/root/reference/train_gpu_0.py`), with
the config path as a proper argument instead of a hardcoded constant, plus
dotted-key overrides: ``python tools/train.py configs/X.py optimizer.lr=1e-4``.
"""

import argparse
import datetime
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description="Train a lane-mapping model")
    ap.add_argument("config", help="path to a python config file")
    ap.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    ap.add_argument("--max-iters", type=int, default=None,
                    help="stop after N iterations (smoke runs)")
    ap.add_argument("--resume", default=None,
                    help="log dir of a previous run to resume (full state)")
    args = ap.parse_args()

    from lanemapping_tpu.config.config import Config, parse_dict_action
    from lanemapping_tpu.engine.runner import Runner

    cfg = Config.fromfile(args.config)
    if args.overrides:
        cfg.merge_from_dict(parse_dict_action(args.overrides))

    stamp = datetime.datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
    log_dir = os.path.join(cfg.get("log_dir", "./logs"), stamp)
    os.makedirs(log_dir, exist_ok=True)
    shutil.copy2(args.config, os.path.join(log_dir,
                                           os.path.basename(args.config)))
    print(f"[train] config={args.config} log_dir={log_dir}")

    runner = Runner(cfg, log_dir=args.resume or log_dir)
    if args.resume and runner.resume_latest():
        print(f"[train] resumed from {args.resume} at step "
              f"{int(runner.state.step)}")
    runner.train(max_iters=args.max_iters)
    print("[train] done")


if __name__ == "__main__":
    main()
