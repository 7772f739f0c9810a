#!/usr/bin/env python
"""True multi-PROCESS execution of the multi-host code paths (VERDICT r3 #2).

Everything multi-host in the framework was previously only single-process
tested (the loader faked 2 ranks; the dryrun used 8 devices in one process).
This harness actually runs ``jax.distributed.initialize`` rendezvous with 2
processes x 4 virtual CPU devices each, drives the REAL Runner through a
short train + validate, and compares loss trajectory and merged metrics
against the identical single-process 8-device run.  Code that executes
multi-process for the first time here: `parallel/dist.py` init + host
gathers, `parallel/mesh.shard_batch`'s ``make_array_from_process_local_data``
branch, `Runner._eval_input` global-array assembly, `Runner._local_rows`
addressable-shard readback, `Runner._merge_metrics` metric pooling and the
rank-sharded train/eval loaders (`data/loader.py`).

Reference analogue: the DDP/NCCL launch stack
(`/root/reference/baseline/engine/runner.py:44-104`,
`baseline/utils/dist_utils.py:58-152`).

Usage (parent):  python tools/multihost_test.py --out MULTIHOST.json
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STEPS = 6
BATCH = 8


def _pin_cpu(n_devices: int):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_force_host_platform_device_count="
                               f"{n_devices}").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")


def _build_cfg(root: str, log_dir: str):
    from lanemapping_tpu.config.config import Config
    cfg = Config.fromfile(os.path.join(REPO, "configs", "tiny_test.py"))
    cfg.batch_size = BATCH
    cfg.mesh_shape = dict(data=-1)
    cfg.epochs = 3  # 16 train tiles / batch 8 = 2 steps/epoch -> 6 steps
    cfg.workers = 0
    cfg.log_every = 1
    cfg.log_dir = log_dir
    for s in ("train", "val", "test"):
        cfg.dataset[s]["data_root"] = root
    return cfg


def run_member(args):
    """One process of the run: rank R of N (N=1 is the single-process
    control).  Writes losses + metrics JSON (rank 0 only)."""
    _pin_cpu(8 // args.nprocs)
    import jax
    if args.nprocs > 1:
        from lanemapping_tpu.parallel.dist import \
            maybe_initialize_distributed
        maybe_initialize_distributed(coordinator=args.coordinator,
                                     num_processes=args.nprocs,
                                     process_id=args.rank)
        assert jax.process_count() == args.nprocs
    assert len(jax.devices()) == 8, jax.devices()

    from lanemapping_tpu.engine.runner import Runner
    cfg = _build_cfg(args.root, args.log_dir)
    runner = Runner(cfg, log_dir=args.log_dir)
    runner.train(max_iters=STEPS)
    metrics = runner.validate(max_batches=2)

    import numpy as np
    digest = float(sum(np.abs(np.asarray(x, np.float64)).sum()
                       for x in jax.tree.leaves(
                           jax.device_get(runner.state.params))))
    if jax.process_index() == 0:
        losses = []
        with open(os.path.join(args.log_dir, "train.jsonl")) as f:
            for line in f:
                losses.append(json.loads(line)["loss"])
        with open(args.member_out, "w") as f:
            json.dump({"losses": losses, "val": metrics,
                       "param_digest": digest,
                       "process_count": jax.process_count(),
                       "n_devices": len(jax.devices())}, f)
    # keep every process alive until rank 0 has written (distributed
    # shutdown kills stragglers' RPC peers)
    from lanemapping_tpu.parallel.dist import synchronize
    synchronize()


def _spawn(rank, nprocs, coordinator, root, log_dir, member_out):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    cmd = [sys.executable, os.path.abspath(__file__), "--role", "member",
           "--rank", str(rank), "--nprocs", str(nprocs),
           "--coordinator", coordinator, "--root", root,
           "--log-dir", log_dir, "--member-out", member_out]
    return subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)


def run_parent(args):
    import tempfile
    import numpy as np

    work = args.work_dir or tempfile.mkdtemp(prefix="multihost_")
    root = os.path.join(work, "tiles")
    if not os.path.isdir(os.path.join(root, "cropped_tiff")):
        sys.path.insert(0, REPO)
        from lanemapping_tpu.data.synthetic import generate_dataset
        stems = [f"{190000 + i:06d}_{i:04d}" for i in range(32)]
        generate_dataset(root, n_tiles=32, img=192, seed=5,
                         splits={"train": stems[:16], "valid": stems[16:24],
                                 "test": stems[24:], "single": stems[:1],
                                 "pretrain": stems})

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    record = {"config": "tiny_test.py", "batch": BATCH, "steps": STEPS,
              "date": time.strftime("%Y-%m-%d")}
    regimes = [("single_1proc_8dev", 1), ("multi_2proc_4dev", 2)]
    if args.nprocs_max >= 4:
        # VERDICT r4 #6: the rank-sharded eval path under a DEEPER process
        # split — 4 ranks x 2 devices exercises 4-way metric pooling and
        # 4-way rank-sharded loaders
        regimes.append(("multi_4proc_2dev", 4))
    outs = {}
    for name, nprocs in regimes:
        t0 = time.time()
        member_out = os.path.join(work, f"{name}.json")
        log_dir = os.path.join(work, f"logs_{name}")
        procs = [_spawn(r, nprocs, coordinator, root, log_dir, member_out)
                 for r in range(nprocs)]
        logs = []
        for p in procs:
            try:
                logs.append(p.communicate(timeout=args.timeout)[0])
            except subprocess.TimeoutExpired:
                for q in procs:  # kill stragglers; 1-core host, no orphans
                    q.kill()
                logs.append(p.communicate()[0] + "\n[parent] TIMEOUT")
        rcs = [p.returncode for p in procs]
        entry = {"rc": rcs, "wall_s": round(time.time() - t0, 1)}
        if any(rcs):
            entry["log_tail"] = [l[-3000:] for l in logs]
            record[name] = entry
            record["pass"] = False
            _write(args.out, record)
            print(json.dumps({"pass": False, "failed": name}))
            for line in logs:
                print(line[-3000:])
            return 1
        with open(member_out) as f:
            outs[name] = json.load(f)
        entry.update(outs[name])
        record[name] = entry

    # Tolerances match what SPMD actually guarantees across DIFFERENT
    # partitionings (1x8 vs 2x4 vs 4x2 produce different collective
    # schedules and reduction orders): parameters near-bit-equal (the
    # training math), logged losses relatively close, and the DISCRETE lane
    # decode loosely close — on a 6-step-trained model, reduction-order
    # noise at decode thresholds flips individual endpoint/semantic matches
    # (first 2-proc run: digest agreed to 3.7e-7 while endp_f1 moved 0.02
    # on 8 tiles).
    a = outs["single_1proc_8dev"]
    la = np.asarray(a["losses"])
    record["compare"] = {}
    ok = True
    for name, nprocs in regimes[1:]:
        b = outs[name]
        lb = np.asarray(b["losses"])
        loss_rel = float(np.max(np.abs(la - lb)
                                / np.maximum(np.abs(la), 1.0)))
        dig_rel = abs(a["param_digest"] - b["param_digest"]) \
            / a["param_digest"]
        val_diff = {k: abs(a["val"][k] - b["val"][k]) for k in a["val"]}
        record["compare"][name] = {
            "max_rel_loss_diff": loss_rel,
            "param_digest_rel_diff": dig_rel,
            "val_metric_abs_diff": val_diff,
        }
        ok = ok and (loss_rel < 1e-3 and dig_rel < 1e-5
                     and all(v < 5e-2 for v in val_diff.values())
                     and b["process_count"] == nprocs)
    record["pass"] = bool(ok)
    _write(args.out, record)
    print(json.dumps({"pass": record["pass"], **record["compare"]}))
    return 0 if ok else 1


def _write(path, record):
    with open(path, "w") as f:
        json.dump(record, f, indent=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--role", default="parent",
                    choices=("parent", "member"))
    ap.add_argument("--rank", type=int, default=0)
    ap.add_argument("--nprocs", type=int, default=1)
    ap.add_argument("--coordinator", default="")
    ap.add_argument("--root", default="")
    ap.add_argument("--log-dir", default="")
    ap.add_argument("--member-out", default="")
    ap.add_argument("--work-dir", default=None)
    ap.add_argument("--nprocs-max", type=int, default=4,
                    help="deepest process split to test (4 adds the "
                         "4proc x 2dev regime)")
    ap.add_argument("--timeout", type=int, default=2400,
                    help="per-member wall limit; the 1-core bench host "
                         "needs headroom when anything else is running")
    ap.add_argument("--out", default=os.path.join(REPO, "MULTIHOST.json"))
    args = ap.parse_args()
    if args.role == "member":
        run_member(args)
        return 0
    return run_parent(args)


if __name__ == "__main__":
    sys.exit(main())
