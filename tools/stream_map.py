#!/usr/bin/env python
"""Production mapping driver: stream a directory of BEV tiles through the
TPU and emit a global 3-D lane map.

The pipelined equivalent of the reference's three sequential stages
(`test_gpu_0.py` inference -> `coor_img2pc.py` -> `merge_lines.py`): tile
loading, TPU forward+decode, and host post-processing run concurrently —
the loader prefetches ahead of the device, and the C++ polyline tracker +
3-D lift run on a worker pool while the next batch is on the chip.
"""

import argparse
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("data_root", help="dataset root (cropped_tiff/ + labels/)")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--out", default="./map_out")
    ap.add_argument("--split", default="all")
    ap.add_argument("--params-dir", default=None,
                    help="cropped_tiff_param dir for the 3-D lift; skipped "
                         "if absent")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--bench-json", action="store_true",
                    help="print a BENCH-style JSON line with end-to-end "
                         "tiles/s and km-lane/hour")
    ap.add_argument("--max-batches", type=int, default=None)
    ap.add_argument("--preload", action="store_true",
                    help="decode all PNGs to RAM (uint8) before timing — "
                         "isolates the TPU+postprocess pipeline from host "
                         "PNG-decode throughput")
    ap.add_argument("--from-las", action="store_true",
                    help="sensor-native ingest: stream raw .las clouds "
                         "(<data_root>/las/*.las) and fuse the on-device "
                         "Las2BEV rasterization into the same jitted "
                         "forward+decode program — no BEV PNGs needed")
    ap.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from lanemapping_tpu.config.config import Config, parse_dict_action
    from lanemapping_tpu.engine.runner import Runner
    from lanemapping_tpu.engine.checkpoint import load_model
    from lanemapping_tpu.data.loader import Loader
    from lanemapping_tpu.registry import build_from_cfg, DATASETS
    from lanemapping_tpu.decode.lane_decode import decode_lanes, host_decode_view
    from lanemapping_tpu.decode.postprocess import lane_maps_from_decode
    from lanemapping_tpu.tools.export_lanes import lane_records

    cfg = Config.fromfile(args.config)
    if args.overrides:
        cfg.merge_from_dict(parse_dict_action(args.overrides))
    if args.batch:
        cfg.batch_size = args.batch
    for s in ("train", "val", "test"):
        cfg.dataset[s]["data_root"] = args.data_root
    runner = Runner(cfg)
    if args.ckpt:
        runner.state = load_model(os.path.abspath(args.ckpt), runner.state)

    if args.from_las:
        # raw clouds straight from disk; the BEV tile is synthesised on
        # device inside fwd_dec (reference analogue: the offline Las2BEV
        # step, README.md:171-172, here fused into the inference program)
        ds_cfg = dict(type="LasTiles", data_root=args.data_root,
                      mode=args.split)
    else:
        ds_cfg = dict(cfg.dataset.test)
        ds_cfg["mode"] = args.split
    ds = build_from_cfg(ds_cfg, DATASETS, default_args=dict(cfg=cfg))
    loader = Loader(ds, batch_size=cfg.batch_size, shuffle=False,
                    drop_last=False, num_threads=8, prefetch=3)

    lanes_dir = os.path.join(args.out, "lanes_2d")
    os.makedirs(lanes_dir, exist_ok=True)

    # one fused jitted program per batch: forward + full XLA decode in a
    # single dispatch (the axon tunnel costs ~45 ms per dispatch, and an
    # unjitted decode would pay it per op).  Tiles ship to the device as
    # uint8 — the PNG sources are uint8, so dividing by 255 on-device is
    # bit-identical to the host float path and cuts host->device traffic
    # 4x (~16 MB -> 4 MB per 1152px tile).
    # inference dtype follows cfg.compute_dtype (bf16 on the flagship
    # config, same as bench.py)
    state = runner.state
    if cfg.get("compute_dtype") == "bfloat16":
        state = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, state)
    from lanemapping_tpu.engine.state import is_mono_batch, make_eval_step
    eval_step = make_eval_step(runner.model)
    # only the keys the host postprocess consumes cross the tunnel; with
    # anchor-row seg maps this is ~0.45 MB/tile of readback instead of the
    # ~13 MB full decode dict (measured 1.98 -> 6.77 tiles/s end-to-end
    # through the ~15 MB/s-down tunnel)
    need_detail = bool(cfg.get("view_detail", False))

    compute_dtype = jnp.bfloat16 if cfg.get("compute_dtype") == "bfloat16" \
        else jnp.float32
    use_lidar = bool(cfg.get("use_lidar", False))

    las_p = None
    if args.from_las:
        from lanemapping_tpu.tools.las2bev import las2bev_params
        las_p = las2bev_params(cfg)
        img_sz = cfg.list_img_size_xy[0]

    def fwd_dec_fn(state, inp):
        if args.from_las:
            # fused Las2BEV: rasterize + hole-fill + calibrate each cloud to
            # the BEV tile the flagship trains on, all inside this one jitted
            # program — raw sensor points in, decoded lanes out
            from lanemapping_tpu.ops.voxelize import bev_image_from_points
            f = lambda p, m: bev_image_from_points(
                p, m, las_p["pc_range"], img_sz, gain=las_p["gain"],
                bias=las_p["bias"], fill_iters=las_p["fill_iters"])
            x = jax.vmap(f)(inp["points"], inp["points_mask"])
            x = jnp.broadcast_to(x[..., None].astype(compute_dtype),
                                 x.shape + (3,))
        elif use_lidar:
            # raw-point streaming: padded static point buffers + mask
            x = {"points": inp["points"], "points_mask": inp["points_mask"]}
        else:
            # normalize in f32 (exact /255), then drop to the compute dtype
            # so the network actually runs bf16 like bench.py (f32 input +
            # bf16 kernels would silently promote every layer back to f32).
            # A single-channel input is a mono tile shipped once (see
            # to_u8): broadcasting it back to 3 channels on device is
            # bit-identical to uploading the replicated channels.
            x = (inp.astype(jnp.float32) / 255.0).astype(compute_dtype)
            if x.shape[-1] == 1:
                x = jnp.broadcast_to(x, x.shape[:-1] + (3,))
        dec = decode_lanes(eval_step(state, x), cfg)
        keep = host_decode_view(dec)
        if not need_detail:
            keep.pop("cls", None)
            keep.pop("cls_exp", None)
        # readback squeeze: every host read of the conf rows is a comparison
        # (thinning argmax, NMS keep-the-higher), which any monotone map
        # preserves — ship uint8 (v*255 rounded; 0.17 MB/tile instead of the
        # f16 0.33 / f32 0.66) through the ~15 MB/s tunnel.  v_ext is a
        # {0,1,2} class id and orient an 11-class id: one byte each.
        keep["bi_seg_rows"] = jnp.round(
            jnp.clip(keep["bi_seg_rows"], 0.0, 1.0) * 255.0).astype(jnp.uint8)
        keep["prop_v_ext"] = keep["prop_v_ext"].astype(jnp.uint8)
        keep["orient"] = keep["orient"].astype(jnp.int8)
        return keep

    fwd_dec = jax.jit(fwd_dec_fn)

    # data-parallel tile streaming: the batch axis shards over every chip
    # of the config's mesh (`mesh_shape`, default all local devices) and
    # XLA runs the fused forward+decode SPMD — the inference analogue of
    # the pjit training mesh
    from lanemapping_tpu.parallel.mesh import batch_sharding, make_mesh, \
        replicated
    mesh = make_mesh(cfg)
    n_dev = int(mesh.devices.size)
    if n_dev > 1:
        if cfg.batch_size % n_dev != 0:
            raise SystemExit(f"--batch {cfg.batch_size} must divide over "
                             f"{n_dev} devices")
        state = jax.device_put(state, replicated(mesh))
        in_shard = batch_sharding(mesh)
        print(f"[stream_map] data-parallel over {n_dev} devices")
    else:
        in_shard = None

    def _pad(a):
        # pad ragged final batches to the full batch size: keeps the data
        # sharding divisible over the mesh and avoids a recompile inside
        # the timed region (padded tiles are decoded and discarded)
        if len(a) < cfg.batch_size:
            pad = np.zeros((cfg.batch_size - len(a),) + a.shape[1:], a.dtype)
            a = np.concatenate([a, pad], axis=0)
        return a

    def put(inp):
        inp = jax.tree.map(_pad, inp)
        return jax.device_put(inp, in_shard) if in_shard is not None \
            else jax.device_put(inp)

    def to_u8(proj):
        a = np.rint(np.asarray(proj) * 255.0).astype(np.uint8)
        # mono-batch squeeze shared with Runner (engine.state.is_mono_batch):
        # ship ONE channel, broadcast on device — 3x less H2D, bit-identical.
        # Mixed/true-RGB batches ship all 3 (jit specialises per shape).
        if is_mono_batch(a):
            return np.ascontiguousarray(a[..., :1])
        return a

    def to_input(batch):
        if use_lidar or args.from_las:
            return {"points": np.asarray(batch["points"], np.float32),
                    "points_mask": np.asarray(batch["points_mask"])}
        return to_u8(batch["proj"])

    pool = ThreadPoolExecutor(6)
    pending = []
    n_tiles = 0

    def postprocess(dec_dev, names):
        # device->host readback inside the worker so the main loop keeps
        # the chip fed; tracker/NMS/semantics/render follow on this thread.
        # Returns (polyline arc length px, readback seconds, host-postproc
        # seconds) — summed by the main thread; workers must not share a
        # counter.  The readback/host split attributes each run's rate to
        # link vs CPU (VERDICT r4 #5: measured components per run).
        t0 = time.time()
        dec_host = jax.device_get(dec_dev)
        t_read = time.time() - t0
        t0 = time.time()
        maps = lane_maps_from_decode(dec_host, cfg)
        px = 0.0
        for j, name in enumerate(names):
            recs = lane_records(maps["cls_offset_smooth"][j])
            for rec in recs:
                seq = np.asarray(rec["seq"], np.float64)[:, :2]  # (row, col)
                if len(seq) > 1:
                    d = np.diff(seq, axis=0)
                    px += float(np.sum(np.hypot(d[:, 0], d[:, 1])))
            with open(os.path.join(lanes_dir, f"{name}.json"), "w") as f:
                json.dump(recs, f)
        return px, t_read, time.time() - t0

    def batch_stream():
        for i, b in enumerate(loader):
            if args.max_batches is not None and i >= args.max_batches:
                break
            yield to_input(b), b["image_name"]

    if args.preload:
        stream = iter(list(batch_stream()))
    else:
        stream = batch_stream()

    # warm the compile outside the timed region with the stream's own first
    # batch (no second loader iterator left blocked in its prefetch queue);
    # the batch is then processed normally inside the timed loop
    head = next(stream, None)
    if head is None:
        raise SystemExit("[stream_map] no tiles to process")
    fwd_dec(state, put(head[0]))
    import itertools
    stream = itertools.chain([head], stream)

    # link-phase probe: the shared tunnel fluctuates 2-3x between runs
    # (round-3 measurement); an 8 MB H2D + D2H timing immediately before
    # the timed region stamps this run with the phase it actually sampled
    # (No program compiles here: a sliced readback would trace a tiny slice
    # executable that the persistent cache skips — min-compile-time floor —
    # costing a fresh ~2 min tunnel compile per process and polluting the
    # timing.  Full-array readbacks are runtime transfers, compile-free:
    # round trip = H2D+D2H, second readback = D2H alone, difference = H2D.)
    probe_mb = 8.0
    buf = np.zeros(int(probe_mb * 1e6), np.uint8)
    t0 = time.time()
    dev_buf = jax.device_put(buf)
    _ = np.asarray(dev_buf)  # forces the upload, then reads back
    rtt_s = time.time() - t0
    t0 = time.time()
    _ = np.asarray(dev_buf)
    d2h_s = time.time() - t0
    h2d_s = max(rtt_s - d2h_s, 1e-9)
    probe = {"probe_h2d_mbps": round(probe_mb / max(h2d_s, 1e-9), 1),
             "probe_d2h_mbps": round(probe_mb / max(d2h_s, 1e-9), 1)}
    del dev_buf, buf

    t0 = time.time()
    for proj_u8, names in stream:
        dec = fwd_dec(state, put(proj_u8))
        pending.append(pool.submit(postprocess, dec, names))
        n_tiles += len(names)
    results = [p.result() for p in pending]
    lane_px_total = sum(r[0] for r in results)
    readback_s = sum(r[1] for r in results)
    post_host_s = sum(r[2] for r in results)
    dt = time.time() - t0
    tiles_s = n_tiles / max(dt, 1e-9)
    # km of lane line produced per hour: polyline arc length in px * the
    # dataset's 0.05 m/px BEV resolution (reference io_utils img_reso)
    m_per_px = cfg.get("img_reso", 0.05)
    km_lane_h = lane_px_total * m_per_px / 1000.0 / max(dt, 1e-9) * 3600.0
    print(f"[stream_map] {n_tiles} tiles in {dt:.1f}s "
          f"({tiles_s:.2f} tiles/s end-to-end, "
          f"{km_lane_h:.1f} km-lane/hour)")
    if args.bench_json:
        rec = {
            "metric": "e2e_tiles_per_sec_per_chip",
            "value": round(tiles_s, 2),
            "unit": "tiles/s",
            "km_lane_per_hour": round(km_lane_h, 1),
            "n_tiles": n_tiles,
            # measured components (worker-thread sums overlap the dispatch
            # loop, so they attribute rather than add up to wall time)
            "readback_s_sum": round(readback_s, 2),
            "post_host_s_sum": round(post_host_s, 2),
            "wall_s": round(dt, 2),
            **probe,
        }
        if args.from_las:
            n_pts = cfg.get("max_points", 1 << 19)
            rec["mode"] = "from_las"
            rec["points_per_sec"] = round(tiles_s * n_pts, 0)
        if not args.ckpt:
            # random-weight runs decode noise polylines: tiles/s is a real
            # throughput measurement but km-lane/hour is only a proxy
            rec["throughput_proxy"] = True
            rec["weights"] = "random-init"
        else:
            rec["weights"] = os.path.abspath(args.ckpt)
        print(json.dumps(rec))

    if args.params_dir and os.path.isdir(args.params_dir):
        from lanemapping_tpu.tools.img2pc import convert_directory
        from lanemapping_tpu.tools.merge_lines import merge_directory
        pc_dir = convert_directory(lanes_dir,
                                   os.path.join(args.data_root,
                                                "cropped_tiff"),
                                   args.params_dir, n_workers=8)
        merged, down = merge_directory(pc_dir)
        print(f"[stream_map] global map: {merged}")
    else:
        print("[stream_map] no params dir: stopping at 2-D lane seqs")


if __name__ == "__main__":
    main()
