#!/usr/bin/env python
"""Derive the RTX-4090 baseline denominator (VERDICT r4 missing #3).

The reference publishes no throughput numbers (BASELINE.md), so bench.py's
``vs_baseline`` divides by an estimate.  This script turns that estimate
into an argument with three measured components:

  1. **Device forward FLOPs** — XLA cost analysis of the flagship
     forward+decode program on the CPU backend (identical conv/matmul math
     to the reference model; the decode adds <1%).
  2. **Host postprocess time** — the reference's *own* NumPy functions
     (`baseline/utils/polyline_utils.py`: occupancy filter + greedy tracker,
     polyline NMS, semantic uniformisation, short-line removal) imported
     from /root/reference and timed on realistic decoded tiles.
  3. **Host decode-loop time** — the reference's triple python loop
     b x 72 proposals x 144 rows (`polyline_fpn_vit_vertex_2.py:704-738`:
     per-row +-2 softmax-neighborhood expectation + offset add), re-timed
     with the same iteration structure and per-iteration numpy work.

The 4090 e2e model is serial (the reference's validate/infer loop runs
forward -> .cpu() -> python decode -> numpy postprocess with no overlap,
`runner.py:223-353,690-868`):

    t_tile = F_fwd / (eff * PEAK_4090) + t_decode + t_postproc

with eff scenarios for cuDNN conv efficiency at these shapes.  Host times
measured on this 1-core cloud VM are scaled by HOST_SPEEDUP=2.0 in the
reference machine's favor (desktop single-core is faster).

Writes BASELINE_DERIVATION.json; BASELINE.md summarises the result.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

PEAK_4090_FLOPS = 82.6e12  # FP32/TF32 dense (NVIDIA Ada whitepaper)
CONV_EFF_SCENARIOS = {"low": 0.35, "mid": 0.50, "high": 0.65}
HOST_SPEEDUP = 2.0  # assume the 4090 workstation CPU is 2x this VM core
BATCH = 6  # reference batch (configs/Proj_polyline_fpn_vit_vertex_2.py:123)


def forward_flops() -> float:
    """Single-tile forward+decode FLOPs via CPU-backend cost analysis."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from lanemapping_tpu.config.config import Config
    from lanemapping_tpu.decode.lane_decode import decode_lanes
    from lanemapping_tpu.models.nets import build_model

    cfg = Config.fromfile(os.path.join(
        REPO, "configs", "Proj_polyline_fpn_vit_vertex_2.py"))
    model = build_model(cfg)
    img = cfg.list_img_size_xy[0]
    rng = jax.random.PRNGKey(0)
    proj = jnp.zeros((1, img, img, 3), jnp.float32)
    variables = model.init(rng, proj, train=False)

    def one(p):
        dec = decode_lanes(model.apply(variables, p, train=False), cfg)
        return dec["cls_offset"].mean()

    compiled = jax.jit(one).lower(proj).compile()
    return float(compiled.cost_analysis().get("flops", 0.0))


def synth_decoded_tile(rng, n_lanes=5, n_prop=72, n_rows=144):
    """Realistic raw decode output: each lane activates ~3 adjacent
    proposals with near-identical smooth column tracks (what the tracker
    and NMS actually see on WHU-style tiles)."""
    out_cls = np.full((n_prop, n_rows), -1.0)
    base = np.sort(rng.uniform(150, 1000, n_lanes))
    for li, c0 in enumerate(base):
        drift = rng.uniform(-60, 60)
        rows = np.arange(int(rng.uniform(0, 15)), int(rng.uniform(125, 144)))
        track = c0 + drift * rows / n_rows + rng.normal(0, 1.5, len(rows))
        p0 = int(np.clip(c0 / 16, 1, n_prop - 4))
        for dp in range(3):
            keep = rng.rand(len(rows)) < (0.95 if dp == 1 else 0.4)
            out_cls[p0 + dp, rows[keep]] = np.clip(track[keep], 1, 1150)
    orient = np.full((n_rows, n_rows), 5.0)
    seg_conf = rng.rand(1152, 1152).astype(np.float32) * 0.2
    # bi_seg confidence map as NMS samples it (`polyline_utils.py:112`)
    sem_map = rng.rand(1152, 1152).astype(np.float32)
    endp_map = np.zeros((1152, 1152))
    for c0 in base:
        endp_map[int(rng.uniform(30, 1120)), int(np.clip(c0, 30, 1120))] = 1
    return out_cls, orient, seg_conf, sem_map, endp_map


def time_reference_postproc(n_tiles=10) -> dict:
    """Time the reference's own tracker/NMS/semantics on synthetic tiles."""
    sys.path.insert(0, os.path.join("/root/reference/baseline/utils"))
    import polyline_utils as ref  # the reference's module, unmodified

    rng = np.random.RandomState(0)
    tiles = [synth_decoded_tile(rng) for _ in range(n_tiles)]
    t = {"smooth": 0.0, "nms": 0.0, "semantics": 0.0}
    for out_cls, orient, seg_conf, sem_map, endp_map in tiles:
        # the reference chain at `polyline_fpn_vit_vertex_2.py:842-857`:
        # smooth(+occupancy filter) -> NMS -> per-vertex semantics ->
        # uniformisation(+endpoint pruning) -> short-line removal
        t0 = time.perf_counter()
        smooth = ref.smooth_cls_line_per_batch(
            out_cls, orient, complete_inner_nodes=True,
            out_seg_conf=seg_conf)
        t1 = time.perf_counter()
        nms = ref.polyline_NMS2(smooth, sem_map)
        t2 = time.perf_counter()
        sem = np.where(nms > 0, (rng.rand(*nms.shape) > 0.5) + 1.0, -1.0)
        ply = np.stack([nms, sem], axis=-1)
        uni, _ = ref.polyline_uniform_semantics_by_statistics(
            ply, endp_map=endp_map, r_buff=12)
        ref.remove_short_polyline(uni, min_v_count=12)
        t3 = time.perf_counter()
        t["smooth"] += t1 - t0
        t["nms"] += t2 - t1
        t["semantics"] += t3 - t2
    return {k: v / n_tiles for k, v in t.items()}


def time_decode_loop(n_tiles=4) -> float:
    """Per-tile cost of the reference decode loop structure
    (`polyline_fpn_vit_vertex_2.py:704-738`): python loop over 72 proposals
    x 144 rows doing a +-2-neighborhood softmax expectation + offset add on
    numpy slices (the reference runs this on host after `.cpu()`)."""
    rng = np.random.RandomState(1)
    n_prop, n_rows, w = 72, 144, 10
    cls_soft = rng.rand(n_prop, n_rows, w).astype(np.float32)
    offs = rng.rand(n_prop, n_rows, w).astype(np.float32)
    exist = rng.rand(n_prop, n_rows) > 0.7
    t0 = time.perf_counter()
    for _ in range(n_tiles):
        for p in range(n_prop):
            for r in range(n_rows):
                if not exist[p, r]:
                    continue
                row = cls_soft[p, r]
                c = int(np.argmax(row))
                lo, hi = max(0, c - 2), min(w, c + 3)
                win = row[lo:hi]
                e = float((win * np.arange(lo, hi)).sum() / win.sum())
                ci = min(int(round(e)), w - 1)
                _ = e + float(offs[p, r, ci])
    return (time.perf_counter() - t0) / n_tiles


def main():
    rec = {"date": time.strftime("%Y-%m-%d"),
           "peak_4090_flops": PEAK_4090_FLOPS,
           "host_speedup_assumed": HOST_SPEEDUP,
           "batch_assumed": BATCH}

    print("[derive] timing reference host postprocess ...", flush=True)
    if os.path.isdir("/root/reference"):
        post = time_reference_postproc()
        rec["host_postproc_s_per_tile_this_vm"] = {
            k: round(v, 4) for k, v in post.items()}
        t_post = sum(post.values())
    else:
        t_post = rec["host_postproc_s_per_tile_this_vm"] = None

    print("[derive] timing decode-loop structure ...", flush=True)
    t_dec = time_decode_loop()
    rec["host_decode_loop_s_per_tile_this_vm"] = round(t_dec, 4)

    print("[derive] forward FLOPs (CPU-backend cost analysis) ...",
          flush=True)
    flops = forward_flops()
    rec["forward_flops_per_tile"] = flops

    scen = {}
    for name, eff in CONV_EFF_SCENARIOS.items():
        t_fwd = flops / (eff * PEAK_4090_FLOPS)
        t_host = ((t_post or 0.0) + t_dec) / HOST_SPEEDUP
        t_tile = t_fwd + t_host
        scen[name] = {
            "conv_efficiency": eff,
            "t_forward_ms": round(t_fwd * 1e3, 2),
            "t_host_ms": round(t_host * 1e3, 2),
            "tiles_per_sec_serial": round(1.0 / t_tile, 2),
            "tiles_per_sec_device_only": round(1.0 / t_fwd, 2),
        }
    rec["scenarios"] = scen
    mid = scen["mid"]["tiles_per_sec_serial"]
    rec["derived_estimate_tiles_per_sec"] = mid
    rec["note"] = ("serial per-tile model matching the reference's "
                   "unoverlapped validate/infer loop; see BASELINE.md")
    out = os.path.join(REPO, "BASELINE_DERIVATION.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
