#!/usr/bin/env python
"""Headline benchmark: BEV-tile inference throughput on one TPU chip.

Measures the flagship pipeline (FPN-ResNet34 + GFC-T + ColumnProposal2 at
1152x1152, forward + full XLA lane decode) in tiles/sec on the attached chip
and prints ONE JSON line.

Measurement notes (axon TPU tunnel): ``block_until_ready`` does not actually
synchronise and each dispatch costs ~45 ms of round-trip latency, so the
benchmark rolls N forward+decode iterations into a single jitted
``lax.fori_loop`` (iterations chained through a data dependency so XLA cannot
hoist them), forces completion with an array readback, and differences two
loop lengths to cancel the fixed dispatch/readback overhead.

``vs_baseline``: the reference repo publishes no numbers
(BASELINE.json.published == {}), so the denominator is an RTX-4090 estimate
for the same ~10M-param model at batch 6 derived from the reference's
training hardware (README.md:34-40) and a FLOP/bandwidth analysis:
~25 tiles/s end-to-end including its host-side NumPy decode loop.
``vs_baseline`` is the MEASURED per-chip ratio (tiles/s / 25.0); the
separate ``projected_8chip_vs_baseline`` field extrapolates to a v5e-8
(the pipeline is embarrassingly data-parallel over tiles — see
__graft_entry__.dryrun_multichip for the validated sharded step — but no
8-chip hardware is attached here, so that number is a projection, not a
measurement).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Derived in BASELINE.md ("Derivation of the 25 tiles/s RTX-4090
# denominator", tools/derive_baseline.py -> BASELINE_DERIVATION.json):
# measured-serial reference harness ~6.6 tiles/s, pure-GPU roofline 41-76;
# 25 = generous fully-pipelined-deployment middle.
BASELINE_4090_TILES_PER_SEC = 25.0
N_CHIPS_TARGET = 8
V5E_BF16_PEAK_FLOPS = 197e12  # TPU v5e peak bf16 FLOP/s (public spec)


def main_train():
    """`bench.py --train`: full-size training-step benchmark as an artifact
    (VERDICT r2 #4).  fori_loop over the jitted train step with a
    device-resident batch (same measurement discipline as the inference
    bench), plus train-MFU from the compiled step's cost_analysis."""
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

    cfg = Config.fromfile(os.environ.get(
        "BENCH_CONFIG",
        os.path.join(REPO, "configs", "Proj_polyline_fpn_vit_vertex_2.py")))
    # hardware-run training shape (ARCHITECTURE.md round-2 run)
    cfg.train_compute_dtype = "bfloat16"
    cfg.remat = os.environ.get("BENCH_REMAT", "1") == "1"
    cfg.remat_policy = os.environ.get("BENCH_REMAT_POLICY", "full")
    fused = os.environ.get("BENCH_FUSED_SEG", "1") == "1"
    cfg.fused_seg_focal = fused
    cfg.seg_focal_chunks = int(os.environ.get("BENCH_SEG_CHUNKS", "1"))
    B = int(os.environ.get("BENCH_TRAIN_BATCH", "8"))  # TRAIN_BENCH winner
    # generic overrides for one-off A/B cells (e.g. BENCH_SET="s2d_stem=True"
    # for the space-to-depth stem): same key=value syntax as soak_run --set
    if os.environ.get("BENCH_SET"):
        from lanemapping_tpu.config.config import parse_dict_action
        cfg.merge_from_dict(parse_dict_action(
            os.environ["BENCH_SET"].split(";")))
    img = cfg.list_img_size_xy[0]
    S, P = cfg.heads.row_size, cfg.heads.num_prop
    W = cfg.heads.prop_width + 2 * cfg.heads.prop_half_buff

    # raw-point LiDAR config (`use_lidar`): bench the voxelize + z-folded
    # encoder train step on a padded static point buffer instead of BEV
    use_lidar = bool(cfg.get("use_lidar", False))
    n_pts = int(os.environ.get("BENCH_LIDAR_POINTS", str(1 << 17)))
    if use_lidar:
        cfg.max_points = n_pts

    model = build_model(cfg)
    tx = build_optimizer(cfg)
    example = ({"points": jnp.zeros((1, n_pts, 4), jnp.float32),
                "points_mask": jnp.zeros((1, n_pts), bool)}
               if use_lidar else jnp.zeros((1, img, img, 3), jnp.float32))
    state = create_train_state(model, tx, jax.random.PRNGKey(0), example)
    hp = head_hparams(cfg)
    step = make_train_step(model, tx,
                           lambda out, b: column_proposal_loss(out, b, hp),
                           compute_dtype=jnp.bfloat16, use_lidar=use_lidar)

    rng = np.random.RandomState(0)
    if use_lidar:
        lo = np.array(cfg.lidar_point_cloud_range[:3] + [800.0], np.float32)
        hi = np.array(cfg.lidar_point_cloud_range[3:] + [33000.0], np.float32)
        pts = lo + rng.rand(B, n_pts, 4).astype(np.float32) * (hi - lo)
        inp = {"points": pts, "points_mask": np.ones((B, n_pts), bool)}
    else:
        inp = {"proj": rng.rand(B, img, img, 3).astype(jnp.bfloat16)}
    batch = {
        **inp,
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
    }
    if fused:
        batch["prop_inst"] = np.where(
            rng.rand(B, img, img) < 0.01,
            rng.randint(0, 12, (B, img, img)), 255).astype(np.uint8)
        batch["prop_best"] = rng.randint(0, 12, (B, P)).astype(np.uint8)
    else:
        batch["prop_bi_seg"] = rng.randint(
            0, 2, (B, P, img, 8 * W)).astype(np.uint8)
    batch = jax.device_put(batch)

    # ONE compiled program per cell: dynamic trip count (fori_loop with a
    # traced bound lowers to a while loop), so the n1/n2 differencing pair
    # reuses the same executable, and XLA's cost analysis counts the loop
    # body ONCE — i.e. the program's own cost model IS the per-step FLOPs
    # (verified: dyn-loop flops = step flops + ~0.8% loop overhead).
    # Through a remote-TPU tunnel the compile dominates a sweep cell's wall,
    # so this cuts each cell from 3 big compiles to 1.
    @jax.jit
    def run(state, rng_key, n):
        def body(i, carry):
            st, key = carry
            key, sub = jax.random.split(key)
            st, _ = step(st, batch, sub)
            return st, key
        st, _ = jax.lax.fori_loop(0, n, body, (state, rng_key))
        # array readback forces completion on axon
        return st.params["heads"]["proposal_confidence"]["bias"]

    n1 = int(os.environ.get("BENCH_TRAIN_ITERS", "4"))
    n2 = 2 * n1
    compiled = run.lower(state, jax.random.PRNGKey(1),
                         jnp.int32(n1)).compile()
    try:
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        step_flops = float(cost.get("flops", 0.0))
    except Exception:
        step_flops = 0.0
    # HBM high-water from the compiled executable (args + outputs + live
    # temporaries); no execution needed, so it is exact for the program
    # that actually runs, not an estimate
    try:
        mem = compiled.memory_analysis()
        hbm_gb = (mem.argument_size_in_bytes + mem.output_size_in_bytes +
                  mem.temp_size_in_bytes) / 2**30
        hbm_gb = round(hbm_gb, 3)
    except Exception:
        hbm_gb = None

    if os.environ.get("BENCH_ANALYZE_ONLY") == "1":
        # compile-only pass (persistent-cache hit for already-swept cells):
        # report the program's FLOPs + HBM high-water without timing
        print(json.dumps({
            "metric": "train_step_analysis", "batch": B, "img": img,
            "remat": cfg.remat,
            "remat_policy": cfg.remat_policy if cfg.remat else None,
            "step_flops": step_flops, "hbm_highwater_gb": hbm_gb,
        }))
        return

    def timed(n):
        r = np.asarray(compiled(state, jax.random.PRNGKey(2), jnp.int32(n)))
        t0 = time.perf_counter()
        r = np.asarray(compiled(state, jax.random.PRNGKey(2), jnp.int32(n)))
        assert np.all(np.isfinite(r))
        return time.perf_counter() - t0

    t1, t2 = timed(n1), timed(n2)
    sec_per_step = (t2 - t1) / (n2 - n1)
    mfu = (step_flops / max(sec_per_step, 1e-9)) / V5E_BF16_PEAK_FLOPS \
        if step_flops else None
    print(json.dumps({
        "metric": "train_sec_per_step",
        "value": round(sec_per_step, 4),
        "unit": "s/step",
        "batch": B,
        "img": img,
        "use_lidar": use_lidar,
        "lidar_points": n_pts if use_lidar else None,
        "fused_seg_focal": fused,
        "seg_focal_chunks": cfg.seg_focal_chunks,
        "remat": cfg.remat,
        "remat_policy": cfg.remat_policy if cfg.remat else None,
        "step_flops": step_flops,
        "hbm_highwater_gb": hbm_gb,
        "train_mfu_vs_v5e_bf16_peak": round(mfu, 4) if mfu else None,
        "tiles_per_sec_train": round(B / max(sec_per_step, 1e-9), 2),
    }))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from lanemapping_tpu.config.config import Config
    from lanemapping_tpu.decode.lane_decode import decode_lanes
    from lanemapping_tpu.models.nets import build_model

    cfg = Config.fromfile(os.path.join(REPO, "configs",
                                       "Proj_polyline_fpn_vit_vertex_2.py"))
    model = build_model(cfg)
    img = cfg.list_img_size_xy[0]
    # 8/16/32/64: 108/112/127/128.7 t/s; 96: compile OOM by a hair
    # (15.98 > 15.75 GB), 128: OOM (20.5 GB) — 64 is the HBM ceiling
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    dtype = jnp.bfloat16 if cfg.get("compute_dtype") == "bfloat16" \
        else jnp.float32

    rng = jax.random.PRNGKey(0)
    proj = jax.random.uniform(rng, (batch, img, img, 3), jnp.float32)
    variables = model.init(rng, proj[:1], train=False)
    variables = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, variables)

    def one_pass(p):
        out = model.apply(variables, p.astype(dtype), train=False)
        dec = decode_lanes(out, cfg)
        # [batch] digest vector keeps a data dependency on the full decode
        return (dec["cls_offset"].mean(axis=(1, 2))
                + dec["prop_conf"].mean(axis=(1, 2))
                + dec["endp_coords"].mean(axis=(1, 2)))

    def loop(n):
        @jax.jit
        def run(p):
            def body(i, carry):
                # fold the tiny carry into the input: serialises iterations
                # and defeats loop-invariant hoisting
                return one_pass(p + (carry * 1e-24)[:, None, None, None])
            return jax.lax.fori_loop(0, n, body,
                                     jnp.zeros((batch,), jnp.float32))
        return run

    n1 = int(os.environ.get("BENCH_ITERS", "8"))
    n2 = 2 * n1
    run1, run2 = loop(n1), loop(n2)

    # exact HBM high-water of the inference executable (args + outputs +
    # live temporaries) — backs the batch-ceiling table in ARCHITECTURE.md
    try:
        mem = run1.lower(proj).compile().memory_analysis()
        infer_hbm_gb = round(
            (mem.argument_size_in_bytes + mem.output_size_in_bytes +
             mem.temp_size_in_bytes) / 2**30, 3)
    except Exception:
        infer_hbm_gb = None

    def timed(run):
        r = np.asarray(run(proj))  # array readback = real sync on axon
        t0 = time.perf_counter()
        r = np.asarray(run(proj))
        assert np.all(np.isfinite(r))
        return time.perf_counter() - t0

    t1 = timed(run1)
    t2 = timed(run2)
    tiles_per_sec = batch * (n2 - n1) / max(t2 - t1, 1e-9)
    record = {
        "metric": "bev_tiles_per_sec_per_chip",
        "value": round(tiles_per_sec, 2),
        "unit": "tiles/s",
        # measured per-chip ratio vs the 25 tiles/s 4090 estimate; the
        # reference publishes no numbers (BASELINE.json.published == {}) so
        # the denominator is an estimate — self-describe that in the record
        "vs_baseline": round(tiles_per_sec / BASELINE_4090_TILES_PER_SEC, 2),
        "baseline_estimated": True,
        "baseline_assumption": f"RTX-4090 {BASELINE_4090_TILES_PER_SEC} "
                               "tiles/s derived denominator (BASELINE.md "
                               "derivation + BASELINE_DERIVATION.json: "
                               "measured-serial reference harness ~6.6, "
                               "pure-GPU roofline 41-76; 25 = generous "
                               "pipelined-deployment middle)",
        "projected_8chip_vs_baseline": round(
            tiles_per_sec * N_CHIPS_TARGET / BASELINE_4090_TILES_PER_SEC, 2),
        "hbm_highwater_gb": infer_hbm_gb,
    }
    # end-to-end numbers (forward + decode + host tracker/NMS/semantics/
    # render + JSON export) recorded by `tools/stream_map.py --bench-json`
    # on this chip; see E2E_BENCH.json for the run's provenance
    e2e_path = os.path.join(REPO, "E2E_BENCH.json")
    if os.path.isfile(e2e_path):
        with open(e2e_path) as f:
            e2e = json.load(f)
        record["e2e_tiles_per_sec_per_chip"] = e2e.get("value")
        # headline km-lane/hour is the TRAINED-checkpoint rate (real decoded
        # lanes); the random-weights figure only measures pipeline throughput
        # and is kept under an explicitly-labelled proxy key
        if "weights" in e2e:  # r4+ format: trained ckpt IS the headline
            record["km_lane_per_hour"] = e2e.get("km_lane_per_hour")
            record["km_lane_per_hour_throughput_proxy"] = e2e.get(
                "r3_random_weights_proxy", {}).get(
                "km_lane_per_hour_throughput_proxy")
        else:
            trained = e2e.get("trained_ckpt_run", {})
            if trained.get("km_lane_per_hour") is not None:
                record["km_lane_per_hour"] = trained["km_lane_per_hour"]
            record["km_lane_per_hour_throughput_proxy"] = \
                e2e.get("km_lane_per_hour")
    print(json.dumps(record))


if __name__ == "__main__":
    entry = main_train if "--train" in sys.argv else main
    # The remote TPU tunnel occasionally drops a dispatch (observed ~1/10
    # runs); one retry keeps the driver's benchmark record robust.
    try:
        entry()
    except Exception as e:
        print(f"[bench] first attempt failed ({type(e).__name__}); retrying",
              file=sys.stderr)
        entry()
