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

BASELINE_4090_TILES_PER_SEC = 25.0
N_CHIPS_TARGET = 8


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
    batch = int(os.environ.get("BENCH_BATCH", "64"))  # 8/16/32/64: 108/112/127/128.7 t/s
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
        # measured per-chip ratio vs the 25 tiles/s 4090 estimate
        "vs_baseline": round(tiles_per_sec / BASELINE_4090_TILES_PER_SEC, 2),
        "projected_8chip_vs_baseline": round(
            tiles_per_sec * N_CHIPS_TARGET / BASELINE_4090_TILES_PER_SEC, 2),
    }
    # end-to-end numbers (forward + decode + host tracker/NMS/semantics/
    # render + JSON export) recorded by `tools/stream_map.py --bench-json`
    # on this chip; see E2E_BENCH.json for the run's provenance
    e2e_path = os.path.join(REPO, "E2E_BENCH.json")
    if os.path.isfile(e2e_path):
        with open(e2e_path) as f:
            e2e = json.load(f)
        record["e2e_tiles_per_sec_per_chip"] = e2e.get("value")
        record["km_lane_per_hour"] = e2e.get("km_lane_per_hour")
    print(json.dumps(record))


if __name__ == "__main__":
    # The remote TPU tunnel occasionally drops a dispatch (observed ~1/10
    # runs); one retry keeps the driver's benchmark record robust.
    try:
        main()
    except Exception as e:
        print(f"[bench] first attempt failed ({type(e).__name__}); retrying",
              file=sys.stderr)
        main()
