#!/usr/bin/env python
"""On-chip timing: Pallas binning kernel vs XLA scatter voxelizer.

Times the production XLA scatter voxelizer against the RETIRED Pallas
one-hot kernel (`tests/pallas_reference_bev.py` — retired by round-3
measurement and round-4 analysis, see ARCHITECTURE.md) on the attached TPU
at realistic MLS density (~1M pts/tile, z clustered around the road
surface), so the retirement decision stays re-checkable on future hardware.

Measurement discipline (axon tunnel): one jitted ``lax.fori_loop`` per
variant with iterations chained through a data dependency, completion forced
by array readback, two loop lengths differenced to cancel fixed overhead.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_cloud(n: int, seed: int = 0):
    """MLS-like cloud: x,y uniform over the tile, z concentrated in a thin
    ground band (the clustering that stresses per-band capacity)."""
    import numpy as np
    rng = np.random.RandomState(seed)
    pts = np.concatenate([
        rng.uniform(-15, 15, (n, 1)),
        rng.uniform(-25, 25, (n, 1)),
        np.clip(rng.normal(-1.0, 0.25, (n, 1)), -2, 2),  # ~2 z-cells thick
        rng.uniform(0.02, 1.0, (n, 1)),
    ], axis=1).astype(np.float32)
    return pts


def timed_loop(fn, pts, n_iters):
    """Roll n_iters calls of fn(points)->[Y,X,F] into one jitted fori_loop."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    @jax.jit
    def run(p):
        def body(i, carry):
            out = fn(p + carry[0] * 1e-30)
            # tiny [1] digest keeps the data dependency alive (scalar D2H
            # hangs on axon, so the final readback must be an array)
            return out.mean()[None]
        return jax.lax.fori_loop(0, n_iters, body,
                                 jnp.zeros((1,), jnp.float32))

    r = np.asarray(run(pts))  # compile + warm
    t0 = time.perf_counter()
    r = np.asarray(run(pts))
    assert np.all(np.isfinite(r))
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-points", type=int, default=1 << 20)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--out", default=None, help="write the JSON record here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from pallas_reference_bev import voxelize_bev_zfold_pallas
    from lanemapping_tpu.ops.voxelize import voxelize_bev_zfold

    pc_range = (-15.0, -25.0, -2.0, 15.0, 25.0, 2.0)
    grid = (576, 576, 10)
    n = args.n_points
    pts = jax.device_put(synth_cloud(n))
    mask = jnp.ones((n,), bool)

    # CPU backend (smoke runs) only supports pallas in interpret mode
    interp = jax.default_backend() == "cpu"
    xla_fn = lambda p: voxelize_bev_zfold(p, mask, pc_range, grid)
    pls_fn = lambda p: voxelize_bev_zfold_pallas(p, mask, pc_range, grid,
                                                 interpret=interp)

    # parity first (one dispatch each): the kernel must agree with the
    # scatter path on the chip, not just in interpret mode
    a = np.asarray(jax.jit(xla_fn)(pts))
    b = np.asarray(jax.jit(pls_fn)(pts))
    max_abs = float(np.max(np.abs(a - b)))
    frac_diff = float(np.mean(np.abs(a - b) > 1e-3))

    n1, n2 = args.iters, 2 * args.iters
    res = {}
    for name, fn in (("xla_scatter", xla_fn), ("pallas", pls_fn)):
        t1 = timed_loop(fn, pts, n1)
        t2 = timed_loop(fn, pts, n2)
        res[name] = (t2 - t1) / (n2 - n1)

    winner = min(res, key=res.get)
    rec = {
        "metric": "voxelize_ms_per_call",
        "grid": list(grid),
        "n_points": n,
        "xla_scatter_ms": round(res["xla_scatter"] * 1e3, 2),
        "pallas_ms": round(res["pallas"] * 1e3, 2),
        "pallas_vs_xla": round(res["xla_scatter"] / max(res["pallas"], 1e-9),
                               2),
        "parity_max_abs": max_abs,
        "parity_frac_cells_diff": frac_diff,
        "winner": winner,
        "points_per_sec_winner": round(n / res[winner], 0),
    }
    print(json.dumps(rec))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
