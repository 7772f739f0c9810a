"""Native C++ postprocessing vs NumPy reference parity."""

import numpy as np
import pytest

from lanemapping_tpu.native import (build_library, polyline_nms_native,
                                    smooth_lanes_native)
from lanemapping_tpu.decode.postprocess import polyline_nms, smooth_lanes


@pytest.fixture(scope="module", autouse=True)
def built():
    build_library()


def _random_decode(seed, P=72, S=144, img=1152, n_lanes=3):
    rng = np.random.RandomState(seed)
    coors = np.full((P, S), -1.0)
    for k in range(n_lanes):
        p = rng.randint(0, P)
        base = rng.uniform(100, img - 100)
        drift = rng.uniform(-0.5, 0.5)
        r0, r1 = sorted(rng.randint(0, S, 2))
        if r1 - r0 < 20:
            r1 = min(S, r0 + 30)
        for r in range(r0, r1):
            if rng.rand() > 0.15:  # some dropped vertices
                coors[p, r] = np.clip(base + drift * (r - r0)
                                      + rng.randn() * 1.0, 1, img - 2)
    orient = rng.randint(0, 11, (S, S)).astype(np.int64)
    seg_conf = rng.rand(144, img)  # anchor-row matrix [S, img]
    return coors, orient, seg_conf


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_native_smooth_matches_numpy(seed):
    coors, orient, seg_conf = _random_decode(seed)
    want = smooth_lanes(coors.copy(), orient, seg_conf=seg_conf,
                        complete_inner_nodes=True)
    got = smooth_lanes_native(coors.copy(), orient, seg_conf, True, 1152)
    assert got is not None
    np.testing.assert_allclose(got, want, atol=1e-9)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_nms_matches_numpy(seed):
    coors, orient, seg_conf = _random_decode(seed, n_lanes=4)
    smooth = smooth_lanes(coors, orient, seg_conf=seg_conf,
                          complete_inner_nodes=True)
    want = polyline_nms(smooth.copy(), seg_conf)
    got = polyline_nms_native(smooth.copy(), seg_conf, 1152)
    assert got is not None
    np.testing.assert_allclose(got, want, atol=1e-9)


def _adversarial_decode(kind, seed, P=72, S=144, img=1152):
    """Tracker/NMS stress geometry (VERDICT r4 #7): crossings, near-parallel
    merges and branches — the configurations real intersections produce and
    uniform-random tracks never do."""
    rng = np.random.RandomState(seed)
    coors = np.full((P, S), -1.0)

    def put(track_cols, r0, r1, p):
        rows = np.arange(r0, r1)
        cols = np.asarray(track_cols)[r0:r1]
        for dp in (0, 1):  # each lane activates two adjacent proposals
            keep = rng.rand(len(rows)) > (0.05 if dp == 0 else 0.55)
            coors[min(p + dp, P - 1), rows[keep]] = np.clip(
                cols[keep] + rng.randn(keep.sum()) * 0.8, 1, img - 2)

    t = np.linspace(0.0, 1.0, S)
    if kind == "crossing":
        a0, a1 = rng.uniform(150, 400), rng.uniform(700, 1000)
        put(a0 + (a1 - a0) * t, 5, S - 5, int(a0 / 16))
        put(a1 + (a0 - a1) * t, 5, S - 5, int(a1 / 16))
    elif kind == "merge":
        base = rng.uniform(400, 700)
        put(np.full(S, base), 0, S, int(base / 16))
        # second lane converges to within ~4 px over the bottom half
        start = base + rng.uniform(60, 120) * rng.choice([-1, 1])
        conv = start + (base + 4.0 - start) * np.clip(t * 2 - 0.2, 0, 1)
        put(conv, 10, S, int(start / 16))
    else:  # branch: shared top, diverging bottoms
        base = rng.uniform(400, 700)
        left = base - np.clip((t - 0.4) * 300, 0, None)
        right = base + np.clip((t - 0.4) * 300, 0, None)
        put(left, 0, S - 3, int(base / 16))
        put(right, 3, S, int(base / 16) + 2)
    orient = rng.randint(0, 11, (S, S)).astype(np.int64)
    seg_conf = rng.rand(S, img)
    return coors, orient, seg_conf


@pytest.mark.parametrize("kind", ["crossing", "merge", "branch"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_adversarial_geometry_parity(kind, seed):
    """Crossing / near-parallel-merge / branch tiles: native tracker+NMS
    stay bit-exact with NumPy on the hard cases, and the pipeline still
    emits at least one lane (no degenerate empty output)."""
    coors, orient, seg_conf = _adversarial_decode(kind, seed)
    want = smooth_lanes(coors.copy(), orient, seg_conf=seg_conf,
                        complete_inner_nodes=True)
    got = smooth_lanes_native(coors.copy(), orient, seg_conf, True, 1152)
    assert got is not None
    np.testing.assert_allclose(got, want, atol=1e-9)

    want_nms = polyline_nms(want.copy(), seg_conf)
    got_nms = polyline_nms_native(got.copy(), seg_conf, 1152)
    assert got_nms is not None
    np.testing.assert_allclose(got_nms, want_nms, atol=1e-9)
    assert (want_nms.max(axis=1) > 0).sum() >= 1


def test_native_faster_than_numpy():
    import time
    coors, orient, seg_conf = _random_decode(7, n_lanes=6)
    t0 = time.perf_counter()
    smooth_lanes(coors.copy(), orient, seg_conf=seg_conf)
    t_np = time.perf_counter() - t0
    t0 = time.perf_counter()
    smooth_lanes_native(coors.copy(), orient, seg_conf, True, 1152)
    t_cc = time.perf_counter() - t0
    assert t_cc < t_np  # native tracker beats the Python loop


def test_uniform_semantics_native_parity():
    """C++ lm_uniform_semantics vs the NumPy reference implementation:
    identical smoothed semantics and identical endpoint pruning."""
    from lanemapping_tpu.native import uniform_semantics_native
    from lanemapping_tpu.decode.postprocess import uniform_semantics

    rng = np.random.RandomState(11)
    for trial in range(8):
        n_line, n_v, img = 12, 144, 1152
        ply = np.full((n_line, n_v, 2), -1.0)
        ply[:, :, 1] = 0.0
        for li in range(rng.randint(2, 8)):
            lo = rng.randint(0, 30)
            hi = rng.randint(n_v - 30, n_v)
            ply[li, lo:hi, 0] = np.clip(
                rng.uniform(30, 1100) + np.cumsum(
                    rng.uniform(-2, 2, hi - lo)), 1, img - 2)
            # noisy semantics with short runs to smooth
            base = rng.randint(1, 3)
            sem = np.full(hi - lo, base)
            for _ in range(rng.randint(0, 6)):
                p = rng.randint(0, hi - lo - 3)
                sem[p:p + rng.randint(1, 4)] = 3 - base
            ply[li, lo:hi, 1] = sem
        ep = np.stack([rng.uniform(0, img - 1, 40),
                       rng.uniform(0, img - 1, 40)], axis=1)
        # some endpoints exactly on lanes (survive), some far (pruned)
        ep[:5, 0] = np.arange(5) * 8 + 3
        ep[:5, 1] = ply[0, np.arange(5), 0]

        endp_map_np = np.zeros((img, img), np.float32)
        pts = ep.astype(int)
        endp_map_np[pts[:, 0], pts[:, 1]] = 1.0
        endp_map_cc = endp_map_np.copy()

        for kle in (False, True):
            em_np = endp_map_np.copy()
            ply_np, em_np = uniform_semantics(ply.copy(), em_np,
                                              r_buff=20, ep=ep.copy(),
                                              keep_line_ends=kle)
            out = uniform_semantics_native(ply.copy(), ep.copy(), r_buff=20,
                                           keep_line_ends=kle)
            assert out is not None, "native library must build"
            ply_cc, keep = out
            em_cc = endp_map_cc.copy()
            dropped = pts[~keep]
            if len(dropped):
                em_cc[dropped[:, 0], dropped[:, 1]] = 0.0

            np.testing.assert_array_equal(ply_cc[:, :, 1], ply_np[:, :, 1])
            np.testing.assert_array_equal(em_cc, em_np)


def test_keep_line_ends_exempts_terminal_endpoints():
    """With keep_line_ends, an endpoint sitting ON a long single-semantic
    line's terminal vertex survives the interior prune while one in the
    middle of the line is still removed (reference mode deletes both —
    `polyline_utils.py:530-536` radius-kills over all vertices)."""
    from lanemapping_tpu.decode.postprocess import uniform_semantics

    n_v, img = 144, 1152
    ply = np.full((1, n_v, 2), -1.0)
    ply[0, :, 0] = 600.0          # full-height straight lane
    ply[0, :, 1] = 1.0            # single semantic -> best run 144 > 130
    # endpoints: at the first vertex, at the last vertex, mid-line
    ep = np.array([[3.0, 600.0], [(n_v - 1) * 8 + 3.0, 600.0],
                   [71 * 8 + 3.0, 600.0]])
    for kle, want in ((False, [0, 0, 0]), (True, [1, 1, 0])):
        endp_map = np.zeros((img, img), np.float32)
        endp_map[ep[:, 0].astype(int), ep[:, 1].astype(int)] = 1.0
        _, em = uniform_semantics(ply.copy(), endp_map, r_buff=20,
                                  ep=ep.copy(), keep_line_ends=kle)
        got = [int(em[int(r), int(c)]) for r, c in ep]
        assert got == want, (kle, got)
