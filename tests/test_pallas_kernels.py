"""Pallas kernel parity tests (interpret mode on CPU)."""

import numpy as np
import pytest


@pytest.mark.slow
def test_bev_bin_sums_matches_scatter():
    import jax.numpy as jnp
    from pallas_reference_bev import bev_bin_sums

    rng = np.random.RandomState(0)
    H = W = 128
    N = 5000
    rows = rng.randint(0, H, N).astype(np.int32)
    cols = rng.randint(0, W, N).astype(np.int32)
    vals = rng.rand(N).astype(np.float32)
    valid = rng.rand(N) > 0.2

    sums, cnts = bev_bin_sums(jnp.asarray(rows), jnp.asarray(cols),
                              jnp.asarray(vals), jnp.asarray(valid),
                              height=H, width=W, band_rows=8, capacity=1024,
                              interpret=True)
    want_s = np.zeros((H, W), np.float64)
    want_c = np.zeros((H, W), np.float64)
    for r, c, v, m in zip(rows, cols, vals, valid):
        if m:
            want_s[r, c] += v
            want_c[r, c] += 1
    np.testing.assert_allclose(np.asarray(sums), want_s, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cnts), want_c, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_pallas_rasterize_matches_xla():
    import jax.numpy as jnp
    from pallas_reference_bev import \
        rasterize_bev_intensity_pallas
    from lanemapping_tpu.ops.voxelize import rasterize_bev_intensity

    rng = np.random.RandomState(1)
    pts = np.concatenate([
        rng.uniform(-1.2, 1.2, (3000, 2)),
        rng.uniform(-1, 1, (3000, 1)),
        rng.uniform(0, 1, (3000, 1)),
    ], axis=1).astype(np.float32)
    mask = np.ones(3000, bool)
    pc_range = (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)
    want = np.asarray(rasterize_bev_intensity(jnp.asarray(pts),
                                              jnp.asarray(mask), pc_range,
                                              img=128)[0])
    got = np.asarray(rasterize_bev_intensity_pallas(
        jnp.asarray(pts), jnp.asarray(mask), pc_range, img=128,
        interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_pallas_zfold_matches_xla():
    import jax.numpy as jnp
    from pallas_reference_bev import voxelize_bev_zfold_pallas
    from lanemapping_tpu.ops.voxelize import voxelize_bev_zfold

    rng = np.random.RandomState(2)
    pts = np.concatenate([
        rng.uniform(-2.2, 2.2, (2000, 1)),
        rng.uniform(-3.2, 3.2, (2000, 1)),
        rng.uniform(-1.2, 1.2, (2000, 1)),
        rng.uniform(0, 1, (2000, 1)),
    ], axis=1).astype(np.float32)
    mask = rng.rand(2000) > 0.1
    pc_range = (-2.0, -3.0, -1.0, 2.0, 3.0, 1.0)
    grid = (128, 16, 4)
    want = np.asarray(voxelize_bev_zfold(jnp.asarray(pts), jnp.asarray(mask),
                                         pc_range, grid))
    got = np.asarray(voxelize_bev_zfold_pallas(
        jnp.asarray(pts), jnp.asarray(mask), pc_range, grid, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_pallas_zfold_nonmultiple_width_matches_xla():
    """The real LiDAR grid is 576 wide (not a 128 multiple): the kernel pads
    the lane axis internally and slices back."""
    import jax.numpy as jnp
    from pallas_reference_bev import voxelize_bev_zfold_pallas
    from lanemapping_tpu.ops.voxelize import voxelize_bev_zfold

    rng = np.random.RandomState(3)
    n = 4000
    pts = np.concatenate([
        rng.uniform(-16, 16, (n, 1)),
        rng.uniform(-26, 26, (n, 1)),
        rng.uniform(-2.2, 2.2, (n, 1)),
        rng.uniform(0, 1, (n, 1)),
    ], axis=1).astype(np.float32)
    mask = rng.rand(n) > 0.1
    pc_range = (-15.0, -25.0, -2.0, 15.0, 25.0, 2.0)
    grid = (576, 16, 10)  # width 576 = 4.5 * 128
    want = np.asarray(voxelize_bev_zfold(jnp.asarray(pts), jnp.asarray(mask),
                                         pc_range, grid))
    got = np.asarray(voxelize_bev_zfold_pallas(
        jnp.asarray(pts), jnp.asarray(mask), pc_range, grid, interpret=True,
        capacity=2048))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
