"""LiDAR path tests: voxelizer parity, LAS IO, encoder contract."""

import numpy as np
import pytest


def _naive_voxel_mean(pts, mask, pc_range, grid):
    X, Y, Z = grid
    lo = np.asarray(pc_range[:3])
    hi = np.asarray(pc_range[3:])
    size = (hi - lo) / np.asarray([X, Y, Z])
    out = np.zeros((Z, Y, X, pts.shape[1]))
    cnt = np.zeros((Z, Y, X))
    for p, m in zip(pts, mask):
        if not m:
            continue
        ix = np.floor((p[:3] - lo) / size).astype(int)
        if np.any(ix < 0) or np.any(ix >= [X, Y, Z]):
            continue
        out[ix[2], ix[1], ix[0]] += p
        cnt[ix[2], ix[1], ix[0]] += 1
    return out / np.maximum(cnt, 1)[..., None]


def test_voxelize_mean_matches_naive():
    import jax.numpy as jnp
    from lanemapping_tpu.ops.voxelize import voxelize_mean

    rng = np.random.RandomState(0)
    pc_range = (-2.0, -3.0, -1.0, 2.0, 3.0, 1.0)
    grid = (8, 12, 4)
    pts = rng.uniform(-3.5, 3.5, (500, 4)).astype(np.float32)
    mask = rng.rand(500) > 0.1
    got = np.asarray(voxelize_mean(jnp.asarray(pts), jnp.asarray(mask),
                                   pc_range, grid))
    want = _naive_voxel_mean(pts, mask, pc_range, grid)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rasterize_bev_intensity():
    import jax.numpy as jnp
    from lanemapping_tpu.ops.voxelize import rasterize_bev_intensity

    pts = np.array([
        [0.5, 0.5, 0.0, 10.0],
        [0.5, 0.5, 0.0, 20.0],   # same cell -> mean 15
        [-0.9, -0.9, 0.0, 7.0],
        [5.0, 5.0, 0.0, 99.0],   # out of range
    ], np.float32)
    mask = np.ones(4, bool)
    img, cnt = rasterize_bev_intensity(
        jnp.asarray(pts), jnp.asarray(mask),
        (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0), img=4)
    img, cnt = np.asarray(img), np.asarray(cnt)
    assert cnt[3, 3] == 2 and cnt.sum() == 3
    # cell of (0.5, 0.5): col=floor((0.5+1)/0.5)=3, row=3
    assert img[3, 3] == pytest.approx(15.0)
    assert img[0, 0] == pytest.approx(7.0)
    assert img.sum() == pytest.approx(22.0)


def test_las_roundtrip(tmp_path):
    from lanemapping_tpu.data.las import (load_lidar_points, read_las_points,
                                          write_las_points)

    rng = np.random.RandomState(1)
    pts = np.concatenate([
        rng.uniform(-10, 10, (100, 3)),
        rng.uniform(500, 40000, (100, 1)),
    ], axis=1)
    p = str(tmp_path / "t.las")
    write_las_points(p, pts)
    back = read_las_points(p)
    np.testing.assert_allclose(back[:, :3], pts[:, :3], atol=2e-3)
    np.testing.assert_allclose(back[:, 3], pts[:, 3].astype(np.uint16))
    norm = load_lidar_points(p)
    assert norm[:, 3].min() >= 0.0 and norm[:, 3].max() <= 1.0


@pytest.mark.slow
def test_lidar_encoder_contract():
    import jax
    import jax.numpy as jnp
    from lanemapping_tpu.models.lidar_encoder import LidarEncoder

    S = 24
    enc = LidarEncoder(Xn=S, Yn=S, out_channels=16,
                       pc_range=(-15.0, -25.0, -2.0, 15.0, 25.0, 2.0),
                       grid=(4 * S, 4 * S, 10), backbone_channels=32)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(np.concatenate([
        rng.uniform(-14, 14, (1, 2000, 1)),
        rng.uniform(-24, 24, (1, 2000, 1)),
        rng.uniform(-1.9, 1.9, (1, 2000, 1)),
        rng.uniform(0, 1, (1, 2000, 1)),
    ], axis=2).astype(np.float32))
    v = enc.init(jax.random.PRNGKey(0), pts, train=False)
    fea, fea_up, bi_seg, endp = enc.apply(v, pts, train=False)
    assert fea.shape == (1, S, S, 16)
    assert fea_up.shape == (1, 2 * S, 2 * S, 8)
    assert bi_seg.shape == (1, 8 * S, 8 * S, 3)
    assert endp.shape == (1, 8 * S, 8 * S, 1)


@pytest.mark.slow
def test_first_k_in_voxel_matches_loop_oracle():
    """ref_exact_voxel_cap: first-K-in-original-order per voxel (mmdet3d
    hard voxelizer max_num_points semantics)."""
    import jax.numpy as jnp
    from lanemapping_tpu.ops.voxelize import first_k_in_voxel

    rng = np.random.RandomState(0)
    for seed in range(3):
        rng = np.random.RandomState(seed)
        n, k = 500, 3
        lin = rng.randint(0, 40, n).astype(np.int32)
        valid = rng.rand(n) > 0.2
        got = np.asarray(first_k_in_voxel(jnp.asarray(lin),
                                          jnp.asarray(valid), k))
        seen = {}
        want = np.zeros(n, bool)
        for i in range(n):
            if not valid[i]:
                continue
            c = seen.get(lin[i], 0)
            want[i] = c < k
            seen[lin[i]] = c + 1
        np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_voxelize_mean_cap_changes_only_crowded_voxels():
    import jax.numpy as jnp
    from lanemapping_tpu.ops.voxelize import voxelize_mean

    rng = np.random.RandomState(2)
    pts = rng.uniform(-1, 1, (400, 4)).astype(np.float32)
    mask = jnp.ones((400,), bool)
    rng_range = (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)
    grid = (4, 4, 2)
    uncapped = np.asarray(voxelize_mean(jnp.asarray(pts), mask, rng_range,
                                        grid))
    capped_huge = np.asarray(voxelize_mean(jnp.asarray(pts), mask, rng_range,
                                           grid, max_points_per_voxel=1000))
    np.testing.assert_allclose(capped_huge, uncapped, rtol=1e-6)
    capped = np.asarray(voxelize_mean(jnp.asarray(pts), mask, rng_range,
                                      grid, max_points_per_voxel=2))
    assert not np.allclose(capped, uncapped)  # 400 pts in 32 voxels: crowded


def test_bicubic_resize_matches_torch():
    """ref_exact_bicubic_upsample: operator-matmul bicubic equals
    F.interpolate(mode='bicubic', align_corners=False) (reference
    `lidarencoder.py:72`)."""
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F
    from lanemapping_tpu.ops.interp import resize_bicubic

    rng = np.random.RandomState(3)
    x = rng.randn(2, 36, 36, 5).astype(np.float32)
    got = np.asarray(resize_bicubic(jnp.asarray(x), 72, 72,
                                    align_corners=False))
    want = F.interpolate(torch.tensor(x).permute(0, 3, 1, 2), size=(72, 72),
                         mode="bicubic", align_corners=False)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_lidar_encoder_ref_exact_flags_forward(tiny_lidar_cfg=None):
    """Both ref-exact flags produce a working forward with the same output
    contract."""
    import jax
    import jax.numpy as jnp
    from lanemapping_tpu.models.lidar_encoder import LidarEncoder

    enc = LidarEncoder(Xn=12, Yn=12, out_channels=8, grid=(48, 48, 4),
                       backbone_channels=16, max_points_per_voxel=10,
                       bicubic_upsample=True)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(np.concatenate([
        rng.uniform(-14, 14, (1, 2000, 1)),
        rng.uniform(-24, 24, (1, 2000, 1)),
        rng.uniform(-1.5, 1.5, (1, 2000, 1)),
        rng.uniform(0, 1, (1, 2000, 1))], axis=2).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), pts, False)
    fea, fea_up, bi_seg, endp = enc.apply(variables, pts, False)
    assert fea.shape == (1, 12, 12, 8)
    assert bi_seg.shape == (1, 96, 96, 3)
    for a in (fea, fea_up, bi_seg, endp):
        assert np.all(np.isfinite(np.asarray(a)))
