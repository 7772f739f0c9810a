"""Point-cloud voxelization and BEV rasterization, TPU-native.

Replaces the reference's CUDA voxelization stack — mmdet3d
``VoxelizationByGridShape`` + per-voxel mean reduce
(`/root/reference/baseline/models/pcencoder/lidarencoder.py:97-128`) and the
offline Las2BEV intensity rasterizer — with shape-static XLA scatter math.
A Pallas MXU-contraction binning kernel exists (`kernels/bev_rasterize.py`)
but MEASURED SLOWER on v5e (49 vs 189 ms/call at 1M pts, 576x576x10 grid —
VOXELIZER_BENCH.json): XLA's sorted-scatter avoids the one-hot approach's
N*band_rows*width FLOPs, so this scatter path is the measured default
(`use_pallas_voxelizer=False`).

Semantics note: the CUDA hard-voxelizer keeps at most ``max_num_points=10``
points per voxel before the mean (a GPU memory cap, config
`Proj_polyline_lidarconv_vit_vertex_2.py:36-39`); the TPU version averages
ALL points per voxel — a strict superset of the same statistic, with no
ragged buffers to allocate.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def point_voxel_ids(points: jnp.ndarray, pc_range: Sequence[float],
                    grid: Sequence[int]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Linear voxel id per point and an in-range validity mask.

    ``points``: [N, >=3] (x, y, z, ...); ``grid``: (X, Y, Z) cell counts;
    ``pc_range``: (x0, y0, z0, x1, y1, z1).
    """
    X, Y, Z = grid
    lo = jnp.asarray(pc_range[:3], points.dtype)
    hi = jnp.asarray(pc_range[3:], points.dtype)
    size = (hi - lo) / jnp.asarray([X, Y, Z], points.dtype)
    rel = (points[:, :3] - lo) / size
    ix = jnp.floor(rel).astype(jnp.int32)
    valid = jnp.all((ix >= 0) & (ix < jnp.asarray([X, Y, Z])), axis=1)
    ix = jnp.clip(ix, 0, jnp.asarray([X - 1, Y - 1, Z - 1]))
    lin = (ix[:, 2] * Y + ix[:, 1]) * X + ix[:, 0]  # z-major, then y, x
    return lin, valid


def first_k_in_voxel(lin: jnp.ndarray, valid: jnp.ndarray,
                     k: int) -> jnp.ndarray:
    """Mask of points that are among the FIRST ``k`` (in original point
    order) of their voxel — the semantics of mmdet3d's CUDA hard voxelizer
    ``max_num_points`` cap (config
    `Proj_polyline_lidarconv_vit_vertex_2.py:38`): excess points per voxel
    are dropped, not averaged.  A stable sort by voxel id preserves point
    order within each voxel, so rank-in-voxel = position - segment start.
    """
    n = lin.shape[0]
    key = jnp.where(valid, lin, jnp.int32(2 ** 31 - 1))
    order = jnp.argsort(key, stable=True)
    sk = key[order]
    pos = jnp.arange(n, dtype=jnp.int32)
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    # running max of start positions (start positions are increasing)
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_first, pos, 0))
    keep_sorted = (pos - seg_start) < k
    # invalid points share the sentinel key and would leak their first k
    return valid & jnp.zeros((n,), bool).at[order].set(keep_sorted)


def voxelize_mean(points: jnp.ndarray, mask: jnp.ndarray,
                  pc_range: Sequence[float],
                  grid: Sequence[int],
                  max_points_per_voxel: Optional[int] = None) -> jnp.ndarray:
    """Dense per-voxel feature means: [N,C] points -> [Z, Y, X, C].

    ``mask`` marks real points (padding rows excluded).  One scatter-add for
    the sums, one for the counts; XLA:TPU lowers this to its sorted-scatter
    path.

    ``max_points_per_voxel`` (cfg ``ref_exact_voxel_cap``): reproduce the
    reference CUDA hard-voxelizer's first-K-points-per-voxel cap before the
    mean; default (None) averages ALL points — a strict superset of the
    same statistic with no ragged buffers.
    """
    X, Y, Z = grid
    n_voxels = X * Y * Z
    lin, in_range = point_voxel_ids(points, pc_range, grid)
    ok = mask & in_range
    if max_points_per_voxel is not None:
        ok = ok & first_k_in_voxel(lin, ok, max_points_per_voxel)
    w = ok.astype(points.dtype)
    feats = points * w[:, None]
    sums = jnp.zeros((n_voxels, points.shape[1]), points.dtype)
    sums = sums.at[lin].add(feats, mode="drop")
    cnts = jnp.zeros((n_voxels,), points.dtype).at[lin].add(w, mode="drop")
    mean = sums / jnp.maximum(cnts, 1.0)[:, None]
    return mean.reshape(Z, Y, X, points.shape[1])


def voxelize_bev_zfold(points: jnp.ndarray, mask: jnp.ndarray,
                       pc_range: Sequence[float],
                       grid: Sequence[int],
                       max_points_per_voxel: Optional[int] = None
                       ) -> jnp.ndarray:
    """Z-folded BEV feature plane: [Y, X, Z*C].

    The TPU-idiomatic replacement for spconv's sparse 3-D encoder input
    (SURVEY.md §2.11): the shallow z extent (10 cells) folds into channels so
    downstream convs are dense 2-D NHWC, which XLA tiles onto the MXU.
    """
    vox = voxelize_mean(points, mask, pc_range, grid,
                        max_points_per_voxel)  # [Z,Y,X,C]
    Z, Y, X, C = vox.shape
    return jnp.transpose(vox, (1, 2, 0, 3)).reshape(Y, X, Z * C)


def rasterize_bev_intensity(points: jnp.ndarray, mask: jnp.ndarray,
                            pc_range: Sequence[float], img: int,
                            intensity_col: int = 3) -> jnp.ndarray:
    """Point -> BEV mean-intensity image [img, img] (the Las2BEV preprocess,
    reference README.md:171-172).  Row = y bin, col = x bin."""
    lo = jnp.asarray(pc_range[:2], points.dtype)
    hi = jnp.asarray(pc_range[3:5], points.dtype)
    size = (hi - lo) / img
    rel = (points[:, :2] - lo) / size
    ij = jnp.floor(rel).astype(jnp.int32)
    valid = jnp.all((ij >= 0) & (ij < img), axis=1) & mask
    ij = jnp.clip(ij, 0, img - 1)
    lin = ij[:, 1] * img + ij[:, 0]  # row-major (y, x)
    w = valid.astype(points.dtype)
    sums = jnp.zeros((img * img,), points.dtype).at[lin].add(
        points[:, intensity_col] * w, mode="drop")
    cnts = jnp.zeros((img * img,), points.dtype).at[lin].add(w, mode="drop")
    return (sums / jnp.maximum(cnts, 1.0)).reshape(img, img)
