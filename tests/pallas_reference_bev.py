"""RETIRED Pallas kernel, kept as an interpret-tested oracle (tests only).

Point -> BEV grid binning recast as MXU one-hot contractions.  Measured on
real v5e hardware (VOXELIZER_BENCH.json, round 3): 3.8x SLOWER than the
production XLA sorted-scatter (`ops/voxelize.py`) at 1M points on the
576x576x10 grid.  The loss is structural, not a tuning miss: the one-hot
matmul formulation costs O(N * band_rows * width) FLOPs where scatter costs
O(N log N + cells), and widening the bands to fill the MXU's 128-row systolic
dimension multiplies those wasted FLOPs by the same factor it gains in
occupancy.  Binning is simply not a contraction-shaped op.  The kernel stays
here (not in the package) as a second independent implementation the parity
tests check the production scatter against, and as the record of WHY the
scatter path is the measured default — see ARCHITECTURE.md.

Original target: the reference's ingest stack — mmdet3d's CUDA voxelizer
(`/root/reference/baseline/models/pcencoder/lidarencoder.py:97-128`) and the
offline Las2BEV rasterizer (README.md:171-172).

TPU has no scatter-atomic units, so the kernel recasts binning as MXU
matmuls: points are pre-bucketed into row bands (a single XLA sort), and
each grid program reduces its band with a one-hot contraction

    sums[r, c] = (R ⊙ v) @ C,   R[r,p] = 1[row_p == r],  C[p,c] = 1[col_p == c]

computed column-tile by column-tile in VMEM.  The [band_rows, P] x [P, tile]
products are exactly systolic-array shaped; the one-hot masks are built with
``broadcasted_iota`` compares on the VPU and never touch HBM.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


BANDS_PER_PROG = 8  # Mosaic needs the sublane block dim divisible by 8


def _bin_kernel(rows_ref, cols_ref, vals_ref, sums_ref, cnts_ref, *,
                band_rows: int, width: int, col_tile: int):
    """One grid program = BANDS_PER_PROG row bands.

    rows_ref/cols_ref/vals_ref: [BANDS_PER_PROG, P] band-local rows, columns,
    values (invalid points carry row = -1).  Outputs
    [BANDS_PER_PROG * band_rows, width].
    """
    P = rows_ref.shape[1]
    n_tiles = width // col_tile
    for b in range(BANDS_PER_PROG):
        rows = rows_ref[b, :]
        cols = cols_ref[b, :]
        vals = vals_ref[b, :]
        # [band_rows, P] row one-hot, masked to valid, weighted by value
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (band_rows, P), 0)
        r_onehot = (row_ids == rows[None, :]).astype(jnp.float32)
        r_vals = r_onehot * vals[None, :]
        r0 = b * band_rows
        for t in range(n_tiles):
            col_ids = jax.lax.broadcasted_iota(
                jnp.int32, (P, col_tile), 1) + t * col_tile
            c_onehot = (col_ids == cols[:, None]).astype(jnp.float32)
            # HIGHEST precision: the MXU's default f32 dot rounds through
            # bf16 passes (measured on v5e: 0.06 max-abs error on unit
            # intensity sums); binning must be exact
            sums_ref[r0:r0 + band_rows, t * col_tile:(t + 1) * col_tile] = \
                jnp.dot(r_vals, c_onehot, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            cnts_ref[r0:r0 + band_rows, t * col_tile:(t + 1) * col_tile] = \
                jnp.dot(r_onehot, c_onehot,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)


def _band_points(rows: jnp.ndarray, cols: jnp.ndarray, vals: jnp.ndarray,
                 valid: jnp.ndarray, n_bands: int, band_rows: int,
                 capacity: int):
    """Bucket points into [n_bands, capacity] padded per-band arrays.

    One XLA sort by band id; position-in-band = global rank - band offset.
    Overflowing points beyond ``capacity`` per band are dropped (the
    reference's hard voxelizer drops beyond max_voxels/max_num_points too).
    """
    band = jnp.where(valid, rows // band_rows, n_bands)  # invalid -> overflow
    order = jnp.argsort(band)
    band_s = band[order]
    counts = jnp.bincount(band_s, length=n_bands + 1)
    starts = jnp.concatenate([jnp.zeros((1,), counts.dtype),
                              jnp.cumsum(counts)[:-1]])
    rank = jnp.arange(band.shape[0]) - starts[band_s]
    keep = (band_s < n_bands) & (rank < capacity)
    b_idx = jnp.where(keep, band_s, n_bands - 1)
    r_idx = jnp.where(keep, rank, capacity - 1)

    def scatter(src, fill):
        buf = jnp.full((n_bands, capacity), fill, src.dtype)
        return buf.at[b_idx, r_idx].set(
            jnp.where(keep, src[order], fill), mode="drop")

    return (scatter((rows % band_rows).astype(jnp.int32), jnp.int32(-1)),
            scatter(cols.astype(jnp.int32), jnp.int32(-1)),
            scatter(vals.astype(jnp.float32), jnp.float32(0)))


@functools.partial(jax.jit, static_argnames=("height", "width", "band_rows",
                                             "capacity", "interpret"))
def bev_bin_sums(rows: jnp.ndarray, cols: jnp.ndarray, vals: jnp.ndarray,
                 valid: jnp.ndarray, *, height: int, width: int,
                 band_rows: int = 8, capacity: int = 4096,
                 interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-cell (sum, count) of point values on an [height, width] grid."""
    if height % band_rows != 0:
        raise ValueError(f"height={height} must be divisible by "
                         f"band_rows={band_rows}")
    # round the band count up to a grid-program multiple; padding bands hold
    # no points and their output rows are sliced off
    n_bands = -(-(height // band_rows) // BANDS_PER_PROG) * BANDS_PER_PROG
    hpad = n_bands * band_rows
    b_rows, b_cols, b_vals = _band_points(rows, cols, vals, valid, n_bands,
                                          band_rows, capacity)
    # pad the column axis to a lane-tile multiple (e.g. the 576-wide LiDAR
    # voxel grid -> 640); cols of -1 never match an iota id, so padded
    # columns stay zero and are sliced off below
    pad_w = (-width) % 128
    wpad = width + pad_w
    col_tile = min(wpad, 128)
    kernel = functools.partial(_bin_kernel, band_rows=band_rows, width=wpad,
                               col_tile=col_tile)
    in_spec = pl.BlockSpec((BANDS_PER_PROG, capacity), lambda b: (b, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((BANDS_PER_PROG * band_rows, wpad),
                            lambda b: (b, 0), memory_space=pltpu.VMEM)
    sums, cnts = pl.pallas_call(
        kernel,
        grid=(n_bands // BANDS_PER_PROG,),
        in_specs=[in_spec, in_spec, in_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((hpad, wpad), jnp.float32),
            jax.ShapeDtypeStruct((hpad, wpad), jnp.float32),
        ],
        interpret=interpret,
    )(b_rows, b_cols, b_vals)
    if pad_w or hpad != height:
        sums, cnts = sums[:height, :width], cnts[:height, :width]
    return sums, cnts


def rasterize_bev_intensity_pallas(points: jnp.ndarray, mask: jnp.ndarray,
                                   pc_range, img: int,
                                   intensity_col: int = 3,
                                   interpret: bool = False) -> jnp.ndarray:
    """Pallas-accelerated drop-in for
    `ops.voxelize.rasterize_bev_intensity`."""
    lo = jnp.asarray(pc_range[:2], points.dtype)
    hi = jnp.asarray(pc_range[3:5], points.dtype)
    size = (hi - lo) / img
    rel = (points[:, :2] - lo) / size
    ij = jnp.floor(rel).astype(jnp.int32)
    valid = jnp.all((ij >= 0) & (ij < img), axis=1) & mask
    sums, cnts = bev_bin_sums(ij[:, 1], ij[:, 0], points[:, intensity_col],
                              valid, height=img, width=img,
                              interpret=interpret)
    return sums / jnp.maximum(cnts, 1.0)


def voxelize_bev_zfold_pallas(points: jnp.ndarray, mask: jnp.ndarray,
                              pc_range, grid, interpret: bool = False,
                              capacity: int = 16384):
    """Pallas drop-in for `ops.voxelize.voxelize_bev_zfold`: [Y, X, Z*C].

    Runs one binning pass per (z-slab, feature) pair on the same banded
    buffers; Z and C are small (10 x 4) so the passes batch into a vmap over
    the value channel with the z-slab folded into the row index.

    ``capacity``: max points per 8-row band (VMEM block size trades against
    drop risk — road MLS clouds concentrate in 1-2 z slabs, so bands there
    hold ~N*5/n_bands points; 16384 covers ~2M clustered points on the
    576x576x10 grid at ~2.4 MB of VMEM per input block).
    """
    from lanemapping_tpu.ops.voxelize import point_voxel_ids

    X, Y, Z = grid
    C = points.shape[1]
    lin, in_range = point_voxel_ids(points, pc_range, grid)
    valid = mask & in_range
    zi = lin // (X * Y)
    yi = (lin // X) % Y
    xi = lin % X
    # fold z into the row axis: one tall [Z*Y, X] plane per feature
    rows = zi * Y + yi

    def one_feature(v):
        s, c = bev_bin_sums(rows, xi, v, valid, height=Z * Y, width=X,
                            capacity=capacity, interpret=interpret)
        return s, c

    sums, cnts = jax.vmap(one_feature, in_axes=1, out_axes=0)(points)
    mean = sums / jnp.maximum(cnts, 1.0)  # [C, Z*Y, X]
    mean = mean.reshape(C, Z, Y, X)
    return jnp.transpose(mean, (2, 3, 1, 0)).reshape(Y, X, Z * C)
