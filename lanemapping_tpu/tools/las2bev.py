"""Offline Las2BEV: raw ``.las`` survey tiles -> BEV intensity PNGs.

The reference ships this as a closed-source C++ preprocessing step — its
README points users at pre-generated ``cropped_tiff`` tiles produced by
"Las2BEV" (`/root/reference/README.md:171-172`); no implementation exists in
the repo.  This is the TPU-native open equivalent: the rasterize + hole-fill
+ intensity-calibration pipeline (`ops.voxelize.bev_image_from_points`) runs
jitted and batched on the accelerator, and tiles are written in the exact
``cropped_tiff`` layout the image datasets load, so a generated directory
drops into any flagship config unchanged.

For streaming inference you usually don't want the PNG intermediate at all:
`tools/stream_map.py --from-las` fuses this same rasterization into the
forward+decode program instead.
"""

from __future__ import annotations

import os
import os.path as osp
import time
from glob import glob
from typing import Dict, List, Optional, Sequence

import numpy as np

DEFAULT_PC_RANGE = (-15.0, -25.0, -2.0, 15.0, 25.0, 2.0)
DEFAULT_GAIN = 0.900
DEFAULT_BIAS = 0.1535


def las2bev_params(cfg=None) -> Dict:
    """Las2BEV knobs from a config's ``las2bev`` dict (all optional):
    ``pc_range``, ``gain``, ``bias``, ``fill_iters``.  The gain/bias defaults
    are calibrated to the synthetic MLS intensity model (see
    `ops.voxelize.bev_image_from_points`); calibrate per sensor for real
    surveys."""
    p = dict(cfg.get("las2bev", {})) if cfg is not None else {}
    p.setdefault("pc_range", cfg.get("lidar_point_cloud_range",
                                     DEFAULT_PC_RANGE)
                 if cfg is not None else DEFAULT_PC_RANGE)
    p.setdefault("gain", DEFAULT_GAIN)
    p.setdefault("bias", DEFAULT_BIAS)
    p.setdefault("fill_iters", 6)
    return p


def convert_las_directory(las_dir: str, out_dir: str, img: int = 1152,
                          pc_range: Sequence[float] = DEFAULT_PC_RANGE,
                          gain: float = DEFAULT_GAIN,
                          bias: float = DEFAULT_BIAS,
                          fill_iters: int = 6,
                          max_points: int = 1 << 19,
                          batch: int = 4,
                          stems: Optional[List[str]] = None) -> Dict:
    """Rasterize every ``.las`` under ``las_dir`` to ``out_dir/<stem>.png``.

    One jitted vmapped program per batch; ragged final batches are padded
    (padding clouds have all-False masks, so they rasterize to pure bias and
    are discarded).  Returns throughput stats.
    """
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ..data.las import load_lidar_points, pad_points
    from ..ops.voxelize import bev_image_from_points

    if stems is None:
        stems = sorted(osp.basename(p)[:-4]
                       for p in glob(osp.join(las_dir, "*.las")))
    if not stems:
        raise FileNotFoundError(f"no .las files under {las_dir}")
    os.makedirs(out_dir, exist_ok=True)

    @jax.jit
    def raster(pts, masks):
        f = lambda p, m: bev_image_from_points(
            p, m, pc_range, img, gain=gain, bias=bias,
            fill_iters=fill_iters)
        return jnp.round(jax.vmap(f)(pts, masks) * 255.0).astype(jnp.uint8)

    n_pts_total, t0 = 0, time.time()
    written = []
    for i in range(0, len(stems), batch):
        chunk = stems[i:i + batch]
        pts = np.zeros((batch, max_points, 4), np.float32)
        msk = np.zeros((batch, max_points), bool)
        for j, stem in enumerate(chunk):
            p = load_lidar_points(osp.join(las_dir, stem + ".las"))
            pts[j], msk[j] = pad_points(p, max_points)
            n_pts_total += min(len(p), max_points)
        tiles = np.asarray(raster(pts, msk))
        for j, stem in enumerate(chunk):
            # replicate to 3 channels: the cropped_tiff convention the image
            # datasets expect (ref `laserlane_proposals.py:85-98`)
            rgb = np.repeat(tiles[j][:, :, None], 3, axis=2)
            path = osp.join(out_dir, stem + ".png")
            Image.fromarray(rgb).save(path)
            written.append(path)
    dt = time.time() - t0
    return {"n_tiles": len(written), "n_points": n_pts_total,
            "wall_s": round(dt, 2),
            "tiles_per_sec": round(len(written) / max(dt, 1e-9), 2),
            "points_per_sec": round(n_pts_total / max(dt, 1e-9), 0),
            "out_dir": out_dir, "written": written}
