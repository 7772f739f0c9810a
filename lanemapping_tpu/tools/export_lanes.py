"""Per-tile lane-seq JSON export (feeds the offline global-mapping tools).

Parity with the reference's ``write_lane_vertex`` path
(`/root/reference/baseline/engine/runner.py:823-828`,
`baseline/utils/io_utils.py:58-93`): one JSON per tile with per-vertex
(row, col, semantic) records.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def lane_records(ply: np.ndarray, row_anchor_stride: int = 8,
                 row_anchor_offset: int = 3):
    """[P,S,2] (col, semantic) -> list of lane dicts with 3-D-liftable verts."""
    recs = []
    for li in range(len(ply)):
        rows = np.nonzero(ply[li, :, 0] > 0)[0]
        if len(rows) < 2:
            continue
        verts = [[int(r * row_anchor_stride + row_anchor_offset),
                  float(ply[li, r, 0]), int(ply[li, r, 1])] for r in rows]
        recs.append({
            "lane_id": int(li),
            "seq_len": len(verts),
            "init_vertex": verts[0][:2],
            "end_vertex": verts[-1][:2],
            "seq": verts,
        })
    return recs


def export_lane_seqs(runner, loader, out_dir: str, max_batches=None):
    from ..decode.postprocess import lane_maps_from_decode

    os.makedirs(out_dir, exist_ok=True)
    for i, batch in enumerate(loader):
        if max_batches is not None and i >= max_batches:
            break
        # one fused jitted forward+decode dispatch (see Runner._eval_decode)
        dec = jax.device_get(runner._eval_decode(runner.state,
                                                 runner._eval_input(batch)))
        maps = lane_maps_from_decode(dec, runner.cfg)
        names = batch.get("image_name",
                          [f"b{i}_{j}" for j in range(len(batch["proj"]))])
        for j, name in enumerate(names):
            recs = lane_records(maps["cls_offset_smooth"][j])
            with open(os.path.join(out_dir, f"{name}.json"), "w") as f:
                json.dump(recs, f)
