"""KLane grid-head lane export + view drivers (reference ``infer_lane``,
`engine/runner.py:473-604`): `tools/infer.py --save-lanes` must produce lane
JSONs and overlay/grid PNGs for RowSharNotReducRef and GridSeg configs —
the round-4 gap where row-head outputs crashed the ColumnProposal decode."""

import json
import os

import numpy as np
import pytest


def test_row_lane_maps_single_lane():
    """A clean single-lane grid prediction survives smoothing and lands at
    the reference's column mapping col/S*1152 + 4 (`:507-509`)."""
    from lanemapping_tpu.config.config import Config
    from lanemapping_tpu.decode.row_decode import row_lane_maps

    S, N = 24, 3
    cls_maps = np.zeros((1, N + 1, S, S), np.float32)
    col = 10
    cls_maps[0, 1, :, col] = 1.0  # lane id 1 occupies column 10 on all rows
    cls_maps[0, N] = cls_maps[0, :N].max(axis=0)
    cfg = Config(dict(number_lanes=N))
    maps = row_lane_maps({"cls": cls_maps}, cfg, "RowSharNotReducRef")
    ply = maps["cls_offset_smooth"]
    assert ply.shape == (1, N, S, 2)
    rows = np.nonzero(ply[0, :, :, 0] > 0)
    assert len(rows[0]) >= S - 2  # nearly every anchor kept by the tracker
    expect = col / S * 1152.0 + 4.0
    got = ply[0][ply[0, :, :, 0] > 0]
    assert np.all(np.abs(got[:, 0] - expect) < 8.5)  # within one 8px cell
    assert np.all(got[:, 1] == 1.0)  # KLane semantics export as solid
    assert maps["cls_idx"].shape == (1, S, S)


def _mk_runner(tiny_cfg, tmp_path, heads, dataset="LaserLane"):
    from lanemapping_tpu.data.synthetic import generate_dataset
    from lanemapping_tpu.engine.runner import Runner
    from lanemapping_tpu.data.loader import build_dataloader

    root = str(tmp_path / "synth")
    generate_dataset(root, n_tiles=4, img=192, seed=43)
    cfg = tiny_cfg
    cfg.heads = heads
    cfg.dataset_type = dataset
    for s in ("train", "val", "test"):
        cfg.dataset[s]["type"] = dataset
        cfg.dataset[s]["data_root"] = root
    cfg.log_dir = str(tmp_path / "logs")
    runner = Runner(cfg, log_dir=cfg.log_dir)
    loader = build_dataloader(cfg.dataset.test, cfg, is_train=False)
    return runner, loader


@pytest.mark.slow
@pytest.mark.parametrize("head_type", ["RowSharNotReducRef", "GridSeg"])
def test_infer_grid_and_export(tiny_cfg, tmp_path, head_type):
    if head_type == "RowSharNotReducRef":
        heads = {
            "type": "RowSharNotReducRef", "dim_feat": 2, "row_size": 24,
            "dim_shared": 32, "dim_token": 64, "tr_heads": 4,
            "tr_dim_head": 16, "tr_mlp_dim": 128, "off_grid": 2,
            "thr_ext": 0.3, "tr_depth": 1,
        }
    else:
        heads = {"type": "GridSeg", "num_1": 16, "num_2": 32,
                 "num_classes": 7}
    runner, loader = _mk_runner(tiny_cfg, tmp_path, heads)
    out_dir = str(tmp_path / "export")
    runner.infer_grid_and_export(loader, out_dir, max_batches=1,
                                 write_view=True)
    jsons = [f for f in os.listdir(out_dir) if f.endswith(".json")]
    overlays = [f for f in os.listdir(out_dir) if f.endswith("_overlay.png")]
    grids = [f for f in os.listdir(out_dir) if f.endswith("_grid.png")]
    assert jsons and overlays and grids
    with open(os.path.join(out_dir, jsons[0])) as f:
        recs = json.load(f)
    for rec in recs:  # may be empty on random weights; check the schema
        assert {"lane_id", "seq", "init_vertex", "end_vertex"} <= set(rec)
