"""Offline global-mapping tool tests (img2pc, merge_lines, io)."""

import json
import os

import numpy as np
import pytest

from lanemapping_tpu.tools.img2pc import (fill_elevation_at,
                                          fit_line_least_squares,
                                          img_seqs_to_pc, quat_rotate)
from lanemapping_tpu.tools.merge_lines import (downsample_seq,
                                               merge_forward, merge_reversed,
                                               merge_tile_files,
                                               principal_direction)
from lanemapping_tpu.utils.io_utils import (load_lane_seq, save_seqs_json,
                                            save_seqs_list)


def test_quat_rotate_z90():
    # 90 deg about +z: (1,0,0) -> (0,1,0)
    q = np.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])
    v = quat_rotate(q, np.array([[1.0, 0.0, 0.0]]))
    np.testing.assert_allclose(v, [[0.0, 1.0, 0.0]], atol=1e-12)


def test_quat_rotate_identity():
    q = np.array([1.0, 0, 0, 0])
    pts = np.random.RandomState(0).randn(5, 3)
    np.testing.assert_allclose(quat_rotate(q, pts), pts, atol=1e-12)


def test_least_squares_line():
    x = np.arange(10, dtype=np.float64)
    y = 2.5 * x + 1.0
    w, b = fit_line_least_squares(x, y)
    assert w == pytest.approx(2.5)
    assert b == pytest.approx(1.0)


def test_fill_elevation():
    img = np.zeros((10, 10, 3), dtype=np.float64)
    img[5, 5, 1] = 40.0
    img[5, 5, 0] = 1.0
    out = fill_elevation_at(img, np.array([[5.0, 7.0]]))
    assert out[5, 7, 1] == pytest.approx(40.0)


def test_img_seqs_to_pc_roundtrip():
    # identity quaternion, simple scale/offset: closed-form expectation
    params = {
        "las_read_offset": [100.0, 200.0, 10.0],
        "las_rotation_trans_quan": [0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0],
        "bev_img_offset": [2.0, 3.0],
        "img_reso": [0.05, 0.05],
        "local_min_ele": 5.0,
        "ele_reso": 0.1,
    }
    img = np.zeros((64, 64, 3))
    img[:, :, 1] = 20.0
    img[:, :, 0] = 1.0
    seqs = np.array([[[10.0, 20.0], [18.0, 20.0], [26.0, 20.0]]])
    pc = img_seqs_to_pc(params, seqs, [3], img)
    np.testing.assert_allclose(pc[0, 0, 0], 10 * 0.05 + 2.0 + 100.0)
    np.testing.assert_allclose(pc[0, 0, 1], 20 * 0.05 + 3.0 + 200.0)
    np.testing.assert_allclose(pc[0, :, 2], 20 * 0.1 + 5.0 + 10.0)


def test_merge_forward_extends():
    base = np.stack([np.arange(10.0), np.zeros(10), np.zeros(10)], axis=1)
    new = np.stack([np.arange(8.0, 18.0), np.zeros(10), np.zeros(10)], axis=1)
    merged, touch = merge_forward(base, new)
    t = merged @ principal_direction(base)
    assert np.all(np.diff(t) >= 0)  # projection-sorted
    assert merged[-1, 0] == pytest.approx(17.0)


def test_merge_reversed_extends_both_ends():
    base = np.stack([np.arange(5.0, 15.0), np.zeros(10), np.zeros(10)], axis=1)
    new = np.stack([np.arange(20.0, 0.0, -1.0), np.zeros(20),
                    np.zeros(20)], axis=1)
    merged = merge_reversed(base, new)
    assert merged[:, 0].min() == pytest.approx(1.0)
    assert merged[:, 0].max() == pytest.approx(20.0)


def test_downsample_spacing():
    seq = np.stack([np.arange(0, 10, 0.1), np.zeros(100), np.zeros(100)],
                   axis=1)
    out = downsample_seq(seq, dist_min=0.6)
    gaps = np.diff(out[:, 0])
    assert gaps.min() > 0.5
    assert len(out) < len(seq)


def test_merge_tile_files_end_to_end(tmp_path):
    # two tiles of one straight lane split at x=10 with a small overlap
    def write(fname, xs):
        seq = np.stack([xs, 0.1 * np.ones_like(xs), np.zeros_like(xs)],
                       axis=1)
        save_seqs_list([seq, seq + np.array([0.0, 50.0, 0.0])],
                       str(tmp_path / fname))

    write("t0.json", np.arange(0.0, 10.5, 0.5))
    write("t1.json", np.arange(9.5, 20.5, 0.5))
    merged = merge_tile_files([str(tmp_path / "t0.json"),
                               str(tmp_path / "t1.json")])
    assert len(merged) == 2  # two lanes, each merged across the tiles
    spans = sorted(m[:, 0].max() - m[:, 0].min() for m in merged)
    assert spans[0] > 19.0


def test_io_roundtrip(tmp_path):
    seqs = [np.random.RandomState(0).rand(6, 3),
            np.random.RandomState(1).rand(4, 3)]
    p = str(tmp_path / "s.json")
    save_seqs_list(seqs, p)
    loaded, lens, init_pts, end_pts = load_lane_seq(p, dim_coor=3)
    assert lens == [6, 4]
    np.testing.assert_allclose(loaded[0, :6], seqs[0])
    np.testing.assert_allclose(init_pts[1], seqs[1][0])


@pytest.mark.slow
def test_stream_map_multichip_cpu_mesh(tmp_path):
    """stream_map shards the tile batch over the 8-device CPU mesh and
    produces per-tile lane JSONs (the inference analogue of the pjit
    training mesh)."""
    import os
    import subprocess
    import sys

    from lanemapping_tpu.data.synthetic import generate_dataset

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = str(tmp_path / "tiles")
    generate_dataset(root, n_tiles=8, img=192, seed=17)
    out = str(tmp_path / "map")
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "stream_map.py"),
         os.path.join(repo, "configs", "tiny_test.py"), root,
         "--out", out, "--split", "infer_only", "--batch", "8",
         "--bench-json", "mesh_shape.data=-1"],
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "data-parallel over 8 devices" in r.stdout
    jsons = os.listdir(os.path.join(out, "lanes_2d"))
    assert len(jsons) == 8, jsons
