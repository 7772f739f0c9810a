"""Raw-LiDAR config end-to-end through the engine (round-1 VERDICT #1).

The reference trains/evals its LidarEncoder config through the same Runner
as the image configs (`/root/reference/baseline/engine/runner.py:139-147`
to_cuda points branch + `net/detector1stage.py:25-34`).  These tests drive
the TPU-native equivalent: `configs/tiny_test_lidar.py` ->
LaserLaneProposalEgo (.las tiles) -> voxelizer -> z-fold encoder ->
correlator -> ColumnProposal2, with training, validation and inference all
through `Runner`.
"""

import os

import jax
import numpy as np
import pytest


@pytest.fixture(scope="module")
def lidar_root(tmp_path_factory):
    from lanemapping_tpu.data.synthetic import generate_dataset
    root = tmp_path_factory.mktemp("synth_lidar")
    generate_dataset(str(root), n_tiles=4, img=192, seed=5, with_points=True)
    return str(root)


@pytest.fixture()
def lidar_cfg(lidar_root, tmp_path):
    from lanemapping_tpu.config.config import Config
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config.fromfile(os.path.join(repo, "configs", "tiny_test_lidar.py"))
    for split in ("train", "val", "test"):
        cfg.dataset[split]["data_root"] = lidar_root
    cfg.log_dir = str(tmp_path / "logs")
    return cfg


@pytest.mark.slow
def test_lidar_runner_trains_with_decreasing_loss(lidar_cfg):
    from lanemapping_tpu.data.loader import build_dataloader
    from lanemapping_tpu.engine.runner import Runner

    runner = Runner(lidar_cfg, log_dir=lidar_cfg.log_dir)
    loader = build_dataloader(lidar_cfg.dataset.train, lidar_cfg,
                              is_train=True)
    losses = []
    for _ in range(3):
        for batch in loader:
            assert batch["points"].shape[1:] == (lidar_cfg.max_points, 4)
            runner.rng, rng = jax.random.split(runner.rng)
            db = runner._device_batch(batch)
            runner.state, stats = runner._train_step(runner.state, db, rng)
            losses.append(float(stats["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_lidar_runner_validate_and_infer(lidar_cfg, tmp_path):
    from lanemapping_tpu.data.loader import build_dataloader
    from lanemapping_tpu.engine.runner import Runner

    runner = Runner(lidar_cfg, log_dir=lidar_cfg.log_dir)
    metrics = runner.validate(epoch=0, max_batches=1)
    assert {"coor_f1", "endp_f1", "composite"} <= set(metrics)
    assert all(np.isfinite(v) for v in metrics.values())

    out_dir = str(tmp_path / "out")
    loader = build_dataloader(lidar_cfg.dataset.test, lidar_cfg,
                              is_train=False)
    runner.infer_and_export(loader, out_dir, max_batches=1)
    jsons = [f for f in os.listdir(out_dir) if f.endswith(".json")]
    assert jsons, "inference must write lane-seq JSONs from raw points"


def test_structured_points_align_with_labels():
    """`lane_structured_points` must place its bright paint returns so that
    the voxel grid, AFTER the LidarEncoder's row flip
    (`models/lidar_encoder.py` "flip rows to match the BEV annotation
    frame", ref `lidarencoder.py:70`), lines up with the tile's label
    pixels — the alignment that makes the LiDAR config learnable."""
    import jax.numpy as jnp
    from lanemapping_tpu.data.label_gen import (render_labels,
                                                select_and_order_lanes)
    from lanemapping_tpu.data.synthetic import (lane_structured_points,
                                                random_lane_seqs)
    from lanemapping_tpu.ops.voxelize import voxelize_mean

    img, grid = 192, (96, 96, 4)
    pc_range = (-15.0, -25.0, -2.0, 15.0, 25.0, 2.0)
    rng = np.random.RandomState(11)
    seqs = random_lane_seqs(rng, img, 5)
    semantics = [int(rng.randint(1, 3)) for _ in seqs]
    seqs, semantics, orients = select_and_order_lanes(
        seqs, semantics, top_k=20, col_range=(0, img))
    maps = render_labels(seqs, semantics, orients, img, img)

    pts = lane_structured_points(seqs, semantics, img, rng, 60000,
                                 pc_range=pc_range)
    # normalise intensity like data/las.load_lidar_points
    inten = (np.clip(pts[:, 3], 800.0, 33000.0) - 800.0) / 33000.0
    pts = np.concatenate([pts[:, :3], inten[:, None]], axis=1)
    vox = voxelize_mean(jnp.asarray(pts, jnp.float32),
                        jnp.ones(len(pts), bool), pc_range, grid)
    # [Z,Y,X,C] -> per-(Y,X)-cell max mean-intensity, then the row flip
    cell = np.asarray(vox[..., 3].max(axis=0))[::-1, :]
    # paint returns are DENSE (~13/cell); the 3% clutter is ~1 bright
    # point/cell and would read as paint under max-over-z — mask cells
    # with <3 bright points so the check isolates the paint geometry
    lo = np.asarray(pc_range[:2])
    size = (np.asarray(pc_range[3:5]) - lo) / 96.0
    bxy = np.floor((pts[pts[:, 3] > 0.5][:, :2] - lo) / size).astype(int)
    bxy = bxy[(bxy >= 0).all(1) & (bxy < 96).all(1)]
    n_b = np.zeros((96, 96))
    np.add.at(n_b, (bxy[:, 1], bxy[:, 0]), 1.0)  # index [iy, ix]
    dense_paint = n_b[::-1, :] >= 3
    bright = (cell > 0.45) & dense_paint  # paint ~0.76, asphalt ~0.07

    lane_px = maps["instance"] > 0
    lane_cell = lane_px.reshape(96, 2, 96, 2).any(axis=(1, 3))
    # dilate by 1 cell: point jitter is ~1.2 px ~ 1 cell
    pad = np.pad(lane_cell, 1)
    dilated = np.zeros_like(lane_cell)
    for dr in (0, 1, 2):
        for dc in (0, 1, 2):
            dilated |= pad[dr:dr + 96, dc:dc + 96]

    n_bright = int(bright.sum())
    assert n_bright > 50, "structured cloud produced no bright paint cells"
    hit = float((bright & dilated).sum()) / n_bright
    assert hit > 0.9, f"only {hit:.2%} of bright cells fall on label lanes"
    # solid lanes are fully covered; dashed lanes ~half -> expect plenty of
    # label cells lit overall
    cover = float((bright & lane_cell).sum()) / lane_cell.sum()
    assert cover > 0.35, f"paint covers only {cover:.2%} of label cells"


def test_add_structured_las_retrofits_existing_root(tmp_path):
    """An image-only dataset root gains a las/ tree rebuilt from its seq
    sidecars, making it drivable by LaserLaneProposalEgo."""
    from lanemapping_tpu.data.las import load_lidar_points
    from lanemapping_tpu.data.synthetic import (add_structured_las,
                                                generate_dataset)
    root = str(tmp_path / "root")
    generate_dataset(root, n_tiles=2, img=192, seed=9)
    n = add_structured_las(root, points_per_tile=5000, seed=1)
    assert n == 2
    las = sorted(os.listdir(os.path.join(root, "las")))
    assert len(las) == 2
    pts = load_lidar_points(os.path.join(root, "las", las[0]))
    assert pts.shape == (5000, 4)
    assert np.isfinite(pts).all()
    # idempotent: existing files are skipped
    assert add_structured_las(root, points_per_tile=5000, seed=1) == 0
