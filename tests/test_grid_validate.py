"""Grid metrics + row-head decode + KLane validation branch."""

import numpy as np
import pytest


def test_grid_measures_matches_reference_loop():
    from lanemapping_tpu.utils.metrics import grid_measures

    rng = np.random.RandomState(0)
    label = (rng.rand(64, 64) > 0.9).astype(float)
    pred = (rng.rand(64, 64) > 0.9).astype(float)

    # literal transcription of the reference loop (`metric_utils.py:178-241`)
    TP = FP = FN = 0
    H = label.shape[0]
    for r in range(1, H - 1):
        for c in range(1, H - 1):
            nb = [(0, 0), (0, 1), (0, -1), (-1, 1), (-1, -1), (1, -1),
                  (1, 1), (-1, 0), (1, 0)]
            pe = any(pred[r + dr, c + dc] == label[r, c] for dr, dc in nb)
            le = any(label[r + dr, c + dc] == pred[r, c] for dr, dc in nb)
            if label[r, c] == 1.0:
                if pe:
                    TP += 1
                else:
                    FN += 1
            if pred[r, c] == 1.0 and not le:
                FP += 1
    m = grid_measures(label, pred)
    assert (m["tp"], m["fp"], m["fn"]) == (TP, FP, FN)


def test_decode_row_lanes():
    import jax.numpy as jnp
    from lanemapping_tpu.decode.row_decode import decode_row_lanes

    B, N, S = 2, 3, 16
    rng = np.random.RandomState(1)
    ext = np.zeros((B, N, S, 2), np.float32)
    ext[..., 1] = 1.0  # default: not exist
    cls = rng.dirichlet(np.ones(S), size=(B, N, S)).astype(np.float32)
    # lane 0 of batch 0 exists on all rows
    ext[0, 0, :, 0], ext[0, 0, :, 1] = 1.0, 0.0
    dec = decode_row_lanes({"ext2": jnp.asarray(ext), "cls2": jnp.asarray(cls)},
                           n_lanes=N)
    conf = np.asarray(dec["conf"])
    assert conf[0].sum() == S  # one vertex per row for the existing lane
    assert conf[1].sum() == 0
    cols = np.asarray(dec["cls"])[0, 0].argmax(-1)
    np.testing.assert_array_equal(cols, cls[0, 0].argmax(-1))


@pytest.mark.slow
def test_validate_rowshar_branch(tiny_cfg, tmp_path):
    from lanemapping_tpu.data.synthetic import generate_dataset
    from lanemapping_tpu.engine.runner import Runner
    from lanemapping_tpu.data.loader import build_dataloader

    root = str(tmp_path / "synth")
    generate_dataset(root, n_tiles=4, img=192, seed=41)
    cfg = tiny_cfg
    # the tiny ViT outputs dim/64 = 2 channels; dim_feat must match
    cfg.heads = {
        "type": "RowSharNotReducRef", "dim_feat": 2, "row_size": 24,
        "dim_shared": 32, "dim_token": 64, "tr_heads": 4, "tr_dim_head": 16,
        "tr_mlp_dim": 128, "off_grid": 2, "thr_ext": 0.3, "tr_depth": 1,
    }
    cfg.dataset_type = "LaserLane"
    for s in ("train", "val", "test"):
        cfg.dataset[s]["type"] = "LaserLane"
        cfg.dataset[s]["data_root"] = root
    cfg.log_dir = str(tmp_path / "logs")
    runner = Runner(cfg, log_dir=cfg.log_dir)
    loader = build_dataloader(cfg.dataset.train, cfg, is_train=False)
    m = runner.validate(loader=loader, max_batches=1)
    assert "conf_f1" in m and 0.0 <= m["conf_f1"] <= 1.0

    # and one RowShar training step flows gradients
    import jax
    tl = build_dataloader(cfg.dataset.train, cfg, is_train=True)
    batch = next(iter(tl))
    runner.rng, rng = jax.random.split(runner.rng)
    runner.state, stats = runner._train_step(
        runner.state, runner._device_batch(batch), rng)
    assert np.isfinite(float(stats["loss"]))
