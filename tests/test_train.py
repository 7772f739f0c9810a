"""End-to-end training smoke tests on synthetic tiles (2-device CPU mesh)."""

import os

import jax
import numpy as np
import pytest


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    from lanemapping_tpu.data.synthetic import generate_dataset
    root = tmp_path_factory.mktemp("synth")
    generate_dataset(str(root), n_tiles=4, img=192, seed=3)
    return str(root)


def _patch_cfg_paths(cfg, root, tmp_path):
    for split in ("train", "val", "test"):
        cfg.dataset[split]["data_root"] = root
    cfg.log_dir = str(tmp_path / "logs")
    return cfg


def test_detector_train_steps_decrease_loss(tiny_cfg, synth_root, tmp_path):
    from lanemapping_tpu.engine.runner import Runner
    from lanemapping_tpu.data.loader import build_dataloader

    cfg = tiny_cfg
    _patch_cfg_paths(cfg, synth_root, tmp_path)
    runner = Runner(cfg, log_dir=cfg.log_dir)
    loader = build_dataloader(cfg.dataset.train, cfg, is_train=True)

    losses = []
    for _ in range(3):  # 3 passes over the 2-tile train split
        for batch in loader:
            runner.rng, rng = jax.random.split(runner.rng)
            db = runner._device_batch(batch)
            runner.state, stats = runner._train_step(runner.state, db, rng)
            losses.append(float(stats["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # learning signal flows
    assert int(runner.state.step) == len(losses)


def test_checkpoint_roundtrip(tiny_cfg, synth_root, tmp_path):
    from lanemapping_tpu.engine.runner import Runner
    from lanemapping_tpu.engine.checkpoint import load_model, save_model

    cfg = tiny_cfg
    _patch_cfg_paths(cfg, synth_root, tmp_path)
    cfg.net = {"type": "Segmentor", "head_type": "seg", "loss_type": "ce"}
    cfg.dataset_type = "LaserLane"
    for split in ("train", "val", "test"):
        cfg.dataset[split]["type"] = "LaserLane"
    runner = Runner(cfg, log_dir=cfg.log_dir)

    from lanemapping_tpu.data.loader import build_dataloader
    loader = build_dataloader(cfg.dataset.train, cfg, is_train=True)
    batch = next(iter(loader))
    runner.rng, rng = jax.random.split(runner.rng)
    db = runner._device_batch(batch)
    runner.state, stats = runner._train_step(runner.state, db, rng)
    assert np.isfinite(float(stats["loss"]))

    path = save_model(cfg.log_dir, runner.state, "epoch_1")
    restored = load_model(path, jax.device_get(runner.state))
    a = jax.device_get(runner.state.params)
    b = restored.params
    leaf_a = jax.tree.leaves(a)
    leaf_b = jax.tree.leaves(b)
    assert len(leaf_a) == len(leaf_b)
    for x, y in zip(leaf_a, leaf_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))
