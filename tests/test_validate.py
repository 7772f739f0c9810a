"""Runner.validate end-to-end for both net families."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    from lanemapping_tpu.data.synthetic import generate_dataset
    root = tmp_path_factory.mktemp("synthval")
    generate_dataset(str(root), n_tiles=4, img=192, seed=31)
    return str(root)


def _wire(cfg, root, tmp_path):
    for s in ("train", "val", "test"):
        cfg.dataset[s]["data_root"] = root
    cfg.log_dir = str(tmp_path / "logs")
    return cfg


def test_validate_segmentor(tiny_cfg, synth_root, tmp_path):
    from lanemapping_tpu.engine.runner import Runner

    cfg = _wire(tiny_cfg, synth_root, tmp_path)
    cfg.net = {"type": "Segmentor", "head_type": "seg", "loss_type": "ce"}
    cfg.seg_thre = 0.1
    cfg.endp_thre = 0.1
    for s in ("train", "val", "test"):
        cfg.dataset[s]["type"] = "LaserLane"
    runner = Runner(cfg, log_dir=cfg.log_dir)
    from lanemapping_tpu.data.loader import build_dataloader
    loader = build_dataloader(cfg.dataset.train, cfg, is_train=False)
    m = runner.validate(loader=loader, max_batches=1)
    assert {"seg_f1", "endp_f1", "composite"} <= set(m)
    assert all(0.0 <= m[k] <= 1.0 for k in ("seg_f1", "endp_f1"))


def test_validate_detector_saves_best(tiny_cfg, synth_root, tmp_path):
    import os
    from lanemapping_tpu.engine.runner import Runner
    from lanemapping_tpu.data.loader import build_dataloader

    cfg = _wire(tiny_cfg, synth_root, tmp_path)
    runner = Runner(cfg, log_dir=cfg.log_dir)
    loader = build_dataloader(cfg.dataset.train, cfg, is_train=False)
    m = runner.validate(loader=loader, max_batches=1)
    assert "composite" in m
    # best checkpoint written on first validation
    assert os.path.isdir(os.path.join(cfg.log_dir, "ckpt", "best"))
    assert runner.best_metric == m["composite"]
