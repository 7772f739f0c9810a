"""Full offline pipeline: infer/export -> BEV->LiDAR lift -> global merge.

Covers the reference's complete post-network flow (SURVEY.md §3.3):
`test_gpu_0.py` lane export -> `coor_img2pc.py` -> `merge_lines.py`.
"""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synth_full(tmp_path_factory):
    from lanemapping_tpu.data.synthetic import generate_dataset
    root = tmp_path_factory.mktemp("synth3d")
    generate_dataset(str(root), n_tiles=3, img=192, seed=21,
                     with_params=True, with_points=True)
    return str(root)


@pytest.mark.slow
def test_infer_export_img2pc_merge(tiny_cfg, synth_full, tmp_path):
    import jax
    from lanemapping_tpu.engine.runner import Runner
    from lanemapping_tpu.data.loader import build_dataloader
    from lanemapping_tpu.tools.img2pc import convert_directory
    from lanemapping_tpu.tools.merge_lines import merge_directory

    cfg = tiny_cfg
    for s in ("train", "val", "test"):
        cfg.dataset[s]["data_root"] = synth_full
    cfg.log_dir = str(tmp_path / "logs")
    runner = Runner(cfg, log_dir=cfg.log_dir)

    loader = build_dataloader(cfg.dataset.train, cfg, is_train=False)
    lanes_dir = str(tmp_path / "lanes")
    runner.infer_and_export(loader, lanes_dir, max_batches=1,
                            write_view=True)
    jsons = [f for f in os.listdir(lanes_dir) if f.endswith(".json")]
    pngs = [f for f in os.listdir(lanes_dir) if f.endswith(".png")]
    assert jsons and pngs

    # the img2pc lift needs the lane seqs keyed like the dataset stems; the
    # exported names use the 11-char prefix, matching the param/tiff stems
    out_pc = convert_directory(lanes_dir,
                               os.path.join(synth_full, "cropped_tiff"),
                               os.path.join(synth_full,
                                            "cropped_tiff_param"),
                               n_workers=1)
    pc_jsons = [f for f in os.listdir(out_pc) if f.endswith(".json")]
    if not pc_jsons:
        pytest.skip("untrained model produced <2 lanes per tile")
    with open(os.path.join(out_pc, pc_jsons[0])) as f:
        recs = json.load(f)
    assert all(len(r["seq"][0]) == 3 for r in recs)  # 3-D vertices

    merged_txt, down_txt = merge_directory(out_pc)
    assert os.path.isfile(merged_txt)


@pytest.mark.slow
def test_resume_latest(tiny_cfg, synth_full, tmp_path):
    import jax
    from lanemapping_tpu.engine.runner import Runner
    from lanemapping_tpu.engine.checkpoint import save_model

    cfg = tiny_cfg
    for s in ("train", "val", "test"):
        cfg.dataset[s]["data_root"] = synth_full
    cfg.log_dir = str(tmp_path / "logs")
    runner = Runner(cfg, log_dir=cfg.log_dir)
    assert not runner.resume_latest()
    state0 = jax.device_get(runner.state)
    save_model(cfg.log_dir, runner.state.replace(step=runner.state.step + 7),
               "epoch_3")
    assert runner.resume_latest()
    assert int(runner.state.step) == int(state0.step) + 7


def test_ego_dataset_with_synthetic_points(tiny_cfg, synth_full):
    from lanemapping_tpu.data.laserlane import LaserLaneProposalEgo

    cfg = tiny_cfg
    ds = LaserLaneProposalEgo(synth_full, mode="train", max_points=4096,
                              cfg=cfg)
    s = ds[0]
    assert s["points"].shape == (4096, 4)
    assert s["points_mask"].any()
    assert 0.0 <= s["points"][:, 3].max() <= 1.0
