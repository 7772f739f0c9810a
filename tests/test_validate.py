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


@pytest.mark.slow
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


def test_semantic_f1_per_class_sees_solid_dashed_confusion():
    """Per-class semantic F1 (reference `eval_metric_line_segmentor`
    with `bi_seg=False`, `metric_utils.py:443-481`): identical geometry with
    swapped solid/dashed classes must score ~0, unlike the old all-positive
    KD-tree approximation which scored it 1.0."""
    from lanemapping_tpu.utils.metrics import eval_metric_line_segmentor

    gt = np.zeros((64, 64), np.uint8)
    gt[10:50, 20] = 1   # solid lane
    gt[10:50, 44] = 2   # dashed lane
    right = gt.copy()
    swapped = np.where(gt == 1, 2, np.where(gt == 2, 1, 0)).astype(np.uint8)

    m_right = eval_metric_line_segmentor(right, gt, bi_seg=False,
                                         semantics=2, buffer_px=10)
    m_swap = eval_metric_line_segmentor(swapped, gt, bi_seg=False,
                                        semantics=2, buffer_px=10)
    assert m_right["f1"] > 0.95
    assert m_swap["f1"] < 0.05


def test_validate_lanes_reports_semantic_f1(tiny_cfg, synth_root, tmp_path):
    from lanemapping_tpu.engine.runner import Runner
    from lanemapping_tpu.data.loader import build_dataloader

    cfg = _wire(tiny_cfg, synth_root, tmp_path)
    runner = Runner(cfg, log_dir=cfg.log_dir)
    loader = build_dataloader(cfg.dataset.test, cfg, is_train=False)
    m = runner.validate(loader=loader, max_batches=1)
    assert {"semantic_f1", "semantic_acc", "semantic_recall"} <= set(m)
    assert 0.0 <= m["semantic_f1"] <= 1.0


@pytest.mark.slow
def test_segmentor_export_driver(tiny_cfg, synth_root, tmp_path):
    """Reference `infer_lane_geometry_segmentation_segmentor`
    (`runner.py:945-1036`): accumulated coor/semantic conf F1 + seg and
    skeleton display PNGs."""
    import os
    from lanemapping_tpu.engine.runner import Runner
    from lanemapping_tpu.data.loader import build_dataloader

    cfg = _wire(tiny_cfg, synth_root, tmp_path)
    cfg.net = {"type": "Segmentor", "head_type": "seg", "loss_type": "ce"}
    cfg.seg_thre = 0.1
    for s in ("train", "val", "test"):
        cfg.dataset[s]["type"] = "LaserLane"
    runner = Runner(cfg, log_dir=cfg.log_dir)
    loader = build_dataloader(cfg.dataset.test, cfg, is_train=False)
    out_dir = str(tmp_path / "segout")
    m = runner.infer_segmentor_and_export(loader, out_dir, max_batches=1,
                                          write_view=True)
    assert {"coor_conf_f1", "semantic_conf_f1",
            "coor_conf_prec", "semantic_conf_rec"} <= set(m)
    assert all(np.isfinite(v) for v in m.values())
    pngs = os.listdir(out_dir)
    assert any(p.endswith("_segmentor.png") for p in pngs)
    assert any(p.endswith("_seg_skeleton.png") for p in pngs)


@pytest.mark.slow
def test_get_lane_map_on_source_image_surface(tiny_cfg, synth_root, tmp_path):
    """Full pred_maps dict (reference
    `polyline_fpn_vit_vertex_2.py:926-1083`), incl. view_detail variants."""
    import jax
    from lanemapping_tpu.engine.runner import Runner
    from lanemapping_tpu.data.loader import build_dataloader
    from lanemapping_tpu.decode.lane_decode import decode_lanes
    from lanemapping_tpu.decode.postprocess import lane_maps_from_decode
    from lanemapping_tpu.utils.vis_utils import get_lane_map_on_source_image

    cfg = _wire(tiny_cfg, synth_root, tmp_path)
    cfg.view_detail = True
    runner = Runner(cfg, log_dir=cfg.log_dir)
    loader = build_dataloader(cfg.dataset.test, cfg, is_train=False)
    batch = next(iter(loader))
    out = runner._eval_step(runner.state, runner._eval_input(batch))
    dec = jax.device_get(decode_lanes(out, cfg))
    maps = lane_maps_from_decode(dec, cfg)
    pm = get_lane_map_on_source_image(maps, batch, cfg, dec=dec)
    B = len(batch["proj"])
    img = cfg.list_img_size_xy[0]
    P, S = cfg.heads.num_prop, cfg.heads.row_size
    for key in ("source_img_gray", "gt_on_img", "pred_bi_seg_on_image",
                "pred_offset_lanes_on_image", "pred_org_lanes_on_image",
                "pred_smooth_lanes_on_image", "pred_exp_lanes_on_image"):
        assert len(pm[key]) == B, key
        assert pm[key][0].shape == (img, img, 3), key
        assert pm[key][0].dtype == np.uint8, key
    assert pm["pred_smooth_lane_vertex"][0].shape == (P, S, 3)
