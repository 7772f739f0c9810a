"""Config-system behaviour (reference `baseline/utils/config.py` semantics)."""

import os
import textwrap

from lanemapping_tpu.config.config import Config, parse_dict_action

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_fromfile_flagship():
    cfg = Config.fromfile(os.path.join(REPO, "configs",
                                       "Proj_polyline_fpn_vit_vertex_2.py"))
    assert cfg.heads.num_prop == 72
    assert cfg.backbone.type == "VitSegNet"
    # 2.1e-4 = sqrt(2) x the reference's 1.5e-4, rescaled for the batch-8
    # default by the round-5 lr sweep (LR_SWEEP.json)
    assert cfg.optimizer.lr == 0.00021
    # batch 8 by measurement (TRAIN_BENCH.json r4 sweep); reference uses 6
    assert cfg.batch_size == 8
    assert cfg.total_iter == (2904 // cfg.batch_size) * 45


def test_base_inheritance():
    cfg = Config.fromfile(os.path.join(REPO, "configs", "tiny_test.py"))
    # overridden
    assert cfg.heads.row_size == 24
    assert cfg.backbone.dim == 128
    # inherited through _base_
    assert cfg.heads.type == "ColumnProposal2"
    assert cfg.heads.prop_width == 2
    assert cfg.backbone.type == "VitSegNet"
    assert cfg.number_lanes == 12


def test_merge_from_dict_and_dictaction(tmp_path):
    p = tmp_path / "c.py"
    p.write_text(textwrap.dedent("""
        a = 1
        opt = dict(lr=0.1, sched=dict(kind='cos'))
    """))
    cfg = Config.fromfile(str(p))
    cfg.merge_from_dict(parse_dict_action(["opt.lr=0.5", "opt.sched.kind=lin",
                                           "b=hello"]))
    assert cfg.opt.lr == 0.5
    assert cfg.opt.sched.kind == "lin"
    assert cfg.b == "hello"
    assert cfg.a == 1


def test_dataset_path_override_propagates():
    cfg = Config.fromfile(os.path.join(REPO, "configs",
                                       "Proj_polyline_fpn_vit_vertex_2.py"))
    cfg.merge_from_dict(parse_dict_action(["dataset_path=/data/elsewhere"]))
    assert cfg.dataset.train.data_root == "/data/elsewhere"
    assert cfg.dataset.test.data_root == "/data/elsewhere"


def test_delete_key(tmp_path):
    base = tmp_path / "base.py"
    base.write_text("m = dict(type='A', x=1)\n")
    child = tmp_path / "child.py"
    child.write_text("_base_ = ['base.py']\nm = dict(_delete_=True, type='B')\n")
    cfg = Config.fromfile(str(child))
    assert cfg.m.type == "B"
    assert "x" not in cfg.m
