# KLane row-wise baseline (reference
# `configs/Proj28_GFC-T3_RowRef_82_73_laser.py`): FPN + GFC-T + per-lane
# row-sharing head with lane-token refinement.
_base_ = ["Proj_polyline_fpn_vit_vertex_2.py"]

heads = dict(
    _delete_=True,
    type="RowSharNotReducRef",
    dim_feat=8,
    row_size=144,
    dim_shared=512,
    lambda_cls=1.0,
    thr_ext=0.3,
    off_grid=2,
    dim_token=1024,
    tr_depth=1,
    tr_heads=16,
    tr_dim_head=64,
    tr_mlp_dim=2048,
)

conf_thr = 0.5
optimizer = dict(lr=0.0001)
dataset_type = "LaserLane"
dataset = dict(
    train=dict(type="LaserLane"),
    val=dict(type="LaserLane"),
    test=dict(type="LaserLane"),
)
