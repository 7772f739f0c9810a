# KLane grid-segmentation variant (reference
# `configs/Proj28_GFC-T3_Seg_82_11_laser.py`): legacy ResNet projector +
# GFC-T with shared-MLP expansion + GridSeg head.
_base_ = ["Proj_polyline_fpn_vit_vertex_2.py"]

net = dict(type="Detector", head_type="seg", loss_type="ce")

pcencoder = dict(
    _delete_=True,
    type="PostProjector",
    resnet="resnet34",
    pretrained=True,
    replace_stride_with_dilation=[False, True, False],
    out_conv=True,
    in_channels=[64, 128, 256, -1],
)

backbone = dict(
    _delete_=True,
    type="VitSegNet",
    image_size=144,
    patch_h_size=8,
    patch_w_size=8,
    channels=64,
    dim=512,
    depth=3,
    heads=16,
    output_channels=1024,
    expansion_factor=4,
    dim_head=64,
    is_with_shared_mlp=True,
)

heads = dict(
    _delete_=True,
    type="GridSeg",
    num_1=1024,
    num_2=2048,
    num_classes=13,  # 12 lanes + background
)

conf_thr = 0.3
dataset_type = "LaserLane"
dataset = dict(
    train=dict(type="LaserLane"),
    val=dict(type="LaserLane"),
    test=dict(type="LaserLane"),
)
batch_size = 4
epochs = 60
total_iter = (7687 // 4) * 60
scheduler = dict(T_max=(7687 // 4) * 60)
