# Flagship config: FPN(ResNet-34) encoder + GFC-T (ViT) correlator +
# ColumnProposal2 lane decoder.  Mirrors the reference experiment
# `/root/reference/configs/Proj_polyline_fpn_vit_vertex_2.py` key-for-key.
import os

seed = 2021
log_dir = "./logs"
view = False
number_lanes = 12
number_orients = 11
gt_downsample_ratio = 8
flip_label = False
use_lidar = False
is_gt_avai = True
load_from = None
finetune_from = None

net = dict(type="Detector1stage", head_type="row", loss_type="row_ce")

pcencoder = dict(
    type="PostProjector2",
    resnet="resnet34",
    pretrained=True,
    replace_stride_with_dilation=[False, True, False],
    out_conv=True,
    in_channels=[64, 128, 256, -1],
)

featuremap_out_channel = 64
list_img_size_xy = [1152, 1152]

backbone = dict(
    type="VitSegNet",
    image_size=144,
    patch_h_size=8,
    patch_w_size=8,
    channels=64,
    dim=512,
    depth=3,
    heads=16,
    output_channels=8,
    expansion_factor=4,
    dim_head=64,
    dropout=0.0,
    emb_dropout=0.0,
    is_with_shared_mlp=False,
)

heads = dict(
    type="ColumnProposal2",
    dim_feat=8,
    row_size=144,
    dim_shared=100,
    num_prop=72,
    prop_width=2,
    prop_half_buff=4,
    endp_mode="endp_est",
    cls_exp=True,
    ext_w=3.0,
    ext_smooth_w=1.0,
    lambda_cls=1.0,
    mean_loss_w=1.0,
    cls_smooth_loss_w=10,
    orient_w=1.0,
    endp_loss_w=10.0,
    offset_w=1.0,
)

proposal_obj_thre = 0.3
exist_thre = 0.2
coor_thre = 0.2
endp_thre = 0.08
# Endpoint-decode defaults set by measurement (ENDP_SWEEP.json, converged
# ckpt): radius 10 beats the reference's 20 (+0.0008 endp F1), and exempting
# a line's terminal zone from the interior-endpoint prune (the reference
# radius-kills its own line ends, `polyline_utils.py:530-536`) is worth
# +0.020 endp F1 at zero coor/semantic cost.  The remaining gap to the
# `ref_exact_occupancy_filter` transcription (+0.043 endp) is polyline
# FRAGMENTATION inflating endpoint recall while degrading coor/semantic —
# kept off.  Score threshold measured a no-op (0.0/0.08/0.3/0.5 identical).
endp_cluster_r = 10.0
endp_keep_line_ends = True
show_result = False
view_detail = False

# Reference lr is 1.5e-4 at batch 6 (its config :117).  With the batch-8
# default the round-5 lr sweep (LR_SWEEP.json, 16-epoch soak protocol)
# measured composite 0.936 @ 1.5e-4 vs 0.9412 @ 2.1e-4 (sqrt(2)-scaled),
# recovering half the batch-4->8 regression at the same 2.3x training
# speed; 2.1e-4 ships.  See ARCHITECTURE.md "Round 5: the lr-scaling
# sweep" for the step-count analysis of the residual gap.
optimizer = dict(type="Adam", lr=0.00021)

epochs = 45
# Reference trains batch 6 (its config :123).  The TPU sweep
# (TRAIN_BENCH.json, v5e) measured s/step FLAT from batch 4 to 8 — at
# small batch the many 144px stages under-occupy the chip — so batch 8
# is ~2x train throughput for free: 0.200 s/step = 40 tiles/s, 10.3 GB
# HBM high-water (no remat needed at this size; remat=True costs ~11%
# and only matters for batch >=16).
batch_size = 8
train_compute_dtype = "bfloat16"
total_iter = (2904 // batch_size) * epochs
scheduler = dict(type="CosineAnnealingLR", T_max=total_iter)

eval_ep = 1
save_ep = 5
validate_buffer = 10

dataset_path = "./data/LaserLane/TrainValAll"
data_split_file = "data_split-shuffle.json"
dataset_type = "LaserLaneProposal"
dataset_color_augment = False
gt_init_vertex = os.path.join(dataset_path, "labels", "sparse_seq")
init_vertex_dir = None
test = False

dataset = dict(
    train=dict(type=dataset_type, data_root=dataset_path,
               data_split_file=data_split_file, mode="train"),
    val=dict(type=dataset_type, data_root=dataset_path,
             data_split_file=data_split_file, mode="valid"),
    test=dict(type=dataset_type, data_root=dataset_path,
              data_split_file=data_split_file, mode="test"),
)
workers = 12

# ablation flags (consumed by models/engine)
vit_seg = True
column_att = False
column_transformer_decoder = False
spatial_att = True
cls_smooth = False

# TPU-specific knobs
compute_dtype = "bfloat16"
mesh_shape = dict(data=-1)  # -1: all available devices on the data axis
