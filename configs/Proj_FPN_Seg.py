# Segmentation pretraining config: FPN(ResNet-34) encoder only, CE seg +
# weighted focal endpoint loss.  Mirrors `/root/reference/configs/Proj_FPN_Seg.py`.
import os

seed = 2021
log_dir = "./logs"
view = False
number_lanes = 12
number_orients = 11
flip_label = False
gt_downsample_ratio = 8
is_gt_avai = True
load_from = None
finetune_from = None

net = dict(type="Segmentor", head_type="seg", loss_type="ce")

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

conf_thr = 0.1
exist_thr = 0.2
seg_thre = 0.1
endp_thre = 0.1

optimizer = dict(type="Adam", lr=0.0001)

epochs = 16
batch_size = 6
total_iter = (1132 // batch_size) * epochs
scheduler = dict(type="CosineAnnealingLR", T_max=total_iter)

eval_ep = 1
save_ep = 4

dataset_path = "./data/LaserLane/All"
data_split_file = "data_split-shuffle.json"
dataset_type = "LaserLane"
gt_init_vertex = os.path.join(dataset_path, "labels", "sparse_seq")
init_vertex_dir = None
test = False

dataset = dict(
    train=dict(type=dataset_type, data_root=dataset_path, mode="train"),
    val=dict(type=dataset_type, data_root=dataset_path, mode="valid"),
    test=dict(type=dataset_type, data_root=dataset_path, mode="test"),
)
workers = 12

compute_dtype = "bfloat16"
mesh_shape = dict(data=-1)
