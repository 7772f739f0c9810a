# Raw-point LiDAR variant (reference
# `configs/Proj_polyline_lidarconv_vit_vertex_2.py`): voxelized point clouds
# through the z-folded dense encoder instead of BEV PNG + FPN.
_base_ = ["Proj_polyline_fpn_vit_vertex_2.py"]

use_lidar = True
lidar_point_cloud_range = [-15.0, -25.0, -2.0, 15.0, 25.0, 2.0]
grid_size = [576, 576, 10]  # x, y, z cells

pcencoder = dict(
    _delete_=True,
    type="LidarEncoder",
    Xn=144,
    Yn=144,
    out_channels=64,
    lidar_encoder=dict(
        voxelize=dict(
            point_cloud_range=[-15.0, -25.0, -2.0, 15.0, 25.0, 2.0],
            max_num_points=10,
            grid_shape=[576, 576, 10],
            max_voxels=1000000,
        ),
        backnone=dict(  # (key name kept for reference-config compatibility)
            type="SparseEncoder",
            in_channels=4,
            output_channels=128,
        ),
    ),
)

dataset_type = "LaserLaneProposalEgo"
dataset = dict(
    train=dict(type="LaserLaneProposalEgo"),
    val=dict(type="LaserLaneProposalEgo"),
    test=dict(type="LaserLaneProposalEgo"),
)

# Reference trains this variant at batch 4 ("memory-bound", its `:140-148`).
# On v5e the r4 sweep measured batch 8 at 34.9 tiles/s vs 21.1 at batch 4
# (TRAIN_BENCH.json lidar_cells) at 11.35 of 16 GB HBM — the reference's
# memory bound does not apply to the z-folded dense formulation.
batch_size = 8
total_iter = (2904 // batch_size) * 45
scheduler = dict(T_max=total_iter)
