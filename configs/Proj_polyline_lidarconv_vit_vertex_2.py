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

batch_size = 4  # memory-bound (reference `:140-148`)
total_iter = (2904 // 4) * 45
scheduler = dict(T_max=(2904 // 4) * 45)
