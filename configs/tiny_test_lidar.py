# CPU-runnable miniature of the raw-LiDAR config
# (`Proj_polyline_lidarconv_vit_vertex_2.py`): tiny voxel grid + point
# budget, same LidarEncoder -> correlator -> ColumnProposal2 wiring.
_base_ = ["tiny_test.py"]

use_lidar = True
max_points = 4096
lidar_point_cloud_range = [-15.0, -25.0, -2.0, 15.0, 25.0, 2.0]
grid_size = [96, 96, 4]  # x, y, z cells -> 24x24 encoder output (S=24)

pcencoder = dict(
    _delete_=True,
    type="LidarEncoder",
    Xn=24,
    Yn=24,
    out_channels=64,
    lidar_encoder=dict(
        voxelize=dict(
            point_cloud_range=[-15.0, -25.0, -2.0, 15.0, 25.0, 2.0],
            max_num_points=10,
            grid_shape=[96, 96, 4],
            max_voxels=1000000,
        ),
        backnone=dict(type="SparseEncoder", in_channels=4,
                      output_channels=64),
    ),
)

dataset_type = "LaserLaneProposalEgo"
dataset = dict(
    train=dict(type="LaserLaneProposalEgo"),
    val=dict(type="LaserLaneProposalEgo"),
    test=dict(type="LaserLaneProposalEgo"),
)
