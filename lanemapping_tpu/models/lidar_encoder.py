"""Raw-point BEV encoder (TPU-native LidarEncoder).

Functional parity with the reference LiDAR path
(`/root/reference/baseline/models/pcencoder/lidarencoder.py:13-129` +
config `configs/Proj_polyline_lidarconv_vit_vertex_2.py:28-52`), re-designed
for TPU:

  * mmdet3d CUDA hard-voxelization + mean reduce -> XLA scatter voxelizer
    (`ops/voxelize.py`), padded static point buffers instead of ragged lists,
  * spconv ``SparseEncoder`` (sparse 3-D conv, CUDA) -> dense 2-D conv stack
    on the z-folded grid: with only 10 z-cells, z folds into channels and the
    whole encoder becomes MXU-shaped NHWC convs (SURVEY.md §2.11),
  * same output contract as PostProjector2: (fea 64@S, fea_up 8@2S,
    bi_seg 3@8S, endp 1@8S).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from typing import Optional

from ..ops.interp import resize_bicubic, resize_bilinear_ac
from ..ops.voxelize import voxelize_bev_zfold
from ..registry import PCENCODER

BN_MOMENTUM = 0.9
BN_EPS = 1e-5


class DenseZFoldEncoder(nn.Module):
    """Dense stand-in for the sparse 3-D encoder: 576^2 x (Z*C) -> 144^2 x 128.

    Channel schedule mirrors the reference SparseEncoder stages
    (16,16,32)/(32,32,64)/(64,64,128)/(128,128) with the two stride-2 stages
    providing the 4x spatial reduction."""

    output_channels: int = 128
    stage_channels: Sequence[int] = (32, 64, 128)

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda name: nn.BatchNorm(use_running_average=not train,
                                         momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                         name=name)
        x = nn.Conv(self.stage_channels[0], (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="stem")(x)
        x = nn.relu(norm("stem_bn")(x))
        for i, ch in enumerate(self.stage_channels):
            stride = 2 if i > 0 else 1
            y = nn.Conv(ch, (3, 3), strides=(stride, stride),
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        name=f"s{i}_conv1")(x)
            y = nn.relu(norm(f"s{i}_bn1")(y))
            y = nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                        name=f"s{i}_conv2")(y)
            y = norm(f"s{i}_bn2")(y)
            if stride != 1 or x.shape[-1] != ch:
                x = nn.Conv(ch, (1, 1), strides=(stride, stride),
                            use_bias=False, name=f"s{i}_proj")(x)
                x = norm(f"s{i}_proj_bn")(x)
            x = nn.relu(x + y)
        x = nn.Conv(self.output_channels, (1, 1), name="out")(x)
        return x


class LidarEncoder(nn.Module):
    Xn: int = 144
    Yn: int = 144
    out_channels: int = 64
    pc_range: Sequence[float] = (-15.0, -25.0, -2.0, 15.0, 25.0, 2.0)
    grid: Sequence[int] = (576, 576, 10)
    backbone_channels: int = 128
    ds_ratio: int = 8
    # reference-exact modes (default: TPU-native choices; see VERDICT r2 #5)
    max_points_per_voxel: Optional[int] = None  # ref: first-10-points mean
    bicubic_upsample: bool = False  # ref: bicubic align_corners=False

    @nn.compact
    def __call__(self, points, train: bool = False, mask=None):
        """points: [B, N, 4] padded (x,y,z,intensity); mask: [B, N] valid.

        Voxelization is ALWAYS the XLA sorted-scatter path: a Pallas
        MXU-contraction alternative was measured 3.8x SLOWER on v5e
        (VOXELIZER_BENCH.json — the one-hot matmul costs O(N*band_rows*W)
        FLOPs that scatter avoids) and is retired to
        `tests/pallas_reference_bev.py` as an interpret-tested oracle.
        """
        if mask is None:
            mask = jnp.ones(points.shape[:2], bool)
        vox_fn = lambda p, m: voxelize_bev_zfold(
            p, m, self.pc_range, self.grid,
            max_points_per_voxel=self.max_points_per_voxel)
        vox = jax.vmap(vox_fn)(points, mask)  # [B,Y,X,Z*C]
        feat = DenseZFoldEncoder(self.backbone_channels,
                                 name="zfold_encoder")(vox, train)
        # flip rows to match the BEV annotation frame (reference `:70`)
        feat = feat[:, ::-1, :, :]
        # reference `:72` upsamples bicubic align_corners=False; the default
        # here is bilinear align-corners (operator matmuls either way)
        if self.bicubic_upsample:
            up = resize_bicubic(feat, self.Yn * 2, self.Xn * 2,
                                align_corners=False)
        else:
            up = resize_bilinear_ac(feat, self.Yn * 2, self.Xn * 2)

        norm = lambda name: nn.BatchNorm(use_running_average=not train,
                                         momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                         name=name)
        up = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                     use_bias=False, name="fea_aligner")(up)
        up = nn.relu(norm("fea_aligner_bn")(up))

        fea = nn.Conv(self.out_channels, (5, 5), strides=(2, 2),
                      padding=[(2, 2), (2, 2)], name="fea_conv")(up)
        fea = nn.relu(norm("fea_conv_bn")(fea))  # [B,S,S,64]

        big = self.Yn * self.ds_ratio
        bi_seg = nn.Conv(3, (1, 1), name="output_layer_binary_seg")(
            nn.relu(up))
        bi_seg = resize_bilinear_ac(bi_seg, big, big)
        endp = nn.Conv(1, (1, 1), name="output_layer_endp")(nn.relu(up))
        endp = resize_bilinear_ac(endp, big, big)
        fea_up = nn.Conv(8, (1, 1), name="output_layer_fea")(up)
        return fea, fea_up, bi_seg, endp


@PCENCODER.register_module(name="LidarEncoder")
def build_lidar_encoder(cfg=None, Xn=144, Yn=144, out_channels=64,
                        lidar_encoder=None, **kw):
    pc_range = tuple(cfg.get("lidar_point_cloud_range",
                             (-15.0, -25.0, -2.0, 15.0, 25.0, 2.0))) \
        if cfg else (-15.0, -25.0, -2.0, 15.0, 25.0, 2.0)
    grid = tuple(cfg.get("grid_size", (576, 576, 10))) if cfg \
        else (576, 576, 10)
    backbone_ch = 128
    if lidar_encoder and "backnone" in lidar_encoder:  # reference key typo
        backbone_ch = lidar_encoder["backnone"].get("output_channels", 128)
    max_ppv = None
    if cfg and cfg.get("ref_exact_voxel_cap", False):
        max_ppv = 10
        if lidar_encoder and "voxelize" in lidar_encoder:
            max_ppv = lidar_encoder["voxelize"].get("max_num_points", 10)
    return LidarEncoder(Xn=Xn, Yn=Yn, out_channels=out_channels,
                        pc_range=pc_range, grid=grid,
                        backbone_channels=backbone_ch,
                        ds_ratio=cfg.get("gt_downsample_ratio", 8)
                        if cfg else 8,
                        max_points_per_voxel=max_ppv,
                        bicubic_upsample=cfg.get(
                            "ref_exact_bicubic_upsample", False)
                        if cfg else False)
