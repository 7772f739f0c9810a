"""Legacy KLane components: plain ResNet projector + 2-arg Detector net.

Parity with the stale-but-shipped KLane path (reference
`pcencoder/postprojector.py:30-54,383-415` PostProjector/ResNetWrapper,
`net/detector.py:10-81` Detector) used by
`configs/Proj28_GFC-T3_Seg_82_11_laser.py`.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn

from ..registry import NET, PCENCODER, build_backbone, build_heads, \
    build_pcencoder
from .resnet_fpn import BN_EPS, BN_MOMENTUM, RESNET_LAYERS, ResStage


class ResNetProjector(nn.Module):
    """ResNet trunk + 1x1 out conv -> single [B,S,S,C] feature map."""

    resnet: str = "resnet34"
    in_channels: tuple = (64, 128, 256, -1)
    replace_stride_with_dilation: tuple = (False, True, False)
    out_channel: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(use_running_average=not train,
                                         momentum=BN_MOMENTUM,
                                         epsilon=BN_EPS, name=name)
        layers = RESNET_LAYERS[self.resnet]
        chans = list(self.in_channels)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="conv1")(x)
        x = nn.relu(norm("bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        x = ResStage(chans[0], layers[0], stride=1, in_planes=64,
                     name="layer1")(x, train)
        x = ResStage(chans[1], layers[1], stride=2,
                     dilate=self.replace_stride_with_dilation[0],
                     in_planes=chans[0], name="layer2")(x, train)
        if chans[2] > 0:
            x = ResStage(chans[2], layers[2], stride=2,
                         dilate=self.replace_stride_with_dilation[1],
                         in_planes=chans[1], name="layer3")(x, train)
        if chans[3] > 0:
            x = ResStage(chans[3], layers[3], stride=2,
                         dilate=self.replace_stride_with_dilation[2],
                         in_planes=chans[2], name="layer4")(x, train)
        return nn.Conv(self.out_channel, (1, 1), use_bias=False,
                       name="out_conv")(x)


@PCENCODER.register_module(name="PostProjector")
def build_postprojector(cfg=None, resnet="resnet34", pretrained=True,
                        replace_stride_with_dilation=(False, True, False),
                        out_conv=True, in_channels=(64, 128, 256, -1), **kw):
    del pretrained, out_conv
    return ResNetProjector(
        resnet=resnet, in_channels=tuple(in_channels),
        replace_stride_with_dilation=tuple(replace_stride_with_dilation),
        out_channel=cfg.featuremap_out_channel if cfg else 64)


class Detector(nn.Module):
    """Legacy 2-arg net: projector -> correlator -> heads(fea)."""

    pcencoder: nn.Module
    backbone: Optional[nn.Module]
    heads: nn.Module

    @nn.compact
    def __call__(self, proj, train: bool = False, need_prop_seg=None):
        fea = self.pcencoder(proj, train)
        if self.backbone is not None:
            fea = self.backbone(fea, train)
        return self.heads(fea, train=train)


@NET.register_module(name="Detector")
def _build_detector(head_type=None, loss_type=None, cfg=None):
    backbone = build_backbone(cfg) if "backbone" in cfg else None
    return Detector(pcencoder=build_pcencoder(cfg), backbone=backbone,
                    heads=build_heads(cfg))
