"""Composition roots: Detector1stage / Segmentor.

Parity with `/root/reference/baseline/models/net/detector1stage.py:10-67` and
`net/segmentor.py:14-51`.  These are thin flax modules gluing
pcencoder -> (optional) global correlator -> lane head; losses and decode
live in pure functions (`head_losses.py`, `decode/`), invoked by the engine,
so one traced forward serves both train and inference.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn

from ..registry import (NET, build_backbone, build_heads, build_pcencoder)


class Detector1stage(nn.Module):
    pcencoder: nn.Module
    backbone: Optional[nn.Module]
    heads: nn.Module
    vit_seg: bool = True

    @nn.compact
    def __call__(self, proj, train: bool = False,
                 need_prop_seg: Optional[bool] = None):
        from .lidar_encoder import LidarEncoder
        from .row_head import GridSeg, RowSharNotReducRef

        if isinstance(self.pcencoder, LidarEncoder):
            # raw-point path: `proj` is {"points": [B,N,4], "mask": [B,N]}
            fea, fea_up, bi_seg, endp_est = self.pcencoder(
                proj["points"], train, mask=proj.get("points_mask"))
        else:
            fea, fea_up, bi_seg, endp_est = self.pcencoder(proj, train)
        if self.vit_seg and self.backbone is not None:
            fea = self.backbone(fea, train)
        if isinstance(self.heads, (RowSharNotReducRef, GridSeg)):
            # KLane-style heads consume the correlator features only
            # (reference `detector1stage.py:46-47`)
            out = self.heads(fea, train=train)
        else:
            out = self.heads(fea, fea_up, endp_est, train=train,
                             need_prop_seg=need_prop_seg)
        out["semantic_seg"] = bi_seg
        out["endp_est"] = endp_est
        return out


class Segmentor(nn.Module):
    pcencoder: nn.Module

    @nn.compact
    def __call__(self, proj, train: bool = False, need_prop_seg=None):
        _, _, bi_seg, endp_est = self.pcencoder(proj, train)
        return {"semantic_seg": bi_seg, "endp_est": endp_est}


@NET.register_module(name="Segmentor")
def _build_segmentor(head_type=None, loss_type=None, cfg=None):
    return Segmentor(pcencoder=build_pcencoder(cfg))


@NET.register_module(name="Detector1stage")
def _build_detector1stage(head_type=None, loss_type=None, cfg=None):
    backbone = build_backbone(cfg) if "backbone" in cfg else None
    return Detector1stage(
        pcencoder=build_pcencoder(cfg),
        backbone=backbone,
        heads=build_heads(cfg),
        vit_seg=cfg.get("vit_seg", True),
    )


def build_model(cfg):
    """Build the full net module from a config (reference `runner.py:76`)."""
    from ..registry import build_net
    return build_net(cfg)
