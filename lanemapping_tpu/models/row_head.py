"""KLane-baseline heads: RowSharNotReducRef and GridSeg.

Parity with `/root/reference/baseline/models/heads/row_shared_not_reduc_ref.py`
and `heads/grid_seg.py`.  TPU-first re-design of the row head: the reference
keeps 12 separate per-lane conv heads and a data-dependent Python loop that
gathers a +-2-column feature window only for lanes whose mean existence
probability clears a threshold (`row_shared_not_reduc_ref.py:197-231`).  Here

  * the 12 per-lane heads become one batched einsum over a lane axis
    (identical math, one MXU contraction),
  * every lane's window is gathered unconditionally with static shapes, the
    lane correlator runs over all 12 lane tokens, and the refined features
    are scattered back masked by the existence gate — a superset of the
    reference's conditional attention (which also contains an indexing bug at
    `:228`, iterating ``range(idx_h)`` with a stale bound; not reproduced).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.losses import cross_entropy_with_int_labels
from ..registry import HEADS
from .transformer import Transformer

BN_MOMENTUM = 0.9
BN_EPS = 1e-5


class PerLaneConvHead(nn.Module):
    """12 parallel conv1d(k=1) stacks as lane-batched dense layers."""

    n_lanes: int
    in_dim: int
    hidden: int
    out_dim: int

    @nn.compact
    def __call__(self, x, train: bool):
        # x: [B, H, C] shared row tensor -> [B, n_lanes, H, out_dim]
        w1 = self.param("w1", nn.initializers.lecun_normal(),
                        (self.n_lanes, self.in_dim, self.hidden))
        b1 = self.param("b1", nn.initializers.zeros,
                        (self.n_lanes, self.hidden))
        h = jnp.einsum("bhc,ncd->bnhd", x, w1) + b1[None, :, None, :]
        # per-(lane, channel) batch stats == 12 separate BatchNorm1d
        B, N, H, D = h.shape
        h = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, name="bn")(
            h.reshape(B, H, N * D)).reshape(B, N, H, D)
        w2 = self.param("w2", nn.initializers.lecun_normal(),
                        (self.n_lanes, self.hidden, self.out_dim))
        b2 = self.param("b2", nn.initializers.zeros,
                        (self.n_lanes, self.out_dim))
        return jnp.einsum("bnhd,ndo->bnho", h, w2) + b2[None, :, None, :]


class RowSharNotReducRef(nn.Module):
    dim_feat: int = 8
    row_size: int = 144
    dim_shared: int = 512
    n_lanes: int = 12
    lambda_cls: float = 1.0
    thr_ext: float = 0.3
    off_grid: int = 2
    dim_token: int = 1024
    tr_depth: int = 1
    tr_heads: int = 16
    tr_dim_head: int = 64
    tr_mlp_dim: int = 2048

    @nn.compact
    def __call__(self, x, train: bool = False, need_prop_seg=None):
        """x: [B,S,S,F] correlator features -> stage-1/2 ext/cls probs."""
        F_, S, N = self.dim_feat, self.row_size, self.n_lanes
        og = self.off_grid
        B = x.shape[0]
        # row tensor: (c w) flattening per row (reference `:113,177`)
        row_tensor = jnp.transpose(x, (0, 1, 3, 2)).reshape(B, S, F_ * S)

        ext1 = jax.nn.softmax(PerLaneConvHead(
            N, F_ * S, self.dim_shared, 2, name="ext1")(row_tensor, train), -1)
        cls1 = jax.nn.softmax(PerLaneConvHead(
            N, F_ * S, self.dim_shared, S, name="cls1")(row_tensor, train), -1)

        # ---- stage 2: lane-token correlation ------------------------------
        x_pad = jnp.pad(x, ((0, 0), (0, 0), (og, og), (0, 0)))  # [B,S,S+2og,F]
        corr = jnp.argmax(cls1, axis=-1)  # [B,N,S]
        win = corr[..., None] + jnp.arange(2 * og + 1)  # [B,N,S,2og+1] on pad
        rows = jnp.arange(S)[None, None, :, None]
        window = x_pad[jnp.arange(B)[:, None, None, None], rows, win, :]
        # [B,N,S,2og+1,F] -> token per lane, (c h w) order (reference `:135-137`)
        tok_in = jnp.transpose(window, (0, 1, 4, 2, 3)).reshape(
            B, N, F_ * S * (2 * og + 1))
        tok = nn.Dense(self.dim_token, name="to_token")(tok_in)
        emb = self.param("lane_emb", nn.initializers.normal(1.0),
                         (N, self.dim_token))
        tok = tok + emb[None]
        tok = Transformer(self.dim_token, self.tr_depth, self.tr_heads,
                          self.tr_dim_head, self.tr_mlp_dim,
                          name="lane_correlator")(tok, train)
        tok = nn.LayerNorm(name="corr_norm")(tok)
        tok = nn.Dense(F_ * S * (2 * og + 1), name="from_token")(tok)
        refined = tok.reshape(B, N, F_, S, 2 * og + 1).transpose(0, 1, 3, 4, 2)

        # write refined windows back, gated by lane existence (static mask)
        gate = (jnp.mean(ext1[..., 0], axis=-1) > self.thr_ext)  # [B,N]
        upd = jnp.where(gate[:, :, None, None, None], refined, window)
        x_pad2 = x_pad
        for n in range(N):  # 12 static scatters
            x_pad2 = x_pad2.at[jnp.arange(B)[:, None, None],
                               rows[0], win[:, n], :].set(upd[:, n])
        x2 = x_pad2[:, :, og:S + og, :]
        row_tensor2 = jnp.transpose(x2, (0, 1, 3, 2)).reshape(B, S, F_ * S)

        ext2 = jax.nn.softmax(PerLaneConvHead(
            N, F_ * S, self.dim_shared, 2, name="ext2")(row_tensor2, train),
            -1)
        cls2 = jax.nn.softmax(PerLaneConvHead(
            N, F_ * S, self.dim_shared, S, name="cls2")(row_tensor2, train),
            -1)
        return {"ext": ext1, "cls": cls1, "ext2": ext2, "cls2": cls2}


def row_shar_loss(out, batch, n_lanes: int, row_size: int = 144,
                  lambda_cls: float = 1.0):
    """Two-stage CE on softmax probs (reference `:395-438`)."""
    EPS = 1e-12
    label = batch["label"][:, :, :row_size].astype(jnp.int32)  # [B,S,S]
    # per-lane one-hot existence + binary cls maps (reference `:315-331`)
    lane_ids = jnp.arange(n_lanes)[None, :, None, None]
    onehot_map = (label[:, None, :, :] == lane_ids)  # [B,N,S,S]
    line_ext = jnp.sum(onehot_map, axis=-1)  # [B,N,S] pixel counts per row
    ext_oh = jnp.stack([(line_ext == 1), (line_ext == 0)],
                       axis=-1).astype(jnp.float32)
    cls_map = onehot_map.astype(jnp.float32)
    row_mask = ext_oh[..., 0]  # rows where the lane exists exactly once

    def stage(ext_p, cls_p):
        ext_l = -jnp.sum(ext_oh * jnp.log(ext_p + EPS)) / (n_lanes * row_size)
        n_rows = jnp.maximum(jnp.sum(row_mask), 1.0)
        cls_l = -jnp.sum(cls_map * jnp.log(cls_p + EPS)
                         * row_mask[..., None]) * lambda_cls / n_rows
        return ext_l, cls_l

    e1, c1 = stage(out["ext"], out["cls"])
    e2, c2 = stage(out["ext2"], out["cls2"])
    return {"loss": e1 + c1 + e2 + c2,
            "loss_stats": {"ext_loss": e1, "cls_loss": c1,
                           "ext_loss2": e2, "cls_loss2": c2}}


class GridSeg(nn.Module):
    """Grid confidence+class segmentation head (reference `grid_seg.py`)."""

    num_1: int = 1024
    num_2: int = 2048
    num_classes: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False, need_prop_seg=None):
        conf = nn.Conv(self.num_2, (1, 1), name="conf_fc1")(x)
        conf = nn.sigmoid(nn.Conv(1, (1, 1), name="conf_fc2")(conf))
        cls = nn.Conv(self.num_2, (1, 1), name="cls_fc1")(x)
        cls = nn.Conv(self.num_classes, (1, 1), name="cls_fc2")(cls)
        return {"conf": conf[..., 0], "cls": cls}


def grid_seg_loss(out, batch, num_classes: int, dataset_type="LaserLane"):
    """Dice confidence + CE class loss with the 144-flip label formatting
    (reference `grid_seg.py:43-112`)."""
    label = batch["label"][:, :, :144].astype(jnp.int32)
    label = label[:, ::-1, ::-1]  # the reference flips both axes (`:55-56`)
    if dataset_type == "LaserLane":
        conf_lb = (label != 0).astype(jnp.float32)
        cls_lb = jnp.where(label == 0, num_classes - 1, label - 1)
    else:
        conf_lb = (label != 255).astype(jnp.float32)
        cls_lb = jnp.where(label == 255, num_classes - 1, label)
    cls_loss = jnp.mean(cross_entropy_with_int_labels(out["cls"], cls_lb))
    conf = out["conf"].astype(jnp.float32)
    num = 2.0 * jnp.sum(conf * conf_lb)
    den = jnp.sum(conf ** 2) + jnp.sum(conf_lb ** 2) + 1e-6
    conf_loss = 1.0 - num / den
    return {"loss": conf_loss + cls_loss,
            "loss_stats": {"conf": conf_loss, "cls": cls_loss}}


@HEADS.register_module(name="RowSharNotReducRef")
def build_row_shar(cfg=None, dim_feat=8, row_size=144, dim_shared=512,
                   lambda_cls=1.0, thr_ext=0.3, off_grid=2, dim_token=1024,
                   tr_depth=1, tr_heads=16, tr_dim_head=64, tr_mlp_dim=2048,
                   **kw):
    return RowSharNotReducRef(
        dim_feat=dim_feat, row_size=row_size, dim_shared=dim_shared,
        n_lanes=cfg.number_lanes if cfg else 12, lambda_cls=lambda_cls,
        thr_ext=thr_ext, off_grid=off_grid, dim_token=dim_token,
        tr_depth=tr_depth, tr_heads=tr_heads, tr_dim_head=tr_dim_head,
        tr_mlp_dim=tr_mlp_dim)


@HEADS.register_module(name="GridSeg")
def build_grid_seg(cfg=None, num_1=1024, num_2=2048, num_classes=7, **kw):
    return GridSeg(num_1=num_1, num_2=num_2, num_classes=num_classes)


class PixelSeg(nn.Module):
    """Per-pixel class segmentation head.

    The reference's `heads/pixel_seg.py` is a broken 42-line skeleton (its
    `class_predictor` references undefined `num_1`/`num_2`, its lane-map and
    RGB hooks return empty values) that ships registered but unusable.  This
    is the working realisation of its evident intent: a 2-layer 1x1-conv
    per-pixel class predictor over the backbone feature map, CE loss, and
    an argmax class-map decode with the palette visualisation the stub
    sketched (`pixel_seg.py:21-41`).
    """

    num_1: int = 64    # the stub's undefined hidden widths, resolved to
    num_2: int = 128   # the backbone's channel scale
    num_classes: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False, need_prop_seg=None):
        h = nn.Conv(self.num_1, (1, 1), name="cls_fc0")(x)
        h = nn.Conv(self.num_2, (1, 1), name="cls_fc1")(h)
        cls = nn.Conv(self.num_classes, (1, 1), name="cls_fc2")(h)
        return {"cls": cls}


def pixel_seg_loss(out, batch, num_classes: int,
                   dataset_type: str = "LaserLane"):
    """CE over per-pixel class labels, same label formatting as GridSeg
    (the stub predates the conf branch; background folds into the last
    class)."""
    label = batch["label"][:, :, :out["cls"].shape[2]].astype(jnp.int32)
    label = label[:, ::-1, ::-1]
    if dataset_type == "LaserLane":
        cls_lb = jnp.where(label == 0, num_classes - 1, label - 1)
    else:
        cls_lb = jnp.where(label == 255, num_classes - 1, label)
    cls_loss = jnp.mean(cross_entropy_with_int_labels(out["cls"], cls_lb))
    return {"loss": cls_loss, "loss_stats": {"cls": cls_loss}}


# fixed HSV-spread palette for class-map display (`pixel_seg.py:38-41`).
# Kept as numpy: a module-level jnp.array would initialise the XLA backend
# at import time, which breaks jax.distributed.initialize in multi-host
# entrypoints (they import the package before calling initialize)
PIXEL_SEG_PALETTE = np.array(
    [[255, 64, 64], [255, 160, 64], [224, 224, 64], [64, 224, 64],
     [64, 192, 224], [96, 64, 255], [224, 64, 224], [0, 0, 0]],
    np.uint8)


def pixel_seg_decode(out):
    """argmax class map + RGB render (the stub's empty
    `get_lane_map_numpy_with_label` / `get_rgb_img_from_cls_map`)."""
    cls_map = jnp.argmax(out["cls"], axis=-1)
    pal = jnp.asarray(PIXEL_SEG_PALETTE[:out["cls"].shape[-1]])
    n = pal.shape[0]
    rgb = jnp.take(pal, jnp.clip(cls_map, 0, n - 1), axis=0)
    return {"cls_map": cls_map, "rgb": rgb}


@HEADS.register_module(name="PixelSeg")
def build_pixel_seg(cfg=None, num_1=64, num_2=128, num_classes=7, **kw):
    return PixelSeg(num_1=num_1, num_2=num_2, num_classes=num_classes)
