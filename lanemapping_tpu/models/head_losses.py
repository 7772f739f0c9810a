"""Training losses, as pure functions over the raw-output / batch dicts.

The reference computes losses inside module methods
(`/root/reference/baseline/models/heads/polyline_fpn_vit_vertex_2.py:446-600`,
`pcencoder/postprojector.py:84-109`).  Here they are standalone jit-traceable
functions so the same model apply can serve train and eval, and so every
masked "fancy-index then reduce" becomes a static-shape masked reduction
(XLA cannot trace data-dependent gathers of unknown size).

Every term reproduces the reference's reduction and normalisation exactly,
including its quirks (e.g. the semantic-seg term is normalised by pixel
count but NOT by batch, `:572`).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..ops.interp import _interp_matrix_np
from ..ops.losses import (cross_entropy_with_int_labels, optax_sigmoid_ce,
                          sigmoid_focal_loss, smooth_l1)

EPS = 1e-12


def _heatmap_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Endpoint heatmaps may ship as their original PNG uint8 (see
    Runner._U8_ROUNDTRIP); /255 here is bit-identical to the host float
    path."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x.astype(jnp.float32)


def _fused_prop_seg_focal(seg_win: jnp.ndarray, inst_m: jnp.ndarray,
                          best: jnp.ndarray, pos: jnp.ndarray,
                          hp) -> jnp.ndarray:
    """Per-proposal seg-focal term WITHOUT materialising [B,P,8S,8W].

    Numerically the same computation as upsampling the native-resolution
    per-proposal seg logits (``prop_seg_small`` [B,P,2S,2W], reference conv
    `polyline_fpn_vit_vertex_2.py:400`) to [B,P,8S,8W] and taking the focal
    loss against the windowed GT (`:523-526`), but

      * the GT windows are derived ON DEVICE from the merged instance map
        (``prop_inst`` [B,H,H] u8) and per-proposal assigned lane id
        (``prop_best`` [B,P]) via non-overlapping strided block views —
        (window of inst == best) equals the reference's windowed per-lane
        binary map, so the [B,P,8S,8W] u8 GT never crosses host->device
        (26.5 MB/step at batch 4; the H2D upload is the train-step bound
        through a tunnel-attached host), and
      * optionally (``hp['seg_focal_chunks'] > 1``) the bilinear upsample
        runs chunk-by-chunk over the 8S axis inside a checkpointed
        ``lax.scan`` so the full-resolution logits never exist in HBM at
        once.  MEASURED on v5e (batch 4, bf16, remat): the one-shot einsum
        is faster (0.207 vs 0.228 s/step) because XLA fuses the focal into
        the upsample matmuls, so chunking is off by default and exists for
        memory-constrained shapes.
    """
    S, P, W = hp["row_size"], hp["num_prop"], hp["prop_fea_width"]
    pw = hp["prop_width"]
    hb = (W - pw) // 2
    ds = 8
    B, H, Wfull = seg_win.shape[0], S * ds, W * ds
    stride = pw * ds
    nblk_win = Wfull // stride
    # geometry that makes windows decompose into block slices (all shipped
    # configs: proposals tile the width, window width a multiple of stride)
    assert S == pw * P and Wfull % stride == 0 and H % 8 == 0, (
        f"fused seg focal needs S==pw*P and W%pw==0; got S={S} P={P} "
        f"pw={pw} W={W}")

    uh = jnp.asarray(_interp_matrix_np(2 * S, H), seg_win.dtype)
    uw = jnp.asarray(_interp_matrix_np(2 * W, Wfull), seg_win.dtype)
    n_chunk = int(hp.get("seg_focal_chunks", 1) or 1)
    assert H % n_chunk == 0
    rows = H // n_chunk
    uh_c = uh.reshape(n_chunk, rows, 2 * S)

    inst_pad = jnp.pad(inst_m, ((0, 0), (0, 0), (hb * ds, hb * ds)),
                       constant_values=255)
    # [n_chunk, B, rows, n_blocks, stride]: window p spans blocks p..p+4
    blocks = inst_pad.reshape(B, n_chunk, rows, -1, stride)
    blocks = jnp.moveaxis(blocks, 1, 0)
    posw = pos.astype(jnp.float32)
    bestu = best.astype(inst_m.dtype)

    def chunk(carry, xs):
        uh_k, blk = xs  # [rows,2S], [B,rows,nb,stride]
        win = jnp.concatenate([blk[:, :, k:k + P] for k in range(nblk_win)],
                              axis=-1)  # [B,rows,P,Wfull]
        gt = (jnp.transpose(win, (0, 2, 1, 3))
              == bestu[:, :, None, None]).astype(jnp.float32)
        big = jnp.einsum("oh,bphw->bpow", uh_k, seg_win)
        logits = jnp.einsum("ow,bphw->bpho", uw, big).astype(jnp.float32)
        f = sigmoid_focal_loss(logits, gt)
        return carry + jnp.sum(f * posw[:, :, None, None]), None

    if n_chunk == 1:
        total, _ = chunk(jnp.float32(0.0), (uh_c[0], blocks[0]))
    else:
        total, _ = jax.lax.scan(jax.checkpoint(chunk), jnp.float32(0.0),
                                (uh_c, blocks))
    return total / (S * S * ds * B)


def column_proposal_loss(out: Dict, batch: Dict, hp) -> Dict:
    """10-term loss of the ColumnProposal2 head (reference `:446-600`).

    ``hp`` carries static scalars: row_size, num_prop, prop_fea_width, ext_w,
    lambda_cls, mean_loss_w, orient_w, endp_loss_w, offset_w, spatial_att,
    cls_exp, endp_mode, number_orients.
    """
    S = hp["row_size"]
    P = hp["num_prop"]
    W = hp["prop_fea_width"]
    B = out["ext2"].shape[0]

    gt_exist = batch["prop_ext"].astype(jnp.float32)   # [B,P,S] in {0,1,2}
    gt_coors = batch["prop_coor"].astype(jnp.float32)  # [B,P,S]
    gt_offset = batch["prop_offset"].astype(jnp.float32)
    gt_offset_mask = batch["prop_offset_mask"].astype(jnp.float32)

    # vertex validity mangling (reference `:461-465`)
    invalid = (gt_coors >= W) | (gt_coors < 0.0) | (gt_exist == 0)
    gt_coors = jnp.where(invalid, -1.0, gt_coors)
    gt_exist = jnp.where(invalid, 0.0, gt_exist)
    valid = gt_exist > 0
    n_valid = jnp.sum(valid)

    # proposal objectness targets (reference `:469-472`)
    pos = jnp.sum(gt_exist, axis=2) > 2.0  # [B,P]
    gt_prop = jnp.stack([1.0 - pos.astype(jnp.float32),
                         pos.astype(jnp.float32)], axis=-1)
    proposal_loss = jnp.mean(
        optax_sigmoid_ce(out["proposal_conf"].astype(jnp.float32), gt_prop))

    # per-row existence/semantic CE inside positive proposals (`:531`)
    ext_ce = cross_entropy_with_int_labels(out["ext2"], gt_exist.astype(jnp.int32))
    ext_loss = jnp.sum(ext_ce * pos[:, :, None]) * hp["ext_w"] / (P * S * B)

    # column classification + expectation regression (`:535-538`)
    cls2 = out["cls2"].astype(jnp.float32)
    vmask = valid.astype(jnp.float32)
    safe_div = lambda x: jnp.where(n_valid > 0, x / jnp.maximum(n_valid, 1), 0.0)
    cls_smooth_loss = jnp.float32(0.0)
    if hp["cls_exp"]:
        col_idx = jnp.arange(W, dtype=jnp.float32)
        corr_pred = jnp.sum(col_idx * jax.nn.softmax(cls2, axis=-1), axis=-1)
        cls_mean_loss = safe_div(
            jnp.sum(smooth_l1(corr_pred, gt_coors) * vmask)) * hp["mean_loss_w"]
        cls_ce = cross_entropy_with_int_labels(cls2, gt_coors.astype(jnp.int32))
        cls_loss = safe_div(jnp.sum(cls_ce * vmask)) * hp["lambda_cls"]

        if hp.get("cls_smooth", False):
            # orientation-consistency smoothness (reference `:540-555`):
            # successive-row coordinate deltas should match the local
            # orientation expectation; the reference's b x P double loop is a
            # batched window gather here.
            S = hp["row_size"]
            o_idx = jnp.arange(hp["number_orients"], dtype=jnp.float32)
            orient_exp = jnp.sum(
                o_idx * jax.nn.softmax(out["orient"].astype(jnp.float32), -1),
                axis=-1)  # [B,S,S]
            delta_orient = (orient_exp - 5.0) * 0.5
            pw = hp.get("prop_width", 2)
            pad = (W - pw) // 2  # == prop_half_buff
            delta_pad = jnp.pad(delta_orient, ((0, 0), (0, 0), (pad, pad)))
            # window per proposal: columns [pw*p, pw*p + W)
            P_ = out["cls2"].shape[1]
            win = pw * jnp.arange(P_)[:, None] + jnp.arange(W)[None, :]
            # [B,P,S,W] local orientation deltas
            local = jnp.transpose(delta_pad[:, :, win], (0, 2, 1, 3))
            rowsel = jnp.clip(corr_pred.astype(jnp.int32), 0, W - 1)
            delta_roi = jnp.take_along_axis(local, rowsel[..., None],
                                            axis=-1)[..., 0]
            delta_pred = jnp.concatenate(
                [jnp.zeros_like(corr_pred[:, :, :1]),
                 corr_pred[:, :, 1:] - corr_pred[:, :, :-1]], axis=2)
            cls_smooth_loss = safe_div(jnp.sum(
                smooth_l1(delta_pred, delta_roi) * vmask)) * \
                hp.get("cls_smooth_loss_w", 0.0)
    else:
        cls_mean_loss = 0.0
        cls_loss = safe_div(-jnp.sum(
            gt_coors * jnp.log(cls2 + EPS) * vmask[..., None].squeeze(-1)))

    # sub-bin offset regression (`:562-563`)
    offset_loss = safe_div(jnp.sum(smooth_l1(
        out["offset2"].astype(jnp.float32) * gt_offset_mask,
        gt_offset * gt_offset_mask))) * hp["offset_w"]

    # orientation CE on labelled pixels (`:491-492,570-571`)
    lb_orient = batch["lc_orient"].astype(jnp.int32)  # [B,S,S]
    omask = lb_orient > 0
    orient_ce = cross_entropy_with_int_labels(out["orient"], lb_orient)
    n_orient = jnp.sum(omask)
    orient_loss = jnp.where(
        n_orient > 0,
        hp["orient_w"] * jnp.sum(orient_ce * omask) / jnp.maximum(n_orient, 1),
        0.0)

    # global semantic segmentation (`:495,572` — batch-independent norm)
    sem_lb = batch["semantic_label_raw"].astype(jnp.int32)  # [B,8S,8S]
    sem_ce = cross_entropy_with_int_labels(out["semantic_seg"], sem_lb)
    semantic_loss = jnp.sum(sem_ce) / (S * S * 64)

    # global endpoint heatmap focal (`:498-509,573`).  The 4.0/0.5
    # positive/negative weights are the reference's; endp_pos_w/endp_neg_w
    # expose them as training levers for the endpoint-F1 term (VERDICT r4).
    lb_endp = _heatmap_f32(batch["endp_map"])  # [B,8S,8S]
    has_endp = (jnp.sum(lb_endp, axis=(1, 2)) > 1.0).astype(jnp.float32)
    w_endp = jnp.where(lb_endp > EPS, lb_endp * hp.get("endp_pos_w", 4.0),
                       hp.get("endp_neg_w", 0.5))
    tgt_endp = (lb_endp > EPS).astype(jnp.float32)
    endp_logits = (out["endpoint"] if hp["endp_mode"] == "endpoint"
                   else out["endp_est"])[..., 0].astype(jnp.float32)
    focal = sigmoid_focal_loss(endp_logits, tgt_endp)
    endp_loss = hp["endp_loss_w"] * jnp.sum(
        w_endp * focal * has_endp[:, None, None]) / (S * S * B)

    # per-proposal binary seg focal, positive proposals only (`:523-526,574`)
    if hp["spatial_att"]:
        if (hp.get("fused_seg_focal", True) and "prop_inst" in batch
                and "prop_seg_small" in out):
            bi_seg_loss = _fused_prop_seg_focal(
                out["prop_seg_small"], batch["prop_inst"],
                batch["prop_best"], pos, hp)
        else:
            seg_focal = sigmoid_focal_loss(
                out["prop_bi_seg"].astype(jnp.float32),
                batch["prop_bi_seg"].astype(jnp.float32))
            bi_seg_loss = jnp.sum(
                seg_focal * pos[:, :, None, None]) / (S * S * 8 * B)
    else:
        bi_seg_loss = jnp.float32(0.0)

    loss = (proposal_loss + ext_loss + cls_mean_loss + cls_loss +
            cls_smooth_loss + endp_loss + orient_loss + bi_seg_loss +
            offset_loss + semantic_loss)
    return {
        "loss": loss,
        "loss_stats": {
            "proposal_loss": proposal_loss,
            "ext_loss2": ext_loss,
            "cls_loss2": cls_loss,
            "cls_mean_loss2": cls_mean_loss,
            "cls_smooth_loss2": cls_smooth_loss,
            "endp_loss": endp_loss,
            "orient_loss": orient_loss,
            "binary_seg_loss": bi_seg_loss,
            "offset_loss": offset_loss,
            "semantic_seg_loss": semantic_loss,
        },
    }


def segmentor_loss(out: Dict, batch: Dict) -> Dict:
    """Segmentor pretraining loss (reference `postprojector.py:84-109`)."""
    EPS6 = 1e-6
    seg_logits = out["semantic_seg"].astype(jnp.float32)  # [B,H,W,3]
    b, f_h, f_w, _ = seg_logits.shape
    seg_ce = cross_entropy_with_int_labels(
        seg_logits, batch["mask"].astype(jnp.int32))
    seg_loss = jnp.sum(seg_ce) / (b * f_h * f_w)

    lb_endp = _heatmap_f32(batch["endp_map"])
    has_endp = (jnp.sum(lb_endp, axis=(1, 2)) > 1.0).astype(jnp.float32)
    w_endp = jnp.where(lb_endp > EPS6, lb_endp * 10.0, 0.1)
    tgt = (lb_endp > EPS6).astype(jnp.float32)
    focal = sigmoid_focal_loss(out["endp_est"][..., 0].astype(jnp.float32), tgt)
    endp_loss = 50.0 * jnp.sum(w_endp * focal * has_endp[:, None, None]) / (
        f_h * f_w)

    return {"loss": seg_loss + endp_loss,
            "loss_stats": {"seg_loss": seg_loss, "endp_loss": endp_loss}}


def head_hparams(cfg) -> Dict:
    """Extract the static loss scalars from a config."""
    h = cfg.heads
    return dict(
        row_size=h.row_size,
        num_prop=h.num_prop,
        prop_fea_width=h.prop_width + 2 * h.prop_half_buff,
        ext_w=h.get("ext_w", 1.0),
        lambda_cls=h.get("lambda_cls", 1.0),
        mean_loss_w=h.get("mean_loss_w", 0.0),
        orient_w=h.get("orient_w", 1.0),
        endp_loss_w=h.get("endp_loss_w", 1.0),
        endp_pos_w=h.get("endp_pos_w", 4.0),
        endp_neg_w=h.get("endp_neg_w", 0.5),
        offset_w=h.get("offset_w", 1.0),
        cls_exp=h.get("cls_exp", True),
        endp_mode=h.get("endp_mode", "endp_est"),
        spatial_att=cfg.get("spatial_att", True),
        cls_smooth=cfg.get("cls_smooth", False),
        cls_smooth_loss_w=h.get("cls_smooth_loss_w", 0.0),
        prop_width=h.prop_width,
        number_orients=cfg.get("number_orients", 11),
        fused_seg_focal=cfg.get("fused_seg_focal", True),
        seg_focal_chunks=cfg.get("seg_focal_chunks", 1),
    )
