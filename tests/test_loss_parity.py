"""Loss parity: the 10-term column-proposal loss vs a literal torch
transcription of the reference
(`/root/reference/baseline/models/heads/polyline_fpn_vit_vertex_2.py:446-600`),
on identical random inputs."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F


def _tv_sigmoid_focal_loss(logits, targets, alpha=0.25, gamma=2.0,
                           reduction="none"):
    # torchvision.ops.sigmoid_focal_loss formula (torchvision absent here;
    # formula verified against torch in tests/test_port.py)
    p = torch.sigmoid(logits)
    ce = F.binary_cross_entropy_with_logits(logits, targets, reduction="none")
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss.sum() if reduction == "sum" else loss


def reference_loss_torch(out, batch, *, S, P, W, n_orients, ext_w, lambda_cls,
                         mean_loss_w, orient_w, endp_loss_w, offset_w):
    EPS = 1e-12
    gt_proposal = batch["prop_obj"].clone()
    gt_exist = batch["prop_ext"].clone()
    gt_coors = batch["prop_coor"].clone()
    gt_offset = batch["prop_offset"]
    gt_offset_mask = batch["prop_offset_mask"]
    gt_bi_seg = batch["prop_bi_seg"]
    lb_sem = batch["semantic_label_raw"]
    lb_endp = batch["endp_map"].clone()
    lb_orient = batch["lc_orient"]
    b_size = gt_exist.shape[0]

    invalid = torch.where((gt_coors >= W) | (gt_coors < 0.0) | (gt_exist == 0))
    gt_coors[invalid] = -1.0
    gt_exist[invalid] = 0
    valid = torch.where(gt_exist > 0)
    n_valid = len(valid[0])

    pos = torch.where(gt_exist.sum(dim=2) > 2)
    gt_proposal[pos[0], pos[1], 1] = 1
    neg = torch.where(gt_proposal[:, :, 1] == 0)
    gt_proposal[neg[0], neg[1], 0] = 1

    orient_exist = torch.where(lb_orient > 0)
    orient_loss = F.cross_entropy(
        out["orient"].permute(0, 3, 1, 2).permute(0, 2, 3, 1)[orient_exist],
        lb_orient[orient_exist].long(), reduction="sum")

    sem_loss = F.cross_entropy(out["semantic_seg"].permute(0, 3, 1, 2),
                               lb_sem.long(), reduction="sum")

    endp_exist = torch.where(lb_endp.sum(dim=(1, 2)) > 1.0)
    w_endp = lb_endp.clone()
    w_endp[w_endp > EPS] *= 4
    w_endp[w_endp < EPS] = 0.5
    lb_endp[lb_endp > EPS] = 1
    lb_endp[lb_endp < EPS] = 0
    endp_none = _tv_sigmoid_focal_loss(
        out["endp_est"][..., 0][endp_exist], lb_endp[endp_exist],
        reduction="none")
    endp_loss = (w_endp[endp_exist] * endp_none).sum()

    seg_loss = _tv_sigmoid_focal_loss(
        out["prop_bi_seg"][pos[0], pos[1]].reshape(-1, 1),
        gt_bi_seg[pos[0], pos[1]].reshape(-1, 1), reduction="sum")

    proposal_loss = F.binary_cross_entropy_with_logits(
        out["proposal_conf"], gt_proposal)
    ext_loss = F.cross_entropy(
        out["ext2"][pos[0], pos[1]].reshape(-1, 3),
        gt_exist[pos[0], pos[1]].long().view(-1), reduction="sum")

    col_index = torch.arange(W).float()
    corr_pred = (col_index * out["cls2"].softmax(dim=3)).sum(dim=3)
    cls_mean = F.smooth_l1_loss(corr_pred[valid], gt_coors[valid],
                                reduction="sum")
    cls_loss = F.cross_entropy(out["cls2"][valid], gt_coors[valid].long(),
                               reduction="sum")
    offset_loss = F.smooth_l1_loss(out["offset2"] * gt_offset_mask,
                                   gt_offset * gt_offset_mask,
                                   reduction="sum")

    if len(orient_exist[0]) > 0:
        orient_loss = orient_w * orient_loss / len(orient_exist[0])
    sem_loss = sem_loss / (S * S * 64)
    endp_loss = endp_loss_w * endp_loss / (S * S * b_size)
    seg_loss = seg_loss / (S * S * 8 * b_size)
    ext_loss = ext_w * ext_loss / (P * S * b_size)
    if n_valid > 0:
        cls_mean = mean_loss_w * cls_mean / n_valid
        cls_loss = lambda_cls * cls_loss / n_valid
        offset_loss = offset_w * offset_loss / n_valid
    return {
        "proposal_loss": proposal_loss, "ext_loss2": ext_loss,
        "cls_loss2": cls_loss, "cls_mean_loss2": cls_mean,
        "endp_loss": endp_loss, "orient_loss": orient_loss,
        "binary_seg_loss": seg_loss, "offset_loss": offset_loss,
        "semantic_seg_loss": sem_loss,
    }


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1])
def test_column_loss_matches_reference_transcription(seed, tiny_cfg):
    import jax.numpy as jnp
    from lanemapping_tpu.models.head_losses import (column_proposal_loss,
                                                    head_hparams)

    cfg = tiny_cfg
    S, P = cfg.heads.row_size, cfg.heads.num_prop
    W = cfg.heads.prop_width + 2 * cfg.heads.prop_half_buff
    B, img = 2, 8 * S
    rng = np.random.RandomState(seed)

    out_np = {
        "proposal_conf": rng.randn(B, P, 2).astype(np.float32),
        "ext2": rng.randn(B, P, S, 3).astype(np.float32),
        "cls2": rng.randn(B, P, S, W).astype(np.float32),
        "offset2": rng.randn(B, P, S, W).astype(np.float32),
        "orient": rng.randn(B, S, S, 11).astype(np.float32),
        "semantic_seg": rng.randn(B, img, img, 3).astype(np.float32),
        "endp_est": rng.randn(B, img, img, 1).astype(np.float32),
        "prop_bi_seg": rng.randn(B, P, img, 8 * W).astype(np.float32),
    }
    # realistic-ish GT: some valid vertices, some positive proposals
    ext = rng.choice([0, 1, 2], size=(B, P, S), p=[0.7, 0.2, 0.1])
    batch_np = {
        "prop_obj": np.zeros((B, P, 2), np.float32),
        "prop_ext": ext.astype(np.float32),
        "prop_coor": rng.uniform(-2, W + 2, (B, P, S)).astype(np.float32),
        "prop_offset": rng.randn(B, P, S, W).astype(np.float32),
        "prop_offset_mask": (rng.rand(B, P, S, W) > 0.7).astype(np.float32),
        "prop_bi_seg": (rng.rand(B, P, img, 8 * W) > 0.9).astype(np.float32),
        "semantic_label_raw": rng.randint(0, 3, (B, img, img)),
        "endp_map": np.where(rng.rand(B, img, img) > 0.995,
                             rng.rand(B, img, img), 0).astype(np.float32),
        "lc_orient": rng.randint(0, 11, (B, S, S)),
    }

    hp = head_hparams(cfg)
    got = column_proposal_loss({k: jnp.asarray(v) for k, v in out_np.items()},
                               {k: jnp.asarray(v)
                                for k, v in batch_np.items()}, hp)

    t_out = {k: torch.tensor(v) for k, v in out_np.items()}
    t_batch = {k: torch.tensor(np.asarray(v, np.float32))
               for k, v in batch_np.items()}
    want = reference_loss_torch(
        t_out, t_batch, S=S, P=P, W=W, n_orients=11,
        ext_w=hp["ext_w"], lambda_cls=hp["lambda_cls"],
        mean_loss_w=hp["mean_loss_w"], orient_w=hp["orient_w"],
        endp_loss_w=hp["endp_loss_w"], offset_w=hp["offset_w"])

    for k, tv in want.items():
        jv = float(got["loss_stats"][k])
        assert jv == pytest.approx(float(tv), rel=2e-4, abs=1e-5), k


@pytest.mark.slow
@pytest.mark.parametrize("chunks", [1, 8])
def test_fused_seg_focal_matches_unfused(tiny_cfg, chunks):
    """The fused chunked seg-focal (device-side GT from the merged instance
    map, checkpointed scan over row chunks) equals the unfused term
    (materialised [B,P,8S,8W] logits + shipped windowed GT) to fp tolerance."""
    import jax.numpy as jnp
    from lanemapping_tpu.models.head_losses import (column_proposal_loss,
                                                    head_hparams)
    from lanemapping_tpu.ops.interp import _interp_matrix_np

    cfg = tiny_cfg
    S, P = cfg.heads.row_size, cfg.heads.num_prop
    pw, hb = cfg.heads.prop_width, cfg.heads.prop_half_buff
    W = pw + 2 * hb
    ds = 8
    img = ds * S
    B, n_cls = 2, cfg.number_lanes
    rng = np.random.RandomState(3)

    inst = np.where(rng.rand(B, img, img) < 0.08,
                    rng.randint(0, n_cls, (B, img, img)),
                    255).astype(np.uint8)
    best = rng.randint(0, n_cls, (B, P)).astype(np.uint8)
    seg_win = rng.randn(B, P, 2 * S, 2 * W).astype(np.float32)

    # unfused inputs: upsampled logits (same operator matmuls as the model)
    # + the windowed GT the dataset would have shipped
    uh = _interp_matrix_np(2 * S, img)
    uw = _interp_matrix_np(2 * W, ds * W)
    big = np.einsum("oh,bphw->bpow", uh, seg_win)
    prop_bi_seg_logits = np.einsum("ow,bphw->bpho", uw, big)
    inst_pad = np.pad(inst, ((0, 0), (0, 0), (hb * ds, hb * ds)),
                      constant_values=255)
    win_raw = (ds * pw) * np.arange(P)[:, None] + np.arange(W * ds)[None, :]
    gt_win = np.transpose(inst_pad[:, :, win_raw], (0, 2, 1, 3))
    gt_bi_seg = (gt_win == best[:, :, None, None]).astype(np.float32)

    ext = rng.choice([0, 1, 2], size=(B, P, S), p=[0.6, 0.25, 0.15])
    base_out = {
        "proposal_conf": rng.randn(B, P, 2).astype(np.float32),
        "ext2": rng.randn(B, P, S, 3).astype(np.float32),
        "cls2": rng.randn(B, P, S, W).astype(np.float32),
        "offset2": rng.randn(B, P, S, W).astype(np.float32),
        "orient": rng.randn(B, S, S, 11).astype(np.float32),
        "semantic_seg": rng.randn(B, img, img, 3).astype(np.float32),
        "endp_est": rng.randn(B, img, img, 1).astype(np.float32),
    }
    base_batch = {
        "prop_ext": ext.astype(np.float32),
        "prop_coor": rng.uniform(-2, W + 2, (B, P, S)).astype(np.float32),
        "prop_offset": rng.randn(B, P, S, W).astype(np.float32),
        "prop_offset_mask": (rng.rand(B, P, S, W) > 0.7).astype(np.float32),
        "semantic_label_raw": rng.randint(0, 3, (B, img, img)),
        "endp_map": np.where(rng.rand(B, img, img) > 0.99,
                             rng.rand(B, img, img), 0).astype(np.float32),
        "lc_orient": rng.randint(0, 11, (B, S, S)),
    }
    J = lambda d: {k: jnp.asarray(v) for k, v in d.items()}

    hp = head_hparams(cfg)
    hp_unfused = dict(hp, fused_seg_focal=False)
    got_unfused = column_proposal_loss(
        J({**base_out, "prop_bi_seg": prop_bi_seg_logits}),
        J({**base_batch, "prop_bi_seg": gt_bi_seg}), hp_unfused)

    hp_fused = dict(hp, fused_seg_focal=True, seg_focal_chunks=chunks)
    got_fused = column_proposal_loss(
        J({**base_out, "prop_seg_small": seg_win}),
        J({**base_batch, "prop_inst": inst, "prop_best": best}), hp_fused)

    a = float(got_unfused["loss_stats"]["binary_seg_loss"])
    b = float(got_fused["loss_stats"]["binary_seg_loss"])
    assert a > 0.0
    assert b == pytest.approx(a, rel=1e-5)
    # gradients through the fused scan also stay finite
    import jax

    def f(sw):
        res = column_proposal_loss(
            J({**base_out, "prop_seg_small": 0.0 * jnp.asarray(seg_win) + sw}),
            J({**base_batch, "prop_inst": inst, "prop_best": best}), hp_fused)
        return res["loss_stats"]["binary_seg_loss"]

    g = jax.grad(f)(jnp.asarray(seg_win))
    assert np.all(np.isfinite(np.asarray(g)))
