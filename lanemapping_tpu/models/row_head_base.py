"""RowSharNotReducRef_Base — the intermediate head between RowSharNotReducRef
and ColumnProposal2.

Reference: `baseline/models/heads/row_shared_base.py` (2,060 lines,
registered but DEAD — no shipped config names it and `heads/__init__.py`
never imports it).  It is the evolutionary bridge the final head grew from:
column proposals with a conv proposal generator + lane-correlator
transformer (`:240-274`, later ColumnProposal2's optional `column_att`),
per-proposal windowed ext/cls/offset heads driven by seg-attention row
tokens (`:284-347,494-549`), and an `endp_mode='Regr'` endpoint-regression
FFN (`:216-224`, replaced by the endpoint heatmap).  Re-expressed
TPU-first: the reference's python loops over batch x 72 proposals
(`:450-460`) and per-proposal window slices (`:503-549`) become one strided
window gather + batched matmuls.

DELIBERATE ADDITION, not ported behavior: this module also runs the row
tokens through a ROW transformer before the prediction heads.  In the
reference's *executed* forward every row-transformer invocation is
commented out (`:503-549` — `tokens_after = to_token_row_seg_attention(
tokens_before)` feeds ext2/cls2/offset2 directly), and the module it
constructs for that purpose reuses the lane-correlator hyperparameters
(`tr_depth`/`tr_heads`), not dedicated row ones.  We realise the sketched
design as a live, batched transformer over all B*P row-token sequences
(hyperparams `row_tr_*` below); drop-in equivalence with the reference's
executed graph is NOT claimed for this sub-block.

Output contract matches ColumnProposal2 (proposal_conf / ext2 / cls2 /
offset2 / orient / endpoint / prop_seg_small), so `column_proposal_loss`
and the standard lane decode apply unchanged; `endp_reg` is the extra
Regr-mode output ([B,4] sigmoid — init_h, init_w, end_h, end_w normalised,
reference `:219-224`).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.interp import _upsample_then_pool_np, resize_bilinear_ac
from ..registry import HEADS
from .column_head import _window_index
from .transformer import Transformer

BN_MOMENTUM = 0.9
BN_EPS = 1e-5


class RowSharNotReducRefBase(nn.Module):
    dim_feat: int = 8
    row_size: int = 144
    dim_shared: int = 512
    num_prop: int = 72
    prop_width: int = 2
    prop_half_buff: int = 4
    dim_token: int = 1024
    tr_depth: int = 1
    tr_heads: int = 16
    tr_dim_head: int = 64
    tr_mlp_dim: int = 2048
    tr_dropout: float = 0.0
    row_dim_token: int = 64
    row_tr_depth: int = 1
    row_tr_heads: int = 10
    row_tr_dim_head: int = 12
    row_tr_mlp_dim: int = 128
    num_orients: int = 11
    endp_mode: str = "endpoint"  # 'endpoint' (heatmap) | 'Regr' (FFN)

    @property
    def prop_fea_width(self) -> int:
        return self.prop_width + 2 * self.prop_half_buff

    @nn.compact
    def __call__(self, x, x_up, x_endp=None, train: bool = False,
                 need_prop_seg=None):
        """x [B,S,S,F], x_up [B,2S,2S,F_up] -> raw map dict."""
        F_ = self.dim_feat
        S = self.row_size
        P, pw, hb = self.num_prop, self.prop_width, self.prop_half_buff
        W = self.prop_fea_width
        B = x.shape[0]
        norm = lambda name: nn.BatchNorm(use_running_average=not train,
                                         momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                         name=name)
        out = {}

        # --- stage 1: conv proposal generator (reference `:331-336`) ------
        # (5,3) conv + BN + stride-2 3x3: S x S -> P x P at 2F channels
        g = nn.Conv(2 * F_, (5, 3), padding=[(2, 2), (1, 1)],
                    name="gen_prop_conv1")(x)
        g = norm("gen_prop_bn")(g)
        fd = nn.Conv(2 * F_, (3, 3), strides=(2, 2),
                     padding=[(1, 1), (1, 1)], name="gen_prop_conv2")(g)
        # fd [B, P, P, 2F] (requires S == 2*P as in the reference geometry)

        # --- stage 2: lane-correlator over column tokens (`:243-274,450-460`)
        # one token per column, (c h) flatten h-fastest, + per-proposal emb
        t = jnp.transpose(fd, (0, 2, 3, 1)).reshape(B, P, 2 * F_ * P)
        t = nn.Dense(self.dim_token, name="to_token")(t)
        emb = self.param("prop_emb", nn.initializers.normal(1.0),
                         (P, self.dim_token))
        t = t + emb[None].astype(t.dtype)
        t = Transformer(self.dim_token, self.tr_depth, self.tr_heads,
                        self.tr_dim_head, self.tr_mlp_dim, self.tr_dropout,
                        name="tr_lane_correlator")(t, train)
        t = nn.LayerNorm(name="tr_lane_norm")(t)
        # proposal objectness comes straight from the correlator tokens
        # (`:267-270,461`) — NOT from the window features as in the final head
        out["proposal_conf"] = nn.Dense(2, name="proposal_confidence")(t)
        # line_expand back to a per-proposal column feature (`:271-274,463`)
        col = nn.Dense(2 * F_ * P, name="line_expand")(t)  # [B,P,2F*P]
        col = col.reshape(B, P, 2 * F_, P)  # (c h w), w=1 folded
        col = jnp.transpose(col, (0, 3, 1, 2))  # [B,h=P,P,2F]

        # --- local+global concat at 2S (`:473` _upsample_cat) --------------
        con = jnp.concatenate(
            [resize_bilinear_ac(col, 2 * S, 2 * S), x_up], axis=-1)

        # head_common: 2S -> S at F channels (`:277-283,476`)
        r = nn.Conv(2 * F_, (3, 3), padding=[(1, 1), (1, 1)],
                    name="common_conv1")(con)
        r = norm("common_bn1")(r)
        r = nn.Conv(F_, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    name="common_conv2")(r)
        row_fea = norm("common_bn2")(r)  # [B,S,S,F]

        # head_upsample: 2S -> 2S at F channels (`:360-366,477`)
        u = nn.Conv(2 * F_, (5, 3), padding=[(2, 2), (1, 1)],
                    name="upsample_conv1")(con)
        u = norm("upsample_bn1")(u)
        u = nn.Conv(F_, (3, 3), padding=[(1, 1), (1, 1)],
                    name="upsample_conv2")(u)
        prop_fea = norm("upsample_bn2")(u)  # [B,2S,2S,F]

        # endpoint: heatmap branch (`:374-381,486-487`) or Regr FFN (`:219-224`)
        e = nn.Conv(F_ // 2, (3, 3), padding=[(1, 1), (1, 1)],
                    name="endpoint_conv1")(nn.relu(row_fea))
        e = nn.relu(norm("endpoint_bn")(e))
        e = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                    name="endpoint_conv2")(e)
        out["endpoint"] = resize_bilinear_ac(e, 8 * S, 8 * S)
        if self.endp_mode == "Regr":
            # fc_reg: flatten S*S (channel-mean), 2-layer FFN, sigmoid [B,4]
            flat = jnp.mean(row_fea, axis=-1).reshape(B, S * S)
            h = nn.relu(nn.Dense(S, name="fc_reg1")(flat))
            out["endp_reg"] = nn.sigmoid(nn.Dense(4, name="fc_reg2")(h))

        # orient head on the common features (`:351-357,491`)
        o = nn.Conv(F_ // 2, (3, 3), padding=[(1, 1), (1, 1)],
                    name="orient_conv1")(row_fea)
        o = norm("orient_bn")(o)
        out["orient"] = nn.Conv(self.num_orients, (3, 3),
                                padding=[(1, 1), (1, 1)],
                                name="orient_conv2")(o)

        # --- stage 3: all P proposal windows at once (`:494-549`) ----------
        row_pad = jnp.pad(row_fea, ((0, 0), (0, 0), (hb, hb), (0, 0)))
        idx_r = jnp.asarray(_window_index(P, pw, W))
        local = jnp.transpose(row_pad[:, :, idx_r, :],
                              (0, 2, 1, 3, 4))  # [B,P,S,W,F]

        # per-proposal seg map: pointwise conv once over the padded 2S map,
        # then window-gather (== the reference's per-window `bi_seg_proposal`)
        up_pad = jnp.pad(prop_fea, ((0, 0), (0, 0), (2 * hb, 2 * hb), (0, 0)))
        seg_full = nn.Conv(1, (1, 1), name="bi_seg_proposal")(
            nn.relu(up_pad))[..., 0]
        idx_u = jnp.asarray(_window_index(P, 2 * pw, 2 * W))
        seg_win = jnp.transpose(seg_full[:, :, idx_u],
                                (0, 2, 1, 3))  # [B,P,2S,2W]
        out["prop_seg_small"] = seg_win

        # seg-attention tokens (`:514-519` _downsample_multiply + to_token):
        # the reference computes avg_pool2d(kernel=8) over the 8x-upsampled
        # seg window; fuse the exact composite into one operator matrix per
        # axis (same pattern as column_head.py spatial_att)
        dh = jnp.asarray(_upsample_then_pool_np(2 * S, 8 * S, 8),
                         seg_win.dtype)
        dw = jnp.asarray(_upsample_then_pool_np(2 * W, 8 * W, 8),
                         seg_win.dtype)
        att = jnp.einsum("oh,bphw->bpow", dh, seg_win)
        att = jnp.einsum("ow,bphw->bpho", dw, att)  # [B,P,S,W]
        tok_in = att[..., None] * local  # [B,P,S,W,F]
        # (c w) flatten -> row token (`:285-289`)
        tok = jnp.transpose(tok_in, (0, 1, 2, 4, 3)).reshape(
            B, P, S, F_ * W)
        tok = nn.Dense(self.row_dim_token, name="to_token_row_seg_att")(tok)

        # row correlator — deliberate addition (see module docstring): the
        # reference sketches this transformer (`:303-306`) but its executed
        # forward comments out every invocation; here the sketched design
        # runs live over the S row tokens of EVERY (batch, proposal)
        # sequence at once
        rt = tok.reshape(B * P, S, self.row_dim_token)
        rt = Transformer(self.row_dim_token, self.row_tr_depth,
                         self.row_tr_heads, self.row_tr_dim_head,
                         self.row_tr_mlp_dim, 0.0,
                         name="tr_row_correlator")(rt, train)
        rt = nn.LayerNorm(name="tr_row_norm")(rt)
        tok = rt.reshape(B, P, S, self.row_dim_token)

        # conv1d prediction heads (`:328-347`)
        def head(t, out_ch, name):
            h = nn.Dense(self.dim_shared, name=f"{name}_fc1")(t)
            h = nn.BatchNorm(use_running_average=not train,
                             momentum=BN_MOMENTUM, epsilon=BN_EPS,
                             name=f"{name}_bn")(h)
            return nn.Dense(out_ch, name=f"{name}_fc2")(h)

        out["ext2"] = head(tok, 3, "ext2")
        out["cls2"] = head(tok, W, "cls2")
        out["offset2"] = head(tok, W, "offset2")
        return out


def endp_regression_loss(out, batch, img_size: int):
    """Weighted L1 on the Regr-mode endpoint FFN (reference
    `weighted_l1_loss` `:562-569` + the `endp_mode=='Regr'` branch of
    `loss()`).  Targets are the first lane's init/end vertices normalised
    by the image size; samples without a lane are masked out."""
    pred = out["endp_reg"].astype(jnp.float32)  # [B,4]
    initp = batch["initp"][:, 0, :].astype(jnp.float32)  # [B,2] (h,w)
    endp = batch["endp"][:, 0, :].astype(jnp.float32)
    tgt = jnp.concatenate([initp, endp], axis=-1) / float(img_size)
    valid = (jnp.sum(jnp.abs(tgt), axis=-1, keepdims=True) > 0)
    l1 = jnp.abs(pred - tgt) * valid.astype(jnp.float32)
    return jnp.sum(l1) / jnp.maximum(jnp.sum(valid) * 4.0, 1.0)


@HEADS.register_module(name="RowSharNotReducRef_Base")
def build_row_shar_base(cfg=None, dim_feat=8, row_size=144, dim_shared=512,
                        num_prop=72, prop_width=2, prop_half_buff=4,
                        dim_token=1024, tr_depth=1, tr_heads=16,
                        tr_dim_head=64, tr_mlp_dim=2048, row_dim_token=64,
                        row_tr_depth=1, row_tr_heads=10, row_tr_dim_head=12,
                        row_tr_mlp_dim=128, endp_mode="endpoint", **kw):
    return RowSharNotReducRefBase(
        dim_feat=dim_feat, row_size=row_size, dim_shared=dim_shared,
        num_prop=num_prop, prop_width=prop_width,
        prop_half_buff=prop_half_buff, dim_token=dim_token,
        tr_depth=tr_depth, tr_heads=tr_heads, tr_dim_head=tr_dim_head,
        tr_mlp_dim=tr_mlp_dim, row_dim_token=row_dim_token,
        row_tr_depth=row_tr_depth, row_tr_heads=row_tr_heads,
        row_tr_dim_head=row_tr_dim_head, row_tr_mlp_dim=row_tr_mlp_dim,
        num_orients=cfg.number_orients if cfg else 11, endp_mode=endp_mode)
