"""Column-proposal lane decoder head (TPU-native ColumnProposal2).

Functional parity with the reference head
(`/root/reference/baseline/models/heads/polyline_fpn_vit_vertex_2.py:65-600`)
with one defining architectural change: the reference iterates a Python loop
over 72 column proposals, slicing a 10-column window and running four small
conv heads per proposal (`:390-421`).  Here all proposals are materialised at
once as a [B, P, S, W, C] window tensor (a strided gather on the padded
feature map), the spatial-attention map is computed with fused
upsample+avgpool operators (`ops/interp.py`), and the four heads become
single batched matmuls over the folded (B*P) axis — the per-proposal loop
disappears into one MXU-shaped contraction, which is the idiomatic XLA
formulation and removes 72 kernel launches per step.

Geometry (shipped config `configs/Proj_polyline_fpn_vit_vertex_2.py:58-66`):
row_size S=144, num_prop P=72, prop_width=2, prop_half_buff=4, so each
proposal sees a W = 2+2*4 = 10 column window at stride 2 on the zero-padded
[S, S+8] map.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.interp import (_interp_matrix_np, _upsample_then_pool_np,
                          resize_bilinear_ac)
from ..registry import HEADS

BN_MOMENTUM = 0.9
BN_EPS = 1e-5


def _window_index(num_prop: int, stride: int, width: int) -> np.ndarray:
    """idx[p, j] = stride*p + j — window gather indices on the padded W axis."""
    return (stride * np.arange(num_prop)[:, None]
            + np.arange(width)[None, :]).astype(np.int32)


class ConvPoolStack(nn.Module):
    """Reference ``Conv_Pool_2d`` (`polyline_fpn_vit_vertex_2.py:48-61`):
    a (5,3) conv followed by [relu, BN, stride-2 conv] stages."""

    input_dim: int
    hidden_dims: tuple
    output_dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.input_dim, (5, 3), padding=[(2, 2), (1, 1)],
                    name="conv0")(x)
        chans = list(self.hidden_dims) + [self.output_dim]
        for i, ch in enumerate(chans):
            x = nn.relu(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=BN_MOMENTUM, epsilon=BN_EPS,
                             name=f"bn{i}")(x)
            x = nn.Conv(ch, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], name=f"conv{i + 1}")(x)
        return x


class ColumnProposalHead(nn.Module):
    dim_feat: int = 8
    row_size: int = 144
    dim_shared: int = 100
    num_prop: int = 72
    prop_width: int = 2
    prop_half_buff: int = 4
    num_orients: int = 11
    spatial_att: bool = True
    endp_mode: str = "endp_est"
    fused_seg_focal: bool = True
    column_att: bool = False
    column_transformer_decoder: bool = False
    dim_token: int = 1024
    tr_depth: int = 1
    tr_heads: int = 16
    tr_dim_head: int = 64
    tr_mlp_dim: int = 2048
    tr_dropout: float = 0.0
    tr_emb_dropout: float = 0.0

    @property
    def prop_fea_width(self) -> int:
        return self.prop_width + 2 * self.prop_half_buff

    @nn.compact
    def __call__(self, x, x_up, x_endp, train: bool = False,
                 need_prop_seg: Optional[bool] = None):
        """x [B,S,S,F], x_up [B,2S,2S,F], x_endp [B,8S,8S,1] -> raw map dict.

        ``need_prop_seg``: materialise the per-proposal full-resolution
        binary-seg logits ([B,P,8S,8W]) — needed for the (unfused) training
        loss only; eval decode never reads them
        (`polyline_fpn_vit_vertex_2.py:602-759` consumes the global semantic
        head instead), so inference skips ~160MB of HBM traffic per batch.
        With ``fused_seg_focal`` the loss upsamples ``prop_seg_small``
        chunk-by-chunk itself (`head_losses._fused_prop_seg_focal`), so the
        training forward skips it too.
        """
        if need_prop_seg is None:
            need_prop_seg = train and not self.fused_seg_focal
        F_ = self.dim_feat
        S = self.row_size
        P, pw, hb = self.num_prop, self.prop_width, self.prop_half_buff
        W = self.prop_fea_width
        B = x.shape[0]
        norm2d = lambda name: nn.BatchNorm(use_running_average=not train,
                                           momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                           name=name)
        conv3 = lambda ch, name, stride=1: nn.Conv(
            ch, (3, 3), strides=(stride, stride), padding=[(1, 1), (1, 1)],
            name=name)
        out = {}

        if self.column_att:
            x = self._column_attention(x, train)  # [B,S,P,F]
        elif self.column_transformer_decoder:
            x = self._column_query_decoder(x, train)  # [B,S,P,F]

        # local+global feature concat (reference `:359`)
        col_fea_up = jnp.concatenate(
            [resize_bilinear_ac(x, 2 * S, 2 * S), x_up], axis=-1)  # [B,2S,2S,2F]

        # endpoint branch on the fused features (reference `:371-373`).
        # With endp_mode='endp_est' (all shipped configs) neither the loss
        # (`:504-507`) nor the decode (`:650-653`) ever reads this output and
        # it receives no gradient — the reference still burns the full-res
        # resize + convs on it; here the branch only runs when selected.
        # Parameters always exist so torch checkpoints port either way.
        e_in = jnp.concatenate(
            [resize_bilinear_ac(col_fea_up, 8 * S, 8 * S), x_endp], axis=-1) \
            if self.endp_mode == "endpoint" else jnp.zeros(
                (B, 1, 1, col_fea_up.shape[-1] + 1), col_fea_up.dtype)
        e = nn.relu(e_in)
        e = conv3(F_ // 2, "endpoint_conv1")(e)
        e = nn.relu(e)
        e = norm2d("endpoint_bn")(e)
        e = conv3(1, "endpoint_conv2")(e)
        if self.endp_mode == "endpoint":
            out["endpoint"] = e

        # shared downsampled header features (reference `:183-189,376`)
        r = conv3(2 * F_, "common_conv1")(col_fea_up)
        r = norm2d("common_bn1")(r)
        r = conv3(2 * F_, "common_conv2", stride=2)(r)
        row_fea = norm2d("common_bn2")(r)  # [B,S,S,2F]

        # per-pixel orientation classes (reference `:232-237,380`)
        o = conv3(F_, "orient_conv1")(row_fea)
        o = norm2d("orient_bn")(o)
        out["orient"] = conv3(self.num_orients, "orient_conv2")(o)  # [B,S,S,O]

        # ---- all P proposal windows at once -------------------------------
        row_pad = jnp.pad(row_fea, ((0, 0), (0, 0), (hb, hb), (0, 0)))
        idx_r = jnp.asarray(_window_index(P, pw, W))
        # [B,S,P,W,2F] -> [B,P,S,W,2F]
        local = jnp.transpose(row_pad[:, :, idx_r, :], (0, 2, 1, 3, 4))

        if self.spatial_att or need_prop_seg:
            col_pad = jnp.pad(col_fea_up,
                              ((0, 0), (0, 0), (2 * hb, 2 * hb), (0, 0)))
            # pointwise seg conv once over the full padded map (== applying it
            # per-window, reference `:400`), then window-gather the 1-channel map
            seg_full = nn.Conv(1, (1, 1), name="bi_seg_proposal")(
                nn.relu(col_pad))[..., 0]  # [B,2S,2S+4hb]
            idx_u = jnp.asarray(_window_index(P, 2 * pw, 2 * W))
            seg_win = jnp.transpose(seg_full[:, :, idx_u], (0, 2, 1, 3))
            out["prop_seg_small"] = seg_win  # [B,P,2S,2W]

        if need_prop_seg:
            # align-corners upsample (2S,2W) -> (8S,8W) as two operator matmuls
            uh = jnp.asarray(_interp_matrix_np(2 * S, 8 * S), seg_win.dtype)
            uw = jnp.asarray(_interp_matrix_np(2 * W, 8 * W), seg_win.dtype)
            big = jnp.einsum("oh,bphw->bpow", uh, seg_win)
            out["prop_bi_seg"] = jnp.einsum("ow,bphw->bpho", uw, big)

        if self.spatial_att:
            # attention = avgpool8(upsample(seg_logits)) — the reference
            # multiplies the *raw* seg logits into the features (`:400-402`),
            # no sigmoid; the two ops fuse into one operator pair.
            ch = jnp.asarray(_upsample_then_pool_np(2 * S, 8 * S, 8),
                             seg_win.dtype)
            cw = jnp.asarray(_upsample_then_pool_np(2 * W, 8 * W, 8),
                             seg_win.dtype)
            att = jnp.einsum("oh,bphw->bpow", ch, seg_win)
            att = jnp.einsum("ow,bphw->bpho", cw, att)  # [B,P,S,W]
            tokens = att[..., None] * local
        else:
            tokens = local

        # (c w) channel order matches the reference token flattening (`:191-195`)
        tok = jnp.transpose(tokens, (0, 1, 2, 4, 3)).reshape(B, P, S, 2 * F_ * W)

        # proposal objectness: flatten (c w h) with h fastest (`:200-204`)
        flat = jnp.transpose(tok, (0, 1, 3, 2)).reshape(B, P, 2 * F_ * W * S)
        out["proposal_conf"] = nn.Dense(2, name="proposal_confidence")(flat)

        def conv1d_head(t, hidden, out_ch, name):
            h = nn.Dense(hidden, name=f"{name}_fc1")(t)
            h = nn.BatchNorm(use_running_average=not train,
                             momentum=BN_MOMENTUM, epsilon=BN_EPS,
                             name=f"{name}_bn")(h)
            return nn.Dense(out_ch, name=f"{name}_fc2")(h)

        out["ext2"] = conv1d_head(tok, self.dim_shared, 3, "ext2")
        out["cls2"] = conv1d_head(tok, self.dim_shared, W, "cls2")
        out["offset2"] = conv1d_head(tok, self.dim_shared, W, "offset2")
        return out

    def _column_attention(self, x, train: bool):
        """Reference ``column_att`` branch
        (`polyline_fpn_vit_vertex_2.py:163-181,317-346`): downsample the
        correlator map to one column per proposal (Conv_Pool_2d), tokenise
        each column, add per-proposal embeddings, run the lane-correlator
        transformer, and expand each token back to a per-proposal column
        feature.  The reference loops over batch and proposals building
        tokens one at a time; here tokenisation is one reshape + one matmul
        and the transformer runs over all P tokens at once.

        [B,S,S,F] -> [B,S,P,F] (width = one column per proposal, upsampled
        back to 2S by the caller's bilinear resize, matching
        `_upsample_cat(col_feats_batch, x_up)`).
        """
        from .transformer import Transformer

        B, S, _, F_ = x.shape
        P = self.num_prop
        k = max(1, int(np.log2(max(1, S // P))))  # stride-2 stages: S -> P
        if P << k != S:
            raise ValueError(
                f"column_att needs row_size to be num_prop * 2^k "
                f"(reference supports num_prop in {{72,36,18}} at S=144); "
                f"got S={S}, P={P}")
        hidden = tuple(F_ * (2 ** i) for i in range(1, k))
        out_ch = F_ * (2 ** k)
        fd = ConvPoolStack(F_, hidden, out_ch,
                           name="generate_line_proposal")(x, train)
        # one token per column; (c h) flatten order, h fastest (`:159-162`)
        t = jnp.transpose(fd, (0, 2, 3, 1)).reshape(B, P, out_ch * P)
        t = nn.Dense(self.dim_token, name="to_token")(t)
        # stacked per-proposal position embeddings (reference emb_{i}, `:163-164`)
        emb = self.param("prop_emb", nn.initializers.normal(1.0),
                         (P, self.dim_token))
        t = t + emb[None].astype(t.dtype)
        if self.tr_emb_dropout > 0:
            t = nn.Dropout(self.tr_emb_dropout,
                           deterministic=not train)(t)
        t = Transformer(self.dim_token, self.tr_depth, self.tr_heads,
                        self.tr_dim_head, self.tr_mlp_dim, self.tr_dropout,
                        name="tr_lane_correlator")(t, train)
        t = nn.LayerNorm(name="tr_lane_norm")(t)
        # line_expand (`:185-188`): token -> (c h w) column feature, w=1
        col = nn.Dense(F_ * S, name="line_expand")(t)  # [B,P,F*S]
        col = col.reshape(B, P, F_, S)
        return jnp.transpose(col, (0, 3, 1, 2))  # [B,S,P,F]

    def _column_query_decoder(self, x, train: bool):
        """Working TPU-native equivalent of the reference's
        ``column_transformer_decoder`` branch, which is BROKEN as shipped:
        `polyline_fpn_vit_vertex_2.py:346-351` calls ``self.pe``,
        ``self.line_decoder``, ``self.to_patch_embedding`` and
        ``self.reverse_query_embedding``, none of which are defined in
        ``__init__`` — enabling the flag raises AttributeError in the
        reference.  Equivalent here: P learned lane queries cross-attend
        over 8x8 patch embeddings (+ learned image position embeddings) of
        the correlator map, then expand to per-proposal column features
        exactly like ``line_expand``.
        """
        from .transformer import FeedForward

        B, S, _, F_ = x.shape
        P = self.num_prop
        ps = 8
        n = S // ps
        patches = x.reshape(B, n, ps, n, ps, F_)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(
            B, n * n, ps * ps * F_)
        kv = nn.Dense(self.dim_token, name="to_patch_embedding")(patches)
        img_pe = self.param("img_pe", nn.initializers.normal(0.02),
                            (n * n, self.dim_token))
        kv = kv + img_pe[None].astype(kv.dtype)
        kv = nn.LayerNorm(name="kv_norm")(kv)
        q0 = self.param("query_embed", nn.initializers.normal(1.0),
                        (P, self.dim_token))
        q = jnp.broadcast_to(q0[None], (B, P, self.dim_token)).astype(kv.dtype)
        for d in range(self.tr_depth):
            qn = nn.LayerNorm(name=f"dec{d}_norm1")(q)
            att = nn.MultiHeadDotProductAttention(
                num_heads=self.tr_heads,
                qkv_features=self.tr_heads * self.tr_dim_head,
                out_features=self.dim_token,
                name=f"dec{d}_xattn")(qn, kv)
            q = q + att
            qn = nn.LayerNorm(name=f"dec{d}_norm2")(q)
            q = q + FeedForward(self.dim_token, self.tr_mlp_dim,
                                self.tr_dropout, name=f"dec{d}_mlp")(qn, train)
        q = nn.LayerNorm(name="dec_out_norm")(q)
        col = nn.Dense(F_ * S, name="reverse_query_embedding")(q)
        col = col.reshape(B, P, F_, S)
        return jnp.transpose(col, (0, 3, 1, 2))  # [B,S,P,F]


@HEADS.register_module(name="ColumnProposal2")
def build_column_proposal2(cfg=None, dim_feat=8, row_size=144, dim_shared=100,
                           num_prop=72, prop_width=2, prop_half_buff=4, **kw):
    return ColumnProposalHead(
        dim_feat=dim_feat,
        row_size=row_size,
        dim_shared=dim_shared,
        num_prop=num_prop,
        prop_width=prop_width,
        prop_half_buff=prop_half_buff,
        num_orients=cfg.number_orients if cfg else 11,
        spatial_att=cfg.get("spatial_att", True) if cfg else True,
        endp_mode=kw.get("endp_mode", "endp_est"),
        fused_seg_focal=cfg.get("fused_seg_focal", True) if cfg else True,
        column_att=cfg.get("column_att", False) if cfg else False,
        column_transformer_decoder=cfg.get(
            "column_transformer_decoder", False) if cfg else False,
        dim_token=kw.get("dim_token", 1024),
        tr_depth=kw.get("tr_depth", 1),
        tr_heads=kw.get("tr_heads", 16),
        tr_dim_head=kw.get("tr_dim_head", 64),
        tr_mlp_dim=kw.get("tr_mlp_dim", 2048),
        tr_dropout=kw.get("tr_dropout", 0.0),
        tr_emb_dropout=kw.get("tr_emb_dropout", 0.0),
    )
