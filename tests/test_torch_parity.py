"""End-to-end activation parity: torch replica of the reference model vs
this framework, weights flowing through the checkpoint porter.

The reference itself cannot be imported here (mmcv/mmdet3d/timm absent), so
this test reconstructs its live forward path in pure torch, module names and
math matching `/root/reference/baseline/models/pcencoder/postprojector.py:417-655`
(FPNWrapper), `backbone/vitsegnet.py:132-214` (VitSegNet) and
`heads/polyline_fpn_vit_vertex_2.py:65-435` (ColumnProposal2, per-proposal
loop), then checks that porting its state_dict into the flax model reproduces
all outputs — validating both the porter's layout map and the numerics of
the TPU-first reformulations (operator-matmul resizes, batched proposal
windows, fused attention pooling).
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

torch.manual_seed(0)

# tiny geometry (matches configs/tiny_test.py)
IMG = 192
S = 24          # row_size / feature size
F_DIM = 8       # dim_feat
P = 12          # num_prop
PW, HB = 2, 4   # prop_width, half_buff
W = PW + 2 * HB
VIT_DIM, VIT_DEPTH, VIT_HEADS, VIT_DH = 128, 1, 4, 32
VIT_OUT = VIT_DIM // 64      # correlator output channels (= dim / patch^2)
COL_CH = VIT_OUT + F_DIM     # col_fea_up channels after local+global concat
DIM_SHARED = 32
N_ORIENT = 11


def conv3(i, o, s=1, d=1):
    return nn.Conv2d(i, o, 3, stride=s, padding=d, dilation=d, bias=False)


class TBasicBlock(nn.Module):
    def __init__(self, i, o, stride=1, dilation=1, downsample=False):
        super().__init__()
        # block0 of a dilated stage uses previous_dilation=1 (torchvision
        # semantics); later blocks use the stage dilation — handled by caller
        self.conv1 = conv3(i, o, stride, dilation)
        self.bn1 = nn.BatchNorm2d(o)
        self.conv2 = conv3(o, o, 1, dilation)
        self.bn2 = nn.BatchNorm2d(o)
        self.downsample = None
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(i, o, 1, stride=stride, bias=False),
                nn.BatchNorm2d(o))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + idt)


def make_layer(i, o, blocks, stride=1, dilate=False):
    dilation = stride if dilate else 1
    s = 1 if dilate else stride
    mods = [TBasicBlock(i, o, s, 1, downsample=(s != 1 or i != o))]
    for _ in range(1, blocks):
        mods.append(TBasicBlock(o, o, 1, dilation))
    return nn.Sequential(*mods)


def up(x, h, w):
    return F.interpolate(x, size=(h, w), mode="bilinear", align_corners=True)


class TFPNWrapper(nn.Module):
    """3-stage resnet34 FPN (reference `postprojector.py:417-655`)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = make_layer(64, 64, 3)
        self.layer2 = make_layer(64, 128, 4, stride=2)
        self.layer3 = make_layer(128, 256, 6, stride=2, dilate=True)
        self.out = nn.Conv2d(256, 64, 1, bias=False)
        self.toplayer = nn.Conv2d(256, 256, 1)
        self.smooth1 = nn.Conv2d(256, 256, 3, 1, 1)
        self.smooth2 = nn.Conv2d(256, 256, 3, 1, 1)
        self.smooth3 = nn.Conv2d(256, 256, 3, 1, 1)
        self.latlayer1 = nn.Conv2d(128, 256, 1)
        self.latlayer2 = nn.Conv2d(64, 256, 1)
        self.semantic_branch = nn.Conv2d(256, 128, 3, 1, 1)
        self.semantic_branch2 = nn.Conv2d(256, 128, 3, 1, 1)
        self.conv2 = nn.Conv2d(256, 256, 3, 1, 1)
        self.conv3 = nn.Conv2d(256, 256, 3, 1, 1)
        self.feature_layer = nn.Conv2d(128, 8, 1)
        self.output_layer_binary_seg = nn.Conv2d(8, 3, 1)
        self.output_layer_endp = nn.Conv2d(128, 1, 1)
        self.gn11 = nn.GroupNorm(128, 128)
        self.gn12 = nn.GroupNorm(256, 256)
        self.gn21 = nn.GroupNorm(128, 128)
        self.gn22 = nn.GroupNorm(256, 256)

    def forward(self, x):
        _, _, xh, xw = x.shape
        c1 = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        c2 = self.layer1(c1)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        fea_down = self.out(c4)
        p4 = self.toplayer(c4)
        p3 = up(p4, *c3.shape[2:]) + self.latlayer1(c3)
        p2 = up(p3, *c2.shape[2:]) + self.latlayer2(c2)
        p4, p3, p2 = self.smooth1(p4), self.smooth2(p3), self.smooth3(p2)
        h, w = p2.shape[2:]
        s4 = up(F.relu(self.gn12(self.conv2(p4))), h, w)
        s4 = up(F.relu(self.gn11(self.semantic_branch(s4))), h, w)
        s3 = up(F.relu(self.gn11(self.semantic_branch(p3))), h, w)
        s2 = F.relu(self.gn11(self.semantic_branch(p2)))
        fea_up = self.feature_layer(s2 + s3 + s4)
        bi_seg = up(self.output_layer_binary_seg(F.relu(fea_up)), xh, xw)
        s4 = up(F.relu(self.gn22(self.conv3(p4))), h, w)
        s4 = up(F.relu(self.gn21(self.semantic_branch2(s4))), h, w)
        s3 = up(F.relu(self.gn21(self.semantic_branch2(p3))), h, w)
        s2 = F.relu(self.gn21(self.semantic_branch2(p2)))
        endp = up(self.output_layer_endp(s2 + s3 + s4), xh, xw)
        return fea_down, fea_up, bi_seg, endp


class TAttention(nn.Module):
    def __init__(self, dim, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.heads = heads
        self.scale = dim_head ** -0.5
        self.to_qkv = nn.Linear(dim, inner * 3, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, dim), nn.Dropout(0.0))

    def forward(self, x):
        b, n, _ = x.shape
        qkv = self.to_qkv(x).chunk(3, dim=-1)
        q, k, v = [t.reshape(b, n, self.heads, -1).transpose(1, 2)
                   for t in qkv]
        attn = (q @ k.transpose(-1, -2) * self.scale).softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, -1)
        return self.to_out(out)


class TPreNorm(nn.Module):
    def __init__(self, dim, fn):
        super().__init__()
        self.norm = nn.LayerNorm(dim)
        self.fn = fn

    def forward(self, x):
        return self.fn(self.norm(x))


class TFeedForward(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.net = nn.Sequential(nn.Linear(dim, hidden), nn.GELU(),
                                 nn.Dropout(0.0), nn.Linear(hidden, dim),
                                 nn.Dropout(0.0))

    def forward(self, x):
        return self.net(x)


class TTransformer(nn.Module):
    def __init__(self, dim, depth, heads, dim_head, mlp_dim):
        super().__init__()
        self.layers = nn.ModuleList([
            nn.ModuleList([TPreNorm(dim, TAttention(dim, heads, dim_head)),
                           TPreNorm(dim, TFeedForward(dim, mlp_dim))])
            for _ in range(depth)])

    def forward(self, x):
        for attn, ff in self.layers:
            x = attn(x) + x
            x = ff(x) + x
        return x


class TVitSegNet(nn.Module):
    def __init__(self):
        super().__init__()
        p = 8
        n_tok = (S // p) ** 2
        self.patch = p
        self.to_patch_embedding = nn.Sequential(
            nn.Identity(), nn.Linear(64 * p * p, VIT_DIM))
        self.pos_embedding = nn.Parameter(torch.randn(1, n_tok, VIT_DIM))
        self.transformer = TTransformer(VIT_DIM, VIT_DEPTH, VIT_HEADS,
                                        VIT_DH, VIT_DIM * 4)

    def forward(self, x):
        b, c, h, w = x.shape
        p = self.patch
        # 'b c (h p1) (w p2) -> b (h w) (p1 p2 c)'
        t = x.reshape(b, c, h // p, p, w // p, p)
        t = t.permute(0, 2, 4, 3, 5, 1).reshape(b, -1, p * p * c)
        t = self.to_patch_embedding[1](t) + self.pos_embedding
        t = self.transformer(t)
        # 'b (h w) (p1 p2 c) -> b c (h p1) (w p2)'
        c_out = VIT_DIM // (p * p)
        t = t.reshape(b, h // p, w // p, p, p, c_out)
        return t.permute(0, 5, 1, 3, 2, 4).reshape(b, c_out, h, w)


class TColumnProposal2(nn.Module):
    """Live forward path (spatial_att=True, column_att=False)."""

    def __init__(self):
        super().__init__()
        self.endpoint = nn.Sequential(
            nn.Conv2d(COL_CH + 1, F_DIM // 2, 3, 1, 1), nn.ReLU(),
            nn.BatchNorm2d(F_DIM // 2), nn.Conv2d(F_DIM // 2, 1, 3, 1, 1))
        self.head_common_layers = nn.Sequential(
            nn.Conv2d(COL_CH, 2 * F_DIM, 3, 1, 1),
            nn.BatchNorm2d(2 * F_DIM),
            nn.Conv2d(2 * F_DIM, 2 * F_DIM, 3, 2, 1),
            nn.BatchNorm2d(2 * F_DIM))
        self.orient = nn.Sequential(
            nn.Conv2d(2 * F_DIM, F_DIM, 3, 1, 1), nn.BatchNorm2d(F_DIM),
            nn.Conv2d(F_DIM, N_ORIENT, 3, 1, 1))
        self.bi_seg_proposal = nn.Conv2d(COL_CH, 1, 1)
        self.proposal_confidence = nn.Sequential(
            nn.Identity(), nn.Linear(2 * F_DIM * W * S, 2))

        def head1d(out_ch):
            return nn.Sequential(nn.Conv1d(2 * F_DIM * W, DIM_SHARED, 1),
                                 nn.BatchNorm1d(DIM_SHARED),
                                 nn.Conv1d(DIM_SHARED, out_ch, 1))

        self.ext2 = head1d(3)
        self.cls2 = head1d(W)
        self.offset2 = head1d(W)

    def forward(self, x, x_up, x_endp):
        out = {}
        col_fea_up = torch.cat([up(x, 2 * S, 2 * S), x_up], dim=1)
        e_in = torch.cat([up(col_fea_up, 8 * S, 8 * S), x_endp], dim=1)
        out["endpoint"] = self.endpoint(F.relu(e_in))
        row_fea = self.head_common_layers(col_fea_up)
        out["orient"] = self.orient(row_fea)
        row_pad = F.pad(row_fea, (HB, HB, 0, 0))
        col_pad = F.pad(col_fea_up, (2 * HB, 2 * HB, 0, 0))
        objs, exts, clss, offs = [], [], [], []
        for pid in range(P):
            local = row_pad[:, :, :, PW * pid:PW * pid + W]
            upsl = col_pad[:, :, :, 2 * PW * pid:2 * PW * pid + 2 * W]
            sp = up(self.bi_seg_proposal(F.relu(upsl)), 8 * S, 8 * W)
            tok = F.avg_pool2d(sp, 8) * local  # [B, C, S, W]
            tok = tok.permute(0, 2, 1, 3).reshape(tok.shape[0], S, -1)
            tok = tok.permute(0, 2, 1)  # [B, C*W, S]
            objs.append(self.proposal_confidence[1](
                tok.reshape(tok.shape[0], -1)))
            exts.append(self.ext2(tok).permute(0, 2, 1))
            clss.append(self.cls2(tok).permute(0, 2, 1))
            offs.append(self.offset2(tok).permute(0, 2, 1))
        out["proposal_conf"] = torch.stack(objs, dim=1)
        out["ext2"] = torch.stack(exts, dim=1)
        out["cls2"] = torch.stack(clss, dim=1)
        out["offset2"] = torch.stack(offs, dim=1)
        return out


class TConvPool2d(nn.Module):
    """Reference `Conv_Pool_2d` (`polyline_fpn_vit_vertex_2.py:48-61`)."""

    def __init__(self, input_dim, hidden_dims, output_dim):
        super().__init__()
        layers = [nn.Conv2d(input_dim, input_dim, (5, 3), padding=(2, 1))]
        for i, o in zip([input_dim] + hidden_dims, hidden_dims + [output_dim]):
            layers.append(nn.Sequential(nn.ReLU(), nn.BatchNorm2d(i),
                                        nn.Conv2d(i, o, 3, 2, 1)))
        self.layers = nn.ModuleList(layers)

    def forward(self, x):
        for layer in self.layers:
            x = layer(x)
        return x


class TColumnAttProposal2(TColumnProposal2):
    """column_att=True forward (`polyline_fpn_vit_vertex_2.py:132-188,
    317-345`): Conv_Pool_2d proposal generator, per-column tokens + emb_{i},
    lane-correlator transformer, line_expand back to column features."""

    DIM_TOKEN = 64
    TR_HEADS, TR_DH, TR_MLP = 4, 16, 128

    def __init__(self):
        super().__init__()
        ch = VIT_OUT
        self.generate_line_proposal = nn.Sequential(
            TConvPool2d(ch, [], 2 * ch))
        self.to_token = nn.Sequential(
            nn.Identity(), nn.Linear(2 * ch * P, self.DIM_TOKEN))
        for i in range(P):
            setattr(self, f"emb_{i}",
                    nn.Parameter(torch.randn(self.DIM_TOKEN)))
        self.tr_lane_correlator = nn.Sequential(
            TTransformer(self.DIM_TOKEN, 1, self.TR_HEADS, self.TR_DH,
                         self.TR_MLP),
            nn.LayerNorm(self.DIM_TOKEN))
        self.line_expand = nn.Sequential(nn.Linear(self.DIM_TOKEN, ch * S))

    def forward(self, x, x_up, x_endp):
        b = x.shape[0]
        ch = VIT_OUT
        fd = self.generate_line_proposal(x)  # [B, 2ch, P, P]
        toks = []
        for w in range(P):
            tt = fd[:, :, :, w].reshape(b, -1)  # (c h), h fastest
            toks.append(self.to_token[1](tt) + getattr(self, f"emb_{w}"))
        t = torch.stack(toks, dim=1)  # [B, P, dim_token]
        t = self.tr_lane_correlator(t)
        col = self.line_expand[0](t)  # [B, P, ch*S]
        col = col.reshape(b, P, ch, S).permute(0, 2, 3, 1)  # [B, ch, S, P]
        return super().forward(col, x_up, x_endp)


@pytest.mark.slow
def test_column_att_head_parity(tiny_cfg):
    """Head-level activation parity with the column_att branch ON
    (round-1 VERDICT #4)."""
    import jax
    import jax.numpy as jnp
    from lanemapping_tpu.models.column_head import ColumnProposalHead
    from lanemapping_tpu.tools.port_torch_ckpt import (build_rules,
                                                       port_state_dict)

    torch.manual_seed(3)
    tmodel = TColumnAttProposal2().eval()
    for m in tmodel.modules():
        if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.6, 1.4)

    rng = np.random.RandomState(2)
    x = rng.randn(2, VIT_OUT, S, S).astype(np.float32)
    x_up = rng.randn(2, F_DIM, 2 * S, 2 * S).astype(np.float32)
    x_endp = rng.randn(2, 1, 8 * S, 8 * S).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(*map(torch.tensor, (x, x_up, x_endp)))

    head = ColumnProposalHead(
        dim_feat=F_DIM, row_size=S, dim_shared=DIM_SHARED, num_prop=P,
        prop_width=PW, prop_half_buff=HB, num_orients=N_ORIENT,
        endp_mode="endpoint", column_att=True,
        dim_token=TColumnAttProposal2.DIM_TOKEN,
        tr_depth=1, tr_heads=TColumnAttProposal2.TR_HEADS,
        tr_dim_head=TColumnAttProposal2.TR_DH,
        tr_mlp_dim=TColumnAttProposal2.TR_MLP)
    nhwc = lambda a: np.transpose(a, (0, 2, 3, 1))
    variables = head.init(jax.random.PRNGKey(0), jnp.asarray(nhwc(x)),
                          jnp.asarray(nhwc(x_up)), jnp.asarray(nhwc(x_endp)),
                          train=False)
    sd = {f"heads.{k}": v.detach().numpy()
          for k, v in tmodel.state_dict().items()}
    rules = [r for r in build_rules(column_att=True, tr_depth=1,
                                    conv_pool_stages=1)
             if r[0].startswith("heads.")]
    params, bstats, report = port_state_dict(
        sd, {"heads": jax.device_get(variables["params"])},
        {"heads": jax.device_get(variables["batch_stats"])}, rules)
    assert not report["unused_torch"], report["unused_torch"][:8]
    j_out = head.apply({"params": params["heads"],
                        "batch_stats": bstats["heads"]},
                       jnp.asarray(nhwc(x)), jnp.asarray(nhwc(x_up)),
                       jnp.asarray(nhwc(x_endp)), train=False)

    def cmp(name, tv, jv, image=False, tol=2e-3):
        tv = tv.detach().numpy()
        if image:
            tv = nhwc(tv)
        jv = np.asarray(jv, np.float32)
        scale = max(1e-3, float(np.abs(tv).max()))
        err = np.abs(tv - jv).max() / scale
        assert err < tol, f"{name}: rel-max err {err:.2e}"

    cmp("endpoint", t_out["endpoint"], j_out["endpoint"], image=True)
    cmp("orient", t_out["orient"], j_out["orient"], image=True)
    cmp("proposal_conf", t_out["proposal_conf"], j_out["proposal_conf"])
    cmp("ext2", t_out["ext2"], j_out["ext2"])
    cmp("cls2", t_out["cls2"], j_out["cls2"])
    cmp("offset2", t_out["offset2"], j_out["offset2"])


class TDetector(nn.Module):
    def __init__(self):
        super().__init__()
        self.pcencoder = nn.Module()
        self.pcencoder.fpn = TFPNWrapper()
        self.backbone = TVitSegNet()
        self.heads = TColumnProposal2()

    def forward(self, proj):
        fea, fea_up, bi_seg, endp = self.pcencoder.fpn(proj)
        fea = self.backbone(fea)
        out = self.heads(fea, fea_up, endp)
        out["semantic_seg"] = bi_seg
        out["endp_est"] = endp
        return out


@pytest.mark.slow
def test_full_model_activation_parity(tiny_cfg):
    import jax
    import jax.numpy as jnp
    from lanemapping_tpu.models.nets import build_model
    from lanemapping_tpu.tools.port_torch_ckpt import (build_rules,
                                                       port_state_dict)

    # torch side: randomized weights, eval mode, double precision off
    tmodel = TDetector().eval()
    # randomize BN running stats so the port is actually exercised
    for m in tmodel.modules():
        if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.6, 1.4)
    rng = np.random.RandomState(0)
    x = rng.rand(1, IMG, IMG, 3).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.tensor(x).permute(0, 3, 1, 2))

    # jax side: port the torch weights through the public porter.
    # endp_mode='endpoint' forces the head's endpoint branch on so the
    # parity check covers it too (shipped configs skip it as dead compute).
    cfg = tiny_cfg
    cfg.heads.endp_mode = "endpoint"
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, IMG, IMG, 3)), train=False)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    rules = build_rules(resnet_layers=(3, 4, 6), vit_depth=VIT_DEPTH)
    params, bstats, report = port_state_dict(
        sd, jax.device_get(variables["params"]),
        jax.device_get(variables["batch_stats"]), rules)
    assert not report["unused_torch"], report["unused_torch"][:8]
    j_out = model.apply({"params": params, "batch_stats": bstats},
                        jnp.asarray(x), train=False)

    image_maps = {"semantic_seg", "endp_est", "endpoint", "orient"}

    def cmp(name, torch_val, jax_val, tol=2e-3):
        tv = torch_val.detach().numpy()
        if name in image_maps:  # NCHW -> NHWC
            tv = np.transpose(tv, (0, 2, 3, 1))
        jv = np.asarray(jax_val, np.float32)
        scale = max(1e-3, float(np.abs(tv).max()))
        err = np.abs(tv - jv).max() / scale
        assert err < tol, f"{name}: rel-max err {err:.2e}"

    cmp("semantic_seg", t_out["semantic_seg"], j_out["semantic_seg"])
    cmp("endp_est", t_out["endp_est"], j_out["endp_est"])
    cmp("endpoint", t_out["endpoint"], j_out["endpoint"])
    cmp("orient", t_out["orient"], j_out["orient"])
    cmp("proposal_conf", t_out["proposal_conf"], j_out["proposal_conf"])
    cmp("ext2", t_out["ext2"], j_out["ext2"])
    cmp("cls2", t_out["cls2"], j_out["cls2"])
    cmp("offset2", t_out["offset2"], j_out["offset2"])
