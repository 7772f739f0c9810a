"""Shape/dtype contracts of the model stack on tiny tiles.

The reference has no test suite (SURVEY.md §4); these golden-shape tests
mirror its implicit contracts: encoder 4-tuple (`postprojector.py:79-82`),
correlator [B,S,S,8] (`vitsegnet.py:194-214`), head output dict
(`polyline_fpn_vit_vertex_2.py:430-435`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanemapping_tpu.models.nets import build_model
from lanemapping_tpu.models.head_losses import (column_proposal_loss,
                                                head_hparams, segmentor_loss)


def _init_and_apply(cfg, batch_size=2, train=False):
    model = build_model(cfg)
    img = cfg.list_img_size_xy[0]
    proj = jnp.zeros((batch_size, img, img, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), proj, train=False)
    if train:
        out, _ = model.apply(variables, proj, train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
    else:
        out = model.apply(variables, proj, train=False)
    return model, variables, out


def test_detector_forward_shapes(tiny_cfg):
    cfg = tiny_cfg
    S = cfg.heads.row_size
    P = cfg.heads.num_prop
    W = cfg.heads.prop_width + 2 * cfg.heads.prop_half_buff
    B = 2
    _, _, out = _init_and_apply(cfg, B, train=False)
    assert out["proposal_conf"].shape == (B, P, 2)
    assert out["ext2"].shape == (B, P, S, 3)
    assert out["cls2"].shape == (B, P, S, W)
    assert out["offset2"].shape == (B, P, S, W)
    assert out["orient"].shape == (B, S, S, cfg.number_orients)
    assert out["semantic_seg"].shape == (B, 8 * S, 8 * S, 3)
    assert out["endp_est"].shape == (B, 8 * S, 8 * S, 1)
    # endp_mode='endp_est' (all shipped configs): the head's own endpoint
    # branch is unused by loss and decode, so it is not computed
    assert "endpoint" not in out
    # eval skips the per-proposal upsampled seg maps entirely
    assert "prop_bi_seg" not in out


@pytest.mark.slow
def test_detector_train_has_prop_seg_and_loss(tiny_cfg):
    cfg = tiny_cfg
    # unfused path: the model materialises the upsampled per-proposal seg
    # logits and the loss consumes the shipped [B,P,8S,8W] GT
    cfg.fused_seg_focal = False
    S, P = cfg.heads.row_size, cfg.heads.num_prop
    W = cfg.heads.prop_width + 2 * cfg.heads.prop_half_buff
    B = 2
    _, _, out = _init_and_apply(cfg, B, train=True)
    assert out["prop_bi_seg"].shape == (B, P, 8 * S, 8 * W)

    rng = np.random.RandomState(0)
    batch = {
        "prop_ext": jnp.asarray(rng.randint(0, 3, (B, P, S))),
        "prop_coor": jnp.asarray(rng.uniform(-1, W, (B, P, S)).astype(np.float32)),
        "prop_offset": jnp.asarray(rng.randn(B, P, S, W).astype(np.float32)),
        "prop_offset_mask": jnp.asarray(
            rng.randint(0, 2, (B, P, S, W)).astype(np.float32)),
        "prop_bi_seg": jnp.asarray(
            rng.randint(0, 2, (B, P, 8 * S, 8 * W)).astype(np.float32)),
        "lc_orient": jnp.asarray(rng.randint(0, 11, (B, S, S))),
        "semantic_label_raw": jnp.asarray(rng.randint(0, 3, (B, 8 * S, 8 * S))),
        "endp_map": jnp.asarray(
            rng.uniform(0, 1, (B, 8 * S, 8 * S)).astype(np.float32)),
    }
    res = column_proposal_loss(out, batch, head_hparams(cfg))
    assert np.isfinite(float(res["loss"]))
    assert set(res["loss_stats"]) == {
        "proposal_loss", "ext_loss2", "cls_loss2", "cls_mean_loss2",
        "cls_smooth_loss2", "endp_loss", "orient_loss", "binary_seg_loss",
        "offset_loss", "semantic_seg_loss"}
    for k, v in res["loss_stats"].items():
        assert np.isfinite(float(v)), k

    # orientation-consistency smoothness term (cls_smooth ablation flag)
    hp = head_hparams(cfg)
    hp["cls_smooth"] = True
    hp["cls_smooth_loss_w"] = 10.0
    res2 = column_proposal_loss(out, batch, hp)
    assert np.isfinite(float(res2["loss_stats"]["cls_smooth_loss2"]))


def test_segmentor_forward_and_loss(tiny_cfg):
    import copy
    cfg = tiny_cfg
    cfg.net = {"type": "Segmentor", "head_type": "seg", "loss_type": "ce"}
    B, img = 2, cfg.list_img_size_xy[0]
    model = build_model(cfg)
    proj = jnp.zeros((B, img, img, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), proj, train=False)
    out, _ = model.apply(variables, proj, train=True, mutable=["batch_stats"])
    assert out["semantic_seg"].shape == (B, img, img, 3)
    assert out["endp_est"].shape == (B, img, img, 1)
    rng = np.random.RandomState(0)
    batch = {
        "mask": jnp.asarray(rng.randint(0, 3, (B, img, img))),
        "endp_map": jnp.asarray(rng.uniform(0, 1, (B, img, img)).astype(np.float32)),
    }
    res = segmentor_loss(out, batch)
    assert np.isfinite(float(res["loss"]))


def test_vitsegnet_roundtrip_shape():
    from lanemapping_tpu.models.vit import VitSegNet
    m = VitSegNet(image_size=24, patch_h_size=8, patch_w_size=8, channels=64,
                  dim=128, depth=1, heads=4, dim_head=32)
    x = jnp.zeros((2, 24, 24, 64))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 24, 24, 128 // 64)


def test_patchify_inverse():
    from lanemapping_tpu.models.vit import patchify, unpatchify
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 4).astype(np.float32))
    t = patchify(x, 8)
    y = unpatchify(t, 2, 2, 8)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))


@pytest.mark.slow
def test_column_head_att_branches_shapes(tiny_cfg):
    """column_att and the column_transformer_decoder equivalent (the
    reference's own branch is broken: `polyline_fpn_vit_vertex_2.py:346-351`
    references modules never defined in __init__) produce the standard
    output contract."""
    import jax
    import jax.numpy as jnp
    from lanemapping_tpu.registry import build_heads

    cfg = tiny_cfg
    S, P = cfg.heads.row_size, cfg.heads.num_prop
    W = cfg.heads.prop_width + 2 * cfg.heads.prop_half_buff
    cfg.heads.dim_token = 64
    cfg.heads.tr_heads = 4
    cfg.heads.tr_dim_head = 16
    cfg.heads.tr_mlp_dim = 128
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, S, S, 2), jnp.float32)
    x_up = jnp.asarray(rng.randn(2, 2 * S, 2 * S, 8), jnp.float32)
    x_endp = jnp.asarray(rng.randn(2, 8 * S, 8 * S, 1), jnp.float32)
    for flag in ("column_att", "column_transformer_decoder"):
        cfg.column_att = flag == "column_att"
        cfg.column_transformer_decoder = flag == "column_transformer_decoder"
        head = build_heads(cfg)
        assert getattr(head, flag)
        variables = head.init(jax.random.PRNGKey(0), x, x_up, x_endp,
                              train=False)
        out = head.apply(variables, x, x_up, x_endp, train=False)
        assert out["proposal_conf"].shape == (2, P, 2)
        assert out["ext2"].shape == (2, P, S, 3)
        assert out["cls2"].shape == (2, P, S, W)
        assert out["offset2"].shape == (2, P, S, W)
        assert np.isfinite(np.asarray(out["cls2"])).all()


def test_s2d_stem_exactly_matches_7x7_stride2_stem():
    """Space-to-depth stem (VERDICT r4 MFU lever): conv4x4/s1 on the 2x2
    space-to-depth input with the transformed kernel reproduces the
    reference 7x7/s2 stem bit-for-bit at every output position (borders
    included), so ported checkpoints stay exact under `s2d_stem=True`."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from lanemapping_tpu.models.resnet_fpn import s2d_stem_kernel

    rng = np.random.RandomState(0)
    B, H, C, F = 2, 48, 3, 8
    x = jnp.asarray(rng.randn(B, H, H, C).astype(np.float32))
    w7 = rng.randn(7, 7, C, F).astype(np.float32)

    want = jax.lax.conv_general_dilated(
        x, jnp.asarray(w7), window_strides=(2, 2),
        padding=[(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x2 = x.reshape(B, H // 2, 2, H // 2, 2, C)
    x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, H // 2, 4 * C)
    got = jax.lax.conv_general_dilated(
        x2, jnp.asarray(s2d_stem_kernel(w7)), window_strides=(1, 1),
        padding=[(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    assert want.shape == got.shape == (B, H // 2, H // 2, F)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-5)


@pytest.mark.slow
def test_fpn_encoder_s2d_stem_forward(tiny_cfg):
    """FPNEncoder(s2d_stem=True) keeps the output contract."""
    import jax
    import jax.numpy as jnp
    from lanemapping_tpu.models.resnet_fpn import FPNEncoder

    m = FPNEncoder(resnet="resnet18", s2d_stem=True)
    x = jnp.zeros((1, 96, 96, 3), jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    fea, fea_up, bi_seg, endp = m.apply(vars_, x, train=False)
    assert fea.shape[1] == 12 and bi_seg.shape[1:3] == (96, 96)
    assert "conv1_s2d" in vars_["params"]
