"""Checkpoint-porter tests + torch-vs-JAX numeric parity of core ops.

torch(cpu) is available in this image, so the layout conventions the porter
relies on (conv HWIO transpose, align-corners bilinear, BN eval semantics)
are checked against torch directly.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F


def test_resize_matches_torch_align_corners():
    import jax.numpy as jnp
    from lanemapping_tpu.ops.interp import resize_bilinear_ac

    rng = np.random.RandomState(0)
    x = rng.randn(2, 9, 13, 5).astype(np.float32)
    for out_hw in [(18, 26), (36, 52), (5, 7), (144, 144)]:
        want = F.interpolate(torch.tensor(x).permute(0, 3, 1, 2),
                             size=out_hw, mode="bilinear",
                             align_corners=True).permute(0, 2, 3, 1).numpy()
        got = np.asarray(resize_bilinear_ac(jnp.asarray(x), *out_hw))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_upsample_then_avgpool_matches_torch():
    import jax.numpy as jnp
    from lanemapping_tpu.ops.interp import upsample_then_avgpool

    rng = np.random.RandomState(1)
    x = rng.randn(1, 48, 20, 3).astype(np.float32)
    t = torch.tensor(x).permute(0, 3, 1, 2)
    up = F.interpolate(t, size=(192, 80), mode="bilinear", align_corners=True)
    want = F.avg_pool2d(up, kernel_size=8).permute(0, 2, 3, 1).numpy()
    got = np.asarray(upsample_then_avgpool(jnp.asarray(x), 192, 80, 8))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_conv_layout_matches_torch():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    rng = np.random.RandomState(2)
    x = rng.randn(1, 16, 16, 4).astype(np.float32)
    w = rng.randn(8, 4, 3, 3).astype(np.float32)  # torch OIHW
    b = rng.randn(8).astype(np.float32)
    want = F.conv2d(torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(w),
                    torch.tensor(b), stride=2, padding=1)
    want = want.permute(0, 2, 3, 1).numpy()

    conv = nn.Conv(8, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
    v = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    v = {"params": {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                    "bias": jnp.asarray(b)}}
    got = np.asarray(conv.apply(v, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sigmoid_focal_matches_torchvision_formula():
    import jax.numpy as jnp
    from lanemapping_tpu.ops.losses import sigmoid_focal_loss

    rng = np.random.RandomState(3)
    logits = rng.randn(64).astype(np.float32)
    targets = (rng.rand(64) > 0.5).astype(np.float32)
    t_l = torch.tensor(logits)
    t_t = torch.tensor(targets)
    p = torch.sigmoid(t_l)
    ce = F.binary_cross_entropy_with_logits(t_l, t_t, reduction="none")
    p_t = p * t_t + (1 - p) * (1 - t_t)
    want = (ce * ((1 - p_t) ** 2))
    alpha_t = 0.25 * t_t + 0.75 * (1 - t_t)
    want = (alpha_t * want).numpy()
    got = np.asarray(sigmoid_focal_loss(jnp.asarray(logits),
                                        jnp.asarray(targets)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_porter_maps_fabricated_state_dict(tiny_cfg):
    """Fabricate a torch state_dict with reference names/shapes derived by
    inverse transform from our parameter tree, then port and verify values."""
    import jax
    import jax.numpy as jnp
    from lanemapping_tpu.models.nets import build_model
    from lanemapping_tpu.tools.port_torch_ckpt import (build_rules,
                                                       port_state_dict)

    cfg = tiny_cfg
    model = build_model(cfg)
    img = cfg.list_img_size_xy[0]
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, img, img, 3)), train=False)
    params = jax.device_get(variables["params"])
    bstats = jax.device_get(variables.get("batch_stats", {}))

    rules = build_rules(vit_depth=cfg.backbone.depth)
    rng = np.random.RandomState(0)
    sd = {}

    def get(tree, path):
        node = tree
        for p in path.split("/"):
            if p not in node:
                return None
            node = node[p]
        return node

    inverse = {None: lambda v: v,
               }
    n_expected = 0
    for t_key, j_path, tf in rules:
        if tf == "bn":
            scale = get(params, j_path + "/scale")
            if scale is None:
                continue
            sd[t_key + ".weight"] = rng.randn(*scale.shape).astype(np.float32)
            sd[t_key + ".bias"] = rng.randn(*scale.shape).astype(np.float32)
            sd[t_key + ".running_mean"] = rng.randn(*scale.shape).astype(
                np.float32)
            sd[t_key + ".running_var"] = rng.rand(*scale.shape).astype(
                np.float32) + 0.5
            n_expected += 1
            continue
        leaf = get(params, j_path)
        if leaf is None:
            continue
        shape = np.shape(leaf)
        if tf is None:
            torch_shape = shape
        elif tf.__name__ == "_conv":
            torch_shape = (shape[3], shape[2], shape[0], shape[1])
        elif tf.__name__ == "_dense":
            torch_shape = (shape[1], shape[0])
        elif tf.__name__ == "_conv1d_dense":
            torch_shape = (shape[1], shape[0], 1)
        sd[t_key] = rng.randn(*torch_shape).astype(np.float32)
        n_expected += 1

    new_params, new_bs, report = port_state_dict(sd, params, bstats, rules)
    assert len(report["ported"]) >= n_expected
    assert not report["unused_torch"], report["unused_torch"][:5]
    # spot-check one conv and one dense transform landed transposed
    w = sd["pcencoder.fpn.conv1.weight"]
    np.testing.assert_allclose(new_params["pcencoder"]["conv1"]["kernel"],
                               np.transpose(w, (2, 3, 1, 0)))
    q = sd["backbone.transformer.layers.0.0.fn.to_qkv.weight"]
    np.testing.assert_allclose(
        new_params["backbone"]["transformer"]["block0"]["attn"]["to_qkv"][
            "kernel"], np.transpose(q, (1, 0)))
    # BN running stats landed in batch_stats
    m = sd["pcencoder.fpn.bn1.running_mean"]
    np.testing.assert_allclose(new_bs["pcencoder"]["bn1"]["mean"], m)


def test_load_torch_state_dict_mmcv_formats(tmp_path):
    """mmcv_custom/checkpoint.py file-format semantics: container
    extraction ({state_dict|model|net}), DataParallel `module.` strip, and
    the mmcls `backbone.` remap (`_process_mmcls_checkpoint:214-222`)."""
    import torch
    from lanemapping_tpu.tools.port_torch_ckpt import load_torch_state_dict

    w = torch.arange(6, dtype=torch.float32).reshape(2, 3)
    # mmcls-style container: backbone.-prefixed keys + a head to drop
    p1 = str(tmp_path / "mmcls.pth")
    torch.save({"state_dict": {"backbone.patch_embed.weight": w,
                               "head.fc.weight": w}}, p1)
    sd = load_torch_state_dict(p1, mmcls=True)
    assert list(sd) == ["patch_embed.weight"]

    # DataParallel 'module.' prefix inside a 'model' container
    p2 = str(tmp_path / "dp.pth")
    torch.save({"model": {"module.layer1.weight": w}}, p2)
    sd = load_torch_state_dict(p2)
    assert list(sd) == ["layer1.weight"]
