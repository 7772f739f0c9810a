"""KLane-baseline head tests (RowSharNotReducRef, GridSeg)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np


@pytest.mark.slow
def test_row_shar_forward_and_loss():
    from lanemapping_tpu.models.row_head import (RowSharNotReducRef,
                                                 row_shar_loss)

    S, N, F = 24, 4, 8
    m = RowSharNotReducRef(dim_feat=F, row_size=S, dim_shared=32, n_lanes=N,
                           dim_token=64, tr_heads=4, tr_dim_head=16,
                           tr_mlp_dim=128)
    x = jnp.asarray(np.random.RandomState(0).randn(2, S, S, F), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert out["ext"].shape == (2, N, S, 2)
    assert out["cls"].shape == (2, N, S, S)
    assert out["ext2"].shape == (2, N, S, 2)
    # probabilities sum to one
    np.testing.assert_allclose(np.asarray(out["cls2"].sum(-1)), 1.0,
                               rtol=1e-5)

    label = np.full((2, S, S), 255, np.int64)
    label[:, 5:20, 10] = 1  # one lane
    res = row_shar_loss(out, {"label": jnp.asarray(label)}, n_lanes=N,
                        row_size=S)
    assert np.isfinite(float(res["loss"]))
    assert set(res["loss_stats"]) == {"ext_loss", "cls_loss", "ext_loss2",
                                      "cls_loss2"}


@pytest.mark.slow
def test_grid_seg_forward_and_loss():
    from lanemapping_tpu.models.row_head import GridSeg, grid_seg_loss

    m = GridSeg(num_1=8, num_2=16, num_classes=5)
    x = jnp.zeros((2, 144, 144, 8))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out["conf"].shape == (2, 144, 144)
    assert out["cls"].shape == (2, 144, 144, 5)
    label = np.zeros((2, 144, 144), np.int64)
    label[:, 10:100, 50] = 2
    res = grid_seg_loss(out, {"label": jnp.asarray(label)}, num_classes=5)
    assert np.isfinite(float(res["loss"]))


@pytest.mark.slow
def test_pixel_seg_forward_loss_decode():
    """PixelSeg: working realisation of the reference's broken stub
    (`pixel_seg.py` references undefined num_1) — registry build, per-pixel
    class logits, CE loss learns, argmax+palette decode."""
    from lanemapping_tpu.models.row_head import (pixel_seg_decode,
                                                 pixel_seg_loss)
    from lanemapping_tpu.registry import HEADS, build_from_cfg

    S, C = 24, 5
    m = build_from_cfg(dict(type="PixelSeg", num_1=8, num_2=16,
                            num_classes=C), HEADS)
    x = jnp.asarray(np.random.RandomState(1).randn(2, S, S, 8), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=True)
    assert out["cls"].shape == (2, S, S, C)

    label = np.zeros((2, S, S), np.int64)
    label[:, 3:9, 4:7] = 2
    res = pixel_seg_loss(out, {"label": jnp.asarray(label)}, num_classes=C)
    assert np.isfinite(float(res["loss"]))

    # one gradient step reduces the loss (the head is trainable end to end)
    def loss_fn(params):
        o = m.apply(params, x, train=True)
        return pixel_seg_loss(o, {"label": jnp.asarray(label)},
                              num_classes=C)["loss"]
    l0, g = jax.value_and_grad(loss_fn)(v)
    v2 = jax.tree.map(lambda p, gr: p - 0.5 * gr, v, g)
    assert float(loss_fn(v2)) < float(l0)

    dec = pixel_seg_decode(out)
    assert dec["cls_map"].shape == (2, S, S)
    assert dec["rgb"].shape == (2, S, S, 3) and dec["rgb"].dtype == jnp.uint8
