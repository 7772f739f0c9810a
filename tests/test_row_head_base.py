"""RowSharNotReducRef_Base head (dead-in-reference intermediate head,
`row_shared_base.py`): registry build, forward contract, loss reuse,
row-transformer gradient flow, Regr endpoint branch."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np


def _inputs(B=2, S=24, F=8, rng=None):
    rng = rng or np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, S, S, F), jnp.float32)
    x_up = jnp.asarray(rng.randn(B, 2 * S, 2 * S, F), jnp.float32)
    return x, x_up


def _head(S=24, P=12, endp_mode="endpoint"):
    from lanemapping_tpu.registry import HEADS, build_from_cfg
    return build_from_cfg(
        dict(type="RowSharNotReducRef_Base", dim_feat=8, row_size=S,
             dim_shared=32, num_prop=P, prop_width=2, prop_half_buff=4,
             dim_token=64, tr_heads=4, tr_dim_head=16, tr_mlp_dim=128,
             row_dim_token=32, row_tr_heads=4, row_tr_dim_head=8,
             row_tr_mlp_dim=64, endp_mode=endp_mode), HEADS)


@pytest.mark.slow
def test_base_forward_contract_matches_column_proposal():
    """Same output keys/shapes as ColumnProposal2 so the standard loss and
    decode apply (reference forward returns the same dict, `:426-559`)."""
    S, P, W = 24, 12, 10
    m = _head(S, P)
    x, x_up = _inputs(S=S)
    v = m.init(jax.random.PRNGKey(0), x, x_up, train=False)
    out, _ = m.apply(v, x, x_up, train=True, mutable=["batch_stats"])
    assert out["proposal_conf"].shape == (2, P, 2)
    assert out["ext2"].shape == (2, P, S, 3)
    assert out["cls2"].shape == (2, P, S, W)
    assert out["offset2"].shape == (2, P, S, W)
    assert out["orient"].shape == (2, S, S, 11)
    assert out["endpoint"].shape == (2, 8 * S, 8 * S, 1)
    assert out["prop_seg_small"].shape == (2, P, 2 * S, 2 * W)
    for k, a in out.items():
        assert np.all(np.isfinite(np.asarray(a, np.float32))), k


@pytest.mark.slow
def test_base_loss_reuses_column_proposal_loss_and_trains():
    from lanemapping_tpu.models.head_losses import column_proposal_loss

    S, P, W = 24, 12, 10
    m = _head(S, P)
    x, x_up = _inputs(S=S)
    v = m.init(jax.random.PRNGKey(0), x, x_up, train=False)

    rng = np.random.RandomState(1)
    img = 8 * S
    batch = {
        "prop_ext": rng.randint(0, 3, (2, P, S)).astype(np.uint8),
        "prop_coor": rng.uniform(-1, W, (2, P, S)).astype(np.float32),
        "prop_offset": rng.randn(2, P, S, W).astype(np.float32),
        "prop_offset_mask": rng.randint(0, 2, (2, P, S, W)).astype(np.float32),
        "lc_orient": rng.randint(0, 11, (2, S, S)).astype(np.uint8),
        "semantic_label_raw": rng.randint(0, 3, (2, img, img)).astype(np.uint8),
        "endp_map": np.where(rng.rand(2, img, img) > 0.99,
                             rng.rand(2, img, img), 0).astype(np.float32),
        "prop_inst": np.where(rng.rand(2, img, img) < 0.05,
                              rng.randint(0, 12, (2, img, img)),
                              255).astype(np.uint8),
        "prop_best": rng.randint(0, 12, (2, P)).astype(np.uint8),
    }
    batch = {k: jnp.asarray(v_) for k, v_ in batch.items()}
    hp = dict(row_size=S, num_prop=P, prop_fea_width=W, prop_width=2,
              prop_half_buff=4, ext_w=1.0,
              lambda_cls=1.0, mean_loss_w=1.0, orient_w=1.0,
              endp_loss_w=1.0, offset_w=1.0, spatial_att=True,
              cls_exp=True, cls_smooth=False, ext_smooth_w=0.0,
              endp_mode="endp_est", number_orients=11, seg_classes=3,
              fused_seg_focal=True, seg_focal_chunks=1, number_lanes=12)

    def loss_fn(params):
        out, _ = m.apply(params, x, x_up, train=True,
                         mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(2)})
        # the Net attaches the encoder's global heads (detector1stage);
        # stand-ins here — the head under test supplies everything else
        out["endp_est"] = out["endpoint"]
        out["semantic_seg"] = jnp.zeros((2, 8 * S, 8 * S, 3), jnp.float32)
        return column_proposal_loss(out, batch, hp)["loss"]

    l0, g = jax.value_and_grad(loss_fn)(v)
    assert np.isfinite(float(l0))
    # the row transformer (the mechanism unique to this head) gets gradient
    g_rt = jax.tree.leaves(g["params"]["tr_row_correlator"])
    assert any(float(jnp.abs(t).max()) > 0 for t in g_rt)
    v2 = jax.tree.map(lambda p, gr: p - 1e-2 * gr, v, g)
    assert float(loss_fn(v2)) < float(l0)


@pytest.mark.slow
def test_base_regr_endpoint_branch():
    from lanemapping_tpu.models.row_head_base import endp_regression_loss

    S = 24
    m = _head(S, 12, endp_mode="Regr")
    x, x_up = _inputs(S=S)
    v = m.init(jax.random.PRNGKey(0), x, x_up, train=False)
    out, _ = m.apply(v, x, x_up, train=True, mutable=["batch_stats"])
    assert out["endp_reg"].shape == (2, 4)
    assert np.all((np.asarray(out["endp_reg"]) >= 0)
                  & (np.asarray(out["endp_reg"]) <= 1))
    batch = {"initp": jnp.asarray([[[12.0, 3.0]], [[0.0, 0.0]]]),
             "endp": jnp.asarray([[[20.0, 9.0]], [[0.0, 0.0]]])}
    l = endp_regression_loss(out, batch, img_size=8 * S)
    assert np.isfinite(float(l)) and float(l) >= 0
