"""Swin backbone contract tests."""

import numpy as np
import pytest


@pytest.mark.slow
def test_swin_stages_and_shapes():
    import jax
    import jax.numpy as jnp
    from lanemapping_tpu.models.swin import SwinTransformer

    m = SwinTransformer(patch_size=4, embed_dim=32, depths=(2, 2),
                        num_heads=(2, 4), window_size=4, out_indices=(0, 1))
    x = jnp.zeros((2, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert outs[0].shape == (2, 16, 16, 32)
    assert outs[1].shape == (2, 8, 8, 64)


@pytest.mark.slow
def test_swin_shifted_window_mask_changes_output():
    import jax
    import jax.numpy as jnp
    from lanemapping_tpu.models.swin import SwinBlock

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    b0 = SwinBlock(16, 2, 4, shift=0)
    b1 = SwinBlock(16, 2, 4, shift=2)
    v0 = b0.init(jax.random.PRNGKey(1), x)
    y0 = b0.apply(v0, x)
    y1 = b1.apply(v0, x)  # same params, shifted windows -> different mixing
    assert y0.shape == y1.shape == x.shape
    assert not np.allclose(np.asarray(y0), np.asarray(y1))


def test_window_partition_roundtrip():
    import jax.numpy as jnp
    from lanemapping_tpu.models.swin import window_partition, window_reverse

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 12, 5).astype(np.float32))
    w = window_partition(x, 4)
    assert w.shape == (2 * 2 * 3, 16, 5)
    y = window_reverse(w, 4, 8, 12)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))
