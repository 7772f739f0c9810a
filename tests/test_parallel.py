"""Mesh/sharding + process-utility tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest


def test_mesh_and_batch_sharding():
    import jax
    from lanemapping_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                               replicated, shard_batch)

    mesh = make_mesh(None)
    assert mesh.devices.size == 8
    batch = {"proj": np.ones((8, 16, 16, 3), np.float32),
             "image_name": ["a"] * 8}
    db = shard_batch(batch, mesh)
    assert "image_name" not in db
    arr = db["proj"]
    assert arr.shape == (8, 16, 16, 3)
    # one tile per device on the data axis
    assert len(arr.addressable_shards) == 8
    assert arr.addressable_shards[0].data.shape == (1, 16, 16, 3)

    # replicated params live whole on every device
    p = jax.device_put(np.ones((4, 4)), replicated(mesh))
    assert p.addressable_shards[0].data.shape == (4, 4)


def test_mesh_subset_and_config_shapes():
    from lanemapping_tpu.parallel.mesh import make_mesh
    from lanemapping_tpu.config.config import Config

    cfg = Config.fromdict({"mesh_shape": {"data": 2}})
    mesh = make_mesh(cfg)
    assert mesh.devices.size == 2
    cfg2 = Config.fromdict({"mesh_shape": {"data": -1}})
    assert make_mesh(cfg2).devices.size == 8


def test_dist_helpers_single_process():
    from lanemapping_tpu.parallel import dist

    assert dist.get_rank() == 0
    assert dist.get_world_size() == 1
    assert dist.is_main_process()
    dist.synchronize()  # no-op single process
    assert dist.all_gather_host({"x": 1}) == [{"x": 1}]
    np.testing.assert_allclose(dist.all_reduce_mean_host(np.arange(3.0)),
                               np.arange(3.0))


def test_global_batch_stats_under_pjit():
    """BatchNorm batch statistics are computed over the GLOBAL batch under
    pjit (implicit SyncBN — the reference needs explicit
    SyncBatchNorm.convert_sync_batchnorm, `runner.py:99-101`)."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from lanemapping_tpu.parallel.mesh import make_mesh, replicated, \
        shard_batch

    mesh = make_mesh(None)
    bn = nn.BatchNorm(use_running_average=False, momentum=0.0)
    # per-device-distinct data: global mean != any local mean
    x = np.arange(8, dtype=np.float32).reshape(8, 1, 1, 1) * \
        np.ones((8, 4, 4, 1), np.float32)
    v = bn.init(jax.random.PRNGKey(0), x)
    v = jax.device_put(v, replicated(mesh))
    db = shard_batch({"x": x}, mesh)

    @jax.jit
    def step(v, x):
        _, upd = bn.apply(v, x, mutable=["batch_stats"])
        return upd["batch_stats"]["mean"]

    mean = np.asarray(step(v, db["x"]))
    np.testing.assert_allclose(mean, [x.mean()], rtol=1e-6)
