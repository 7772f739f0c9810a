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


def test_all_gather_host_resplits_gathered_tree(monkeypatch):
    """`process_allgather` returns ONE tree whose leaves gained a leading
    process axis; `all_gather_host` must re-split it into per-process trees
    (the first true 2-process run — MULTIHOST.json — caught `list(tree)`
    yielding dict keys instead).  Fake the 2-process regime here so the
    contract is pinned in the single-process suite too."""
    import jax

    from lanemapping_tpu.parallel import dist
    from jax.experimental import multihost_utils

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(
        multihost_utils, "process_allgather",
        lambda tree: jax.tree_util.tree_map(
            lambda leaf: np.stack([np.asarray(leaf)] * 2), tree))
    out = dist.all_gather_host({"a": 1.5, "b": np.arange(3.0)})
    assert len(out) == 2
    for g in out:
        assert set(g) == {"a", "b"}
        assert float(g["a"]) == 1.5
        np.testing.assert_allclose(g["b"], np.arange(3.0))


def test_loader_rank_sharding_disjoint_coverage():
    """DistributedSampler equivalent (reference `datasets/registry.py:42-43`
    + `set_epoch`, `runner.py:213-214`): fake 2 processes' index streams and
    assert each global batch is assembled from disjoint rank slices and one
    epoch covers every sample exactly once."""
    from lanemapping_tpu.data.loader import Loader

    class IdxDataset:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            return {"idx": np.array([i]), "x": np.full((2, 2), i, np.float32)}

    loaders = [Loader(IdxDataset(), batch_size=4, shuffle=True, seed=7,
                      num_threads=1, process_index=r, process_count=2)
               for r in range(2)]
    streams = [list(ld) for ld in loaders]
    assert len(streams[0]) == len(streams[1]) == 4
    seen = []
    for b0, b1 in zip(*streams):
        # each process loads exactly its half of the global batch
        assert b0["idx"].shape[0] == b1["idx"].shape[0] == 2
        g = np.concatenate([b0["idx"], b1["idx"]]).ravel()
        assert len(set(g.tolist())) == 4  # disjoint within the global batch
        seen.extend(g.tolist())
    assert sorted(seen) == list(range(16))  # exact epoch coverage

    # epoch 2 reshuffles identically on both ranks (set_epoch semantics)
    s2 = [list(ld) for ld in loaders]
    seen2 = sorted(np.concatenate(
        [b["idx"].ravel() for s in s2 for b in s]).tolist())
    assert seen2 == list(range(16))
    first_epoch_order = [b["idx"].ravel().tolist() for b in streams[0]]
    second_epoch_order = [b["idx"].ravel().tolist() for b in s2[0]]
    assert first_epoch_order != second_epoch_order


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


@pytest.mark.slow
def test_sharded_streaming_decode_equals_single_device(tiny_cfg):
    """The stream_map SPMD inference program (fused forward + XLA decode,
    batch sharded over the 8-device mesh) must return a batch-sharded decode
    dict numerically equal to the single-device run (VERDICT r2 #3)."""
    import jax
    import jax.numpy as jnp
    from lanemapping_tpu.decode.lane_decode import decode_lanes, \
        host_decode_view
    from lanemapping_tpu.models.nets import build_model
    from lanemapping_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                               replicated)

    cfg = tiny_cfg
    img = cfg.list_img_size_xy[0]
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    proj_u8 = np.asarray(
        jax.random.randint(rng, (8, img, img, 3), 0, 256, jnp.int32),
        np.uint8)
    variables = model.init(rng, jnp.zeros((1, img, img, 3)), train=False)

    def fwd_dec(v, p):
        x = p.astype(jnp.float32) / 255.0
        return host_decode_view(decode_lanes(
            model.apply(v, x, train=False), cfg))

    # single device
    want = jax.device_get(jax.jit(fwd_dec)(
        jax.device_put(variables, jax.devices()[0]),
        jax.device_put(proj_u8, jax.devices()[0])))

    # 8-device data-parallel
    mesh = make_mesh(None)
    assert mesh.devices.size == 8
    v8 = jax.device_put(variables, replicated(mesh))
    p8 = jax.device_put(proj_u8, batch_sharding(mesh))
    got_dev = jax.jit(fwd_dec)(v8, p8)
    # the decode dict must be batch-sharded over the mesh
    assert len(got_dev["cls_offset"].addressable_shards) == 8
    assert got_dev["cls_offset"].addressable_shards[0].data.shape[0] == 1
    got = jax.device_get(got_dev)

    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k], np.float32), np.asarray(want[k], np.float32),
            rtol=2e-4, atol=2e-4, err_msg=k)
