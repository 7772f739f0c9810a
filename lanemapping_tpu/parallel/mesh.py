"""Device mesh + sharding policy.

The reference's distributed layer is NCCL DataParallel/DDP plumbing
(`/root/reference/baseline/engine/runner.py:44-104`,
`baseline/utils/dist_utils.py`).  TPU-native, that whole file collapses to a
`jax.sharding.Mesh` over the chips with the batch dimension sharded on the
``data`` axis and parameters replicated: XLA GSPMD inserts the gradient
all-reduce over ICI, and BatchNorm batch statistics become global (SyncBN)
for free because reductions under pjit are logical-array reductions.
"""

from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(cfg=None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    shape = dict(cfg.get("mesh_shape", {"data": -1})) if cfg else {"data": -1}
    axes = list(shape.keys())
    sizes = list(shape.values())
    n = len(devices)
    if sizes.count(-1) == 1:
        known = int(np.prod([s for s in sizes if s != -1])) or 1
        sizes[sizes.index(-1)] = n // known
    if len(sizes) == 1 and sizes[0] > n:
        sizes[0] = n  # fewer chips than the config asked for: shrink the axis
    total = int(np.prod(sizes))
    dev_array = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(dev_array, tuple(axes))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put a host batch with the leading axis split on ``data``.

    Single-host: a plain sharded device_put.  Multi-host (DCN): each process
    holds its local slice of the global batch and
    ``make_array_from_process_local_data`` assembles the logical array —
    the replacement for the reference's DistributedSampler
    (`datasets/registry.py:42-43`).
    """
    sh = batch_sharding(mesh)
    multi_host = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        if isinstance(v, (list, tuple)) and v and isinstance(v[0], str):
            continue  # metadata stays on host
        if multi_host:
            out[k] = jax.make_array_from_process_local_data(sh, np.asarray(v))
        else:
            out[k] = jax.device_put(v, sh)
    return out
