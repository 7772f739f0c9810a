"""Multi-host process utilities.

TPU-native replacement for the reference's NCCL plumbing
(`/root/reference/baseline/utils/dist_utils.py:30-195`,
`engine/runner.py:44-55`): ``jax.distributed.initialize`` handles rendezvous,
GSPMD inserts the collectives, and what remains is process-rank gating for
logging/checkpointing plus a couple of host-data gather helpers.
"""

from __future__ import annotations

import os
from typing import Any, List, Optional

import jax
import numpy as np


def maybe_initialize_distributed(coordinator: Optional[str] = None,
                                 num_processes: Optional[int] = None,
                                 process_id: Optional[int] = None) -> None:
    """Multi-host init (DCN).  A no-op single-process unless the standard
    env (COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID) or args are set."""
    coordinator = coordinator or os.environ.get("COORDINATOR_ADDRESS")
    if coordinator is None:
        return
    # NB: rank 0 is falsy — `process_id or env[...]` would misroute the
    # coordinator process (first 2-process run caught exactly this)
    if num_processes is None:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None:
        process_id = int(os.environ["PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(num_processes),
        process_id=int(process_id))


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def dist_print(*args, **kwargs) -> None:
    """Rank-0-gated print (reference `dist_utils.py:38-41`)."""
    if is_main_process():
        print(*args, **kwargs)


def synchronize() -> None:
    """Cross-process barrier (reference `dist_utils.py:43-55`).

    A local ``pmap`` psum only reduces over THIS process's devices and so
    never blocks on peers; the real barrier is the coordination-service
    rendezvous in ``sync_global_devices``."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("lanemapping_tpu.synchronize")


def all_gather_host(value: Any) -> List[Any]:
    """Gather a host pytree of scalars/arrays from all processes, returning
    a list of per-process trees (reference `dist_utils.py:112-152`).

    ``process_allgather`` returns ONE tree whose leaves gained a leading
    process axis — iterating it yields dict keys, not per-process values
    (the first true 2-process run caught exactly this) — so re-split the
    leaves here.  Leaves must be same-shape across processes.
    """
    if jax.process_count() == 1:
        return [value]
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(value)
    leaves, treedef = jax.tree_util.tree_flatten(gathered)
    return [jax.tree_util.tree_unflatten(treedef, [leaf[p] for leaf in leaves])
            for p in range(jax.process_count())]


def all_reduce_mean_host(x: np.ndarray) -> np.ndarray:
    """Mean over processes of a host array (reference `dist_utils.py:94-109`)."""
    gathered = all_gather_host(np.asarray(x))
    return np.mean(np.stack(gathered), axis=0)
