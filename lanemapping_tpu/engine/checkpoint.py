"""Checkpoint save/load on orbax.

Parity with the reference's ckpt surface (`net_utils.py:10-45`,
`runner.py:118-122,344-361`): periodic `epoch_N` + `best` checkpoints holding
net/optimizer/step, strict load for resume, and a shape-filtered load for
finetuning.  Unlike the reference (which saves optimizer state but never
restores it, SURVEY.md §5.4), resume here restores the full state.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


def _ckpt_dir(log_dir: str) -> str:
    d = os.path.join(os.path.abspath(log_dir), "ckpt")
    os.makedirs(d, exist_ok=True)
    return d


def save_model(log_dir: str, state: TrainState, tag: str) -> str:
    path = os.path.join(_ckpt_dir(log_dir), tag)
    ckptr = ocp.StandardCheckpointer()
    host_state = jax.device_get(state)
    ckptr.save(path, host_state, force=True)
    ckptr.wait_until_finished()
    return path


def load_model(path: str, template: TrainState) -> TrainState:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)


def load_network_filtered(path: str, template: TrainState) -> TrainState:
    """Finetune load: keep only entries whose shapes match the template
    (reference `net_utils.py:23-33`)."""
    ckptr = ocp.PyTreeCheckpointer()
    raw = ckptr.restore(path)

    def merge(t, r):
        if isinstance(t, dict):
            return {k: merge(t[k], r[k]) if isinstance(r, dict) and k in r
                    else t[k] for k in t}
        if r is not None and np.shape(t) == np.shape(r):
            return np.asarray(r)
        return t

    params = merge(jax.device_get(template.params), raw.get("params", {}))
    bs = merge(jax.device_get(template.batch_stats),
               raw.get("batch_stats", {}))
    return template.replace(params=params, batch_stats=bs)
