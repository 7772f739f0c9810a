"""KLane row-head decode: per-lane argmax maps.

Parity with the reference `RowSharNotReducRef.get_exist_coor_endp_dict`
(`/root/reference/baseline/models/heads/row_shared_not_reduc_ref.py:334-393`),
which loops batch x 12 lanes x 144 rows on host; here one vectorised scatter.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def decode_row_lanes(out: Dict, n_lanes: int) -> Dict:
    """out['ext2'] [B,N,S,2], out['cls2'] [B,N,S,S] (softmax probs)
    -> conf [B,S,S] and per-lane cls maps [B,N+1,S,S]."""
    ext = jnp.argmax(out["ext2"], axis=-1)  # 0 = lane exists (reference `:351`)
    corr = jnp.argmax(out["cls2"], axis=-1)  # [B,N,S]
    B, N, S = corr.shape
    onehot = jnp.zeros((B, N, S, S), out["cls2"].dtype)
    rows = jnp.arange(S)
    onehot = onehot.at[
        jnp.arange(B)[:, None, None],
        jnp.arange(N)[None, :, None],
        rows[None, None, :],
        corr].set(1.0)
    exist = (ext == 0)[..., None].astype(onehot.dtype)  # [B,N,S,1]
    cls_maps = onehot * exist
    bg = jnp.max(cls_maps, axis=1, keepdims=True)  # any-lane map
    conf = bg[:, 0]
    return {"conf": conf, "cls": jnp.concatenate([cls_maps, bg], axis=1)}
