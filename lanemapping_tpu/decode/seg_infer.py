"""Segmentor inference: thresholded semantic map + endpoint peaks.

Parity with the reference `PostProjector2.infer_validate`
(`/root/reference/baseline/models/pcencoder/postprojector.py:115-183`):
3-way semantic argmax with threshold, then clustered top-K endpoint picking
(here the XLA clustering from `lane_decode.py`).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from .lane_decode import decode_endpoints


def segmentor_infer(out: Dict, seg_thre: float = 0.1,
                    n_lanes: int = 12) -> Dict:
    logits = out["semantic_seg"].astype(jnp.float32)  # [B,H,W,3]
    p = logits  # reference thresholds raw channel scores, not softmax
    p1, p2 = p[..., 1], p[..., 2]
    seg = jnp.where((p1 > p2) & (p1 > seg_thre), 1,
                    jnp.where((p2 > p1) & (p2 > seg_thre), 2, 0))
    coords, valid = decode_endpoints(out["endp_est"][..., 0],
                                     num_cls=n_lanes, top_k=100)
    B, H, W = seg.shape
    # scatter endpoint reps into a binary map
    bidx = jnp.arange(B)[:, None]
    hh = jnp.clip(coords[..., 0].astype(jnp.int32), 0, H - 1)
    ww = jnp.clip(coords[..., 1].astype(jnp.int32), 0, W - 1)
    endp = jnp.zeros((B, H, W), jnp.float32).at[
        bidx, hh, ww].max(valid.astype(jnp.float32))
    return {"seg": seg, "endp": endp}
