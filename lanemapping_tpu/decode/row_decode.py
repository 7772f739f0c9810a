"""KLane row-head decode: per-lane argmax maps + lane-map assembly.

Parity with the reference `RowSharNotReducRef.get_exist_coor_endp_dict`
(`/root/reference/baseline/models/heads/row_shared_not_reduc_ref.py:334-393`),
which loops batch x 12 lanes x 144 rows on host; here one vectorised scatter.
``row_lane_maps`` is the host-side half of the reference's
`get_lane_map_numpy_with_label` (`:440-546`) feeding the `infer_lane`
export driver (`engine/runner.py:473-604`).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


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


def row_lane_maps(pred: Dict, cfg, head_type: str) -> Dict:
    """Lane-map assembly for the KLane grid heads (NumPy, host side).

    Reproduces the reference's per-lane vertex extraction + greedy smoothing
    with an all-vertical orientation prior
    (`row_shared_not_reduc_ref.py:505-521`: ``pred_lines[line_id, row] =
    col / 144 * 1152 + 4`` then ``smooth_cls_line_per_batch(pred_lines,
    orient_map=5, complete_inner_nodes=True)``), emitting the shared
    ``cls_offset_smooth`` [B, N, S, 2] (col, semantic) contract so
    `lane_records` / `render_lane_overlays` apply unchanged.  KLane heads
    carry no per-vertex semantics; vertices export as solid (1).

    Orientation note: the reference trains the row head on flipped labels
    and un-flips at decode (`:497-503` ``is_flip``); this port trains and
    decodes in the unflipped frame (`models/row_head.py row_shar_loss`),
    except GridSeg whose loss formats labels with the reference's
    double-flip (`grid_seg.py:55-56`) — its maps are un-flipped here.

    ``pred``: RowSharNotReducRef -> `decode_row_lanes` output
    (cls [B,N+1,S,S] existence-masked one-hots); GridSeg -> raw head output
    (conf [B,S,S] sigmoid, cls [B,S,S,C] logits).
    """
    from .postprocess import smooth_lanes

    if head_type == "GridSeg":
        conf = np.asarray(pred["conf"])[:, ::-1, ::-1]
        cls_logits = np.asarray(pred["cls"])[:, ::-1, ::-1]
        n_cls = cls_logits.shape[-1]
        n_lanes = n_cls - 1  # last class is background (grid_seg_loss)
        cls_idx = np.argmax(cls_logits, axis=-1)
        lane_px = (cls_idx < n_lanes) & (conf > cfg.get("conf_thr", 0.3))
        cls_idx = np.where(lane_px, cls_idx, 255)
    else:  # RowSharNotReducRef
        cls_maps = np.asarray(pred["cls"])  # [B, N+1, S, S]
        n_lanes = cls_maps.shape[1] - 1
        lane_px = cls_maps[:, :n_lanes].max(axis=1) > 0.5
        cls_idx = np.where(lane_px, np.argmax(cls_maps[:, :n_lanes], axis=1),
                           255)

    B, S = cls_idx.shape[0], cls_idx.shape[1]
    orient_vertical = np.full((S, S), 5.0)
    smooth, idx_maps = [], []
    for b in range(B):
        pred_lines = np.full((n_lanes, S), -1.0)
        rows, cols = np.nonzero(cls_idx[b] != 255)
        # reference `:507-509`: col/row_size*1152 + 4 (several pixels per
        # row keep the last, as np fancy-assignment does there too)
        pred_lines[cls_idx[b, rows, cols], rows] = cols / S * 1152.0 + 4.0
        ply = smooth_lanes(pred_lines, orient_vertical,
                           complete_inner_nodes=True)
        smooth.append(np.stack(
            [ply, np.where(ply > 0, 1.0, 0.0)], axis=-1))
        idx_maps.append(cls_idx[b])
    return {"cls_offset_smooth": np.stack(smooth),
            "cls_idx": np.stack(idx_maps)}
