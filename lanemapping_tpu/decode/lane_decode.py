"""XLA lane decode: raw head maps -> per-proposal coordinates & endpoints.

Functional parity with the reference decode
(`/root/reference/baseline/models/heads/polyline_fpn_vit_vertex_2.py:602-759`),
which mixes GPU softmaxes with a host-side triple Python loop over
(batch, 72 proposals, 144 rows) plus sklearn DBSCAN.  Here the whole decode
is shape-static XLA: the +-2-neighbourhood expectation is a masked gather +
re-softmax (note the reference softmaxes the already-softmaxed window probs —
reproduced), and DBSCAN endpoint clustering becomes fixed-iteration
single-linkage label propagation on the top-K score peaks
(DBSCAN(eps, min_samples=1) == connected components of the eps-graph).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

LOCAL_WIDTH = 2  # +-2 neighbourhood (reference `:700`)


def window_expectation(cls_probs: jnp.ndarray) -> jnp.ndarray:
    """Expected column inside the +-2 window around the argmax.

    ``cls_probs``: softmaxed [**, W] class probabilities.  Reference
    semantics (`:717-726`): window j in [max(0, i-2), min(W-1, i+3)),
    re-softmax the probs inside the window, expectation over j.
    """
    W = cls_probs.shape[-1]
    idx = jnp.argmax(cls_probs, axis=-1)  # [...]
    offs = jnp.arange(-LOCAL_WIDTH, LOCAL_WIDTH + 1)
    j = idx[..., None] + offs  # [..., 5]
    valid = (j >= 0) & (j <= W - 2)  # right bound exclusive at W-1
    jc = jnp.clip(j, 0, W - 1)
    # one-hot contraction instead of take_along_axis (TPU gathers are
    # serial; the window is only W wide)
    p = jnp.einsum("...jw,...w->...j",
                   jax.nn.one_hot(jc, W, dtype=cls_probs.dtype), cls_probs)
    p = jnp.where(valid, p, -jnp.inf)
    pw = jax.nn.softmax(p, axis=-1)
    pw = jnp.where(valid, pw, 0.0)
    return jnp.sum(pw * jc.astype(pw.dtype), axis=-1)


def cluster_peaks(coords: jnp.ndarray, radius: float):
    """Single-linkage radius clustering of [K,2] points.

    Returns (rep_coords [K,2], rep_valid [K], n_clusters): one representative
    per cluster — the member closest to the cluster centroid, matching the
    reference's `cluster_select_topK_pts` (`:903-924`).  Padded slots carry
    rep_valid=False.

    Labels run min-propagation over the eps-graph to a **fixpoint**
    (`lax.while_loop` on label change), with pointer-jumping
    (``labels = labels[labels]``) interleaved so chains of diameter D converge
    in O(log D) rounds instead of D — DBSCAN(eps, min_samples=1) is exactly
    the connected components of the eps-graph, including long chain
    topologies (each hop <= eps even when the chain spans >> eps).
    """
    K = coords.shape[0]
    pts = coords.astype(jnp.float32)
    d2 = jnp.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    adj = d2 <= radius * radius  # includes self

    labels0 = jnp.arange(K, dtype=jnp.int32)

    def cond(carry):
        _, changed = carry
        return changed

    def body(carry):
        labels, _ = carry
        # one hop of neighbour-min propagation ...
        lab_mat = jnp.where(adj, labels[None, :], K)
        new = jnp.min(lab_mat, axis=1).astype(jnp.int32)
        # ... then pointer-jump: labels are member indices, so chase the
        # label of my label (monotone non-increasing => loop terminates)
        new = jnp.minimum(new, new[new])
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(cond, body, (labels0, jnp.bool_(True)))

    # per-cluster centroid (clusters are keyed by their min member index)
    onehot = (labels[:, None] == jnp.arange(K)[None, :]).astype(jnp.float32)
    sizes = jnp.sum(onehot, axis=0)  # [K] members per label id
    cent = (onehot.T @ pts) / jnp.maximum(sizes[:, None], 1.0)  # [K,2]
    # member nearest to its cluster centroid
    dc = jnp.sum((pts - cent[labels]) ** 2, axis=-1)  # [K]
    big = jnp.float32(1e12)
    d_mat = jnp.where(onehot.T > 0, dc[None, :], big)  # [K(label), K(member)]
    rep_idx = jnp.argmin(d_mat, axis=1)  # [K]
    rep_valid = sizes > 0
    rep_coords = pts[rep_idx]
    return rep_coords, rep_valid, jnp.sum(rep_valid.astype(jnp.int32))


def decode_endpoints(endp_logits: jnp.ndarray, num_cls: int,
                     clip_w: int = 20, radius=20.0,
                     top_k: int = None, exact_topk: bool = False,
                     score_thre=0.0):
    """Endpoint extraction (reference `:638-688`): sigmoid the heatmap,
    crop a ``clip_w`` border, take the top-K scores, cluster within
    ``radius`` and keep one representative per cluster.

    The reference's adaptive-K loop grows K from num_cls*2*10 until >4
    clusters emerge or K>500; we take the K=num_cls*2*10 snapshot directly
    (peaks beyond the top-240 scores are noise in practice).

    ``exact_topk``: use a full-sort ``lax.top_k`` instead of the TPU-native
    ``approx_max_k`` partial reduction (cfg ``endp_decode='exact_topk'``;
    measured ~7% slower end-to-end, see ARCHITECTURE.md).

    ``score_thre`` (cfg ``endp_score_thre``): drop candidate peaks whose
    sigmoid score is below the threshold BEFORE clustering.  The reference
    keeps all top-K candidates, so on a converged heatmap the candidates
    ranked below the true blobs are pure noise and every noise cluster is a
    false-positive endpoint; 0.0 reproduces the reference.  Both
    ``score_thre`` and ``radius`` may be traced scalars — the endpoint
    sweep feeds them as runtime args so one compiled program covers the
    whole grid (a fresh full-size compile costs ~15 min through the
    tunnel).

    ``endp_logits``: [B, H, W].  Returns (coords [B,K,2] float, valid [B,K]).
    """
    if top_k is None:
        top_k = num_cls * 2 * 10
    B, H, W = endp_logits.shape
    inner = endp_logits[:, clip_w:H - clip_w, clip_w:W - clip_w]
    ih, iw = inner.shape[1], inner.shape[2]
    scores = jax.nn.sigmoid(inner.reshape(B, -1))
    if exact_topk:
        top_scores, top_idx = jax.lax.top_k(scores, top_k)
    else:
        # approx_max_k: TPU-native partial reduction (exact top_k sorts the
        # full 1.2M-pixel map); 0.99 recall on the top-240 peak *candidates*
        # is far inside the clustering radius' tolerance
        top_scores, top_idx = jax.lax.approx_max_k(scores, top_k,
                                                   recall_target=0.99)
    hh = (top_idx // iw + clip_w).astype(jnp.float32)
    ww = (top_idx % iw + clip_w).astype(jnp.float32)
    coords = jnp.stack([hh, ww], axis=-1)  # [B,K,2]
    # sub-threshold candidates collapse into one far-away sentinel cluster
    # whose representative is then invalidated by the >= 0 test
    coords = jnp.where((top_scores >= score_thre)[..., None], coords, -1e4)
    rep_coords, rep_valid, _ = jax.vmap(
        lambda c: cluster_peaks(c, radius))(coords)
    rep_valid = rep_valid & (rep_coords[..., 0] >= 0.0)
    return rep_coords, rep_valid


# decode keys the host postprocess actually reads — device_get only these
# (the full dict carries full-resolution maps that cost real time through
# a tunnel-attached chip)
HOST_DECODE_KEYS = ("prop_conf", "prop_v_ext", "cls_offset", "cls",
                    "cls_exp", "orient", "bi_seg_rows", "endp_coords",
                    "endp_valid", "endp_logits")


def host_decode_view(dec: Dict) -> Dict:
    """Subset of a decode dict consumed by `postprocess.lane_maps_from_decode`."""
    return {k: v for k, v in dec.items() if k in HOST_DECODE_KEYS}


def decode_lanes(out: Dict, cfg) -> Dict:
    """Full decode dict (reference `get_exist_coor_endp_dict`, `:602-759`)."""
    h = cfg.heads
    prop_w = h.prop_width + 2 * h.prop_half_buff
    exist_thre = cfg.exist_thre
    coor_thre = cfg.coor_thre

    prop_conf = jax.nn.softmax(out["proposal_conf"].astype(jnp.float32), -1)
    orient_cls = jnp.argmax(out["orient"], axis=-1)  # [B,S,S]

    # anchor rows are all the host postprocess ever reads; the full-res
    # thresholded class map (reference arr_semantic_seg) is only built when
    # a visualization flag asks for it — softmax over the 8S x 8S x 3 map
    # is pure wasted compute otherwise
    sem_rows = jax.nn.softmax(
        out["semantic_seg"][:, 3::8, :, :].astype(jnp.float32), -1)
    bi_seg_rows = sem_rows[..., 1] + sem_rows[..., 2]  # [B,S,8S]
    sem_extra = {}
    if cfg.get("show_result", False) or cfg.get("view_detail", False):
        sem = jax.nn.softmax(out["semantic_seg"].astype(jnp.float32), -1)
        p1, p2 = sem[..., 1], sem[..., 2]
        sem_extra["semantic_seg"] = jnp.where(
            (p1 > p2) & (p1 > coor_thre), 1,
            jnp.where((p2 > p1) & (p2 > coor_thre), 2, 0))

    ext = jax.nn.softmax(out["ext2"].astype(jnp.float32), -1)
    e1, e2 = ext[..., 1], ext[..., 2]
    prop_v_ext = jnp.where((e1 > e2) & (e1 > exist_thre), 1.0,
                           jnp.where((e2 > e1) & (e2 > exist_thre), 2.0, 0.0))

    cls_probs = jax.nn.softmax(out["cls2"].astype(jnp.float32), -1)
    cls_max = jnp.argmax(cls_probs, axis=-1)  # [B,P,S]
    corr_exp = window_expectation(cls_probs)
    # one-hot contraction (TPU-friendly) == take_along_axis at the argmax
    off_at_max = jnp.sum(
        out["offset2"].astype(jnp.float32)
        * jax.nn.one_hot(cls_max, out["offset2"].shape[-1]), axis=-1)
    corr_offset = cls_max.astype(jnp.float32) + off_at_max
    corr_idx = cls_max.astype(jnp.float32)

    clamp = lambda x: jnp.minimum(x, float(prop_w))
    corr_idx, corr_exp, corr_offset = map(clamp,
                                          (corr_idx, corr_exp, corr_offset))
    base = (h.prop_width * jnp.arange(h.num_prop)
            - h.prop_half_buff).astype(jnp.float32)[None, :, None]
    corr_idx = corr_idx + base
    corr_exp = corr_exp + base
    corr_offset = corr_offset + base

    endp_key = "endpoint" if h.get("endp_mode", "endp_est") == "endpoint" \
        else "endp_est"
    # endpoint path selector (cfg.endp_decode):
    #   'approx_topk' (default) — fixed K, approx_max_k partial reduction
    #   'exact_topk'            — fixed K, full-sort top_k
    #   'exact_host'            — raw logits to the host for the reference's
    #                             adaptive-K loop (decode/endpoints_host.py)
    endp_mode = cfg.get("endp_decode", "approx_topk")
    if endp_mode == "exact_host":
        endp_extra = {"endp_logits": out[endp_key][..., 0]}
        K = cfg.number_lanes * 2 * 10
        B = out[endp_key].shape[0]
        endp_coords = jnp.zeros((B, K, 2), jnp.float32)
        endp_valid = jnp.zeros((B, K), bool)
    else:
        endp_extra = {}
        endp_coords, endp_valid = decode_endpoints(
            out[endp_key][..., 0], num_cls=cfg.number_lanes,
            exact_topk=(endp_mode == "exact_topk"),
            radius=cfg.get("endp_cluster_r", 20.0),
            top_k=cfg.get("endp_top_k", None),
            score_thre=cfg.get("endp_score_thre", 0.0))

    return {
        **endp_extra,
        **sem_extra,
        "prop_conf": prop_conf,
        "prop_v_ext": prop_v_ext,
        "prop_cls_conf": cls_probs,
        "orient": orient_cls,
        "bi_seg_rows": bi_seg_rows,  # [B,S,8S] anchor rows — the ONLY rows
        # any host consumer reads (tracker thinning + NMS semantic lookups)
        "cls": corr_idx,
        "cls_exp": corr_exp,
        "cls_offset": corr_offset,
        "endp_coords": endp_coords,
        "endp_valid": endp_valid,
    }
