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


def segmentor_displays(proj, seg, endp=None):
    """Overlay maps for the Segmentor export driver (reference
    `PostProjector2.get_pred_seg_endp_displays`,
    `postprojector.py:221-261`): grayscale source image with (a) the
    per-class segmentation and (b) its dilated skeleton drawn on top, plus
    endpoint markers when ``endp`` is given.

    ``proj`` [H,W,3] float in [0,1] (or normalised), ``seg`` [H,W] in
    {0,1,2}, ``endp`` optional [H,W] binary.  Returns (seg_rgb, skel_rgb)
    uint8 arrays.
    """
    import numpy as np

    from ..utils.skeleton import skeletonize
    from ..utils.vis_utils import draw_seg_points, to_gray_rgb

    base = to_gray_rgb(np.asarray(proj))
    seg_img = base.copy()
    skel_img = base.copy()
    seg = np.asarray(seg)
    for sid in (1, 2):
        coords = np.argwhere(seg == sid)
        if not len(coords):
            continue
        draw_seg_points(seg_img, coords, semantic_id=sid)
        skel = skeletonize((seg == sid).astype(np.uint8))
        # 1x3 rectangular dilation (reference `:241-243`)
        skel = skel | np.pad(skel, ((0, 0), (1, 0)))[:, :-1] \
            | np.pad(skel, ((0, 0), (0, 1)))[:, 1:]
        draw_seg_points(skel_img, np.argwhere(skel > 0), semantic_id=sid)
    if endp is not None:
        from ..utils.vis_utils import draw_endpoints
        pts = np.argwhere(np.asarray(endp) > 0)
        draw_endpoints(seg_img, pts)
    return (seg_img.clip(0, 255).astype(np.uint8),
            skel_img.clip(0, 255).astype(np.uint8))


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
