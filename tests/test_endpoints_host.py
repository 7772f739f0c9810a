"""Host adaptive-K endpoint decode vs the on-device fixed-K version."""

import numpy as np
import pytest


def _heatmap_with_peaks(peaks, img=256, sigma=3.0, seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.normal(-6.0, 0.3, (img, img))
    yy, xx = np.mgrid[0:img, 0:img]
    for r, c in peaks:
        logits = np.maximum(
            logits, 8.0 * np.exp(-((yy - r) ** 2 + (xx - c) ** 2)
                                 / (2 * sigma ** 2)) - 4.0)
    return logits.astype(np.float32)


def test_host_decode_finds_peaks():
    from lanemapping_tpu.decode.endpoints_host import decode_endpoints_host

    peaks = [(60, 60), (60, 180), (180, 60), (180, 180), (120, 120)]
    logits = _heatmap_with_peaks(peaks)
    reps = decode_endpoints_host(logits, num_cls=12)
    assert len(reps) >= len(peaks)
    for p in peaks:
        d = np.sqrt(((reps - np.asarray(p)) ** 2).sum(1)).min()
        assert d < 10, f"peak {p} missed (nearest rep {d:.1f} px)"


def test_host_and_device_decode_agree_on_clear_peaks():
    import jax.numpy as jnp
    from lanemapping_tpu.decode.endpoints_host import decode_endpoints_host
    from lanemapping_tpu.decode.lane_decode import decode_endpoints

    peaks = [(70, 50), (60, 190), (190, 70), (170, 200), (128, 128),
             (40, 128)]
    logits = _heatmap_with_peaks(peaks, seed=3)
    host = decode_endpoints_host(logits, num_cls=12)
    coords, valid = decode_endpoints(jnp.asarray(logits)[None], num_cls=12)
    dev = np.asarray(coords[0])[np.asarray(valid[0])]
    # both find every true peak within the cluster radius
    for p in peaks:
        assert np.sqrt(((host - np.asarray(p)) ** 2).sum(1)).min() < 10
        assert np.sqrt(((dev - np.asarray(p)) ** 2).sum(1)).min() < 10


def test_endp_decode_flag_all_modes(tiny_cfg):
    """cfg.endp_decode selects approx_topk / exact_topk / exact_host; all
    three produce a usable endpoint map through the full map assembly."""
    import jax
    import jax.numpy as jnp
    from lanemapping_tpu.decode.lane_decode import decode_lanes
    from lanemapping_tpu.decode.postprocess import lane_maps_from_decode

    cfg = tiny_cfg
    S, P = cfg.heads.row_size, cfg.heads.num_prop
    W = cfg.heads.prop_width + 2 * cfg.heads.prop_half_buff
    img = cfg.list_img_size_xy[0]
    rng = np.random.RandomState(0)
    endp = np.full((1, img, img, 1), -8.0, np.float32)
    for r, c in [(60, 60), (140, 100)]:
        endp[0, r, c, 0] = 8.0  # two crisp peaks
    out = {
        "proposal_conf": jnp.asarray(rng.randn(1, P, 2), jnp.float32),
        "ext2": jnp.asarray(rng.randn(1, P, S, 3), jnp.float32),
        "cls2": jnp.asarray(rng.randn(1, P, S, W), jnp.float32),
        "offset2": jnp.asarray(rng.randn(1, P, S, W), jnp.float32),
        "orient": jnp.asarray(rng.randn(1, S, S, 11), jnp.float32),
        "semantic_seg": jnp.asarray(rng.randn(1, img, img, 3), jnp.float32),
        "endp_est": jnp.asarray(endp),
    }
    maps_by_mode = {}
    for mode in ("approx_topk", "exact_topk", "exact_host"):
        cfg.endp_decode = mode
        dec = jax.device_get(decode_lanes(out, cfg))
        if mode == "exact_host":
            assert "endp_logits" in dec
        maps = lane_maps_from_decode(dec, cfg)
        em = maps["endp_by_cls"][0]
        pts = np.argwhere(em > 0)
        maps_by_mode[mode] = pts
        # both injected peaks recovered (any mode) within the cluster radius
        for target in [(60, 60), (140, 100)]:
            assert np.any(np.abs(pts - target).sum(1) <= 20), (mode, pts)
    # exact_topk and approx_topk agree on crisp peaks
    a = maps_by_mode["approx_topk"]
    e = maps_by_mode["exact_topk"]
    assert len(a) and len(e)
