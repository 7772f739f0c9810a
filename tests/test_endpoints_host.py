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
