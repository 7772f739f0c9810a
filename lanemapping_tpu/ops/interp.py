"""Bilinear resize with ``align_corners=True`` semantics, TPU-first.

The reference uses ``F.interpolate(..., mode='bilinear', align_corners=True)``
everywhere (`/root/reference/baseline/models/pcencoder/postprojector.py:541-542`,
`heads/polyline_fpn_vit_vertex_2.py:273-274`).  ``jax.image.resize`` has no
align-corners mode, and gather-based interpolation maps poorly onto the TPU
VPU.  Instead we express 2-D bilinear resize as two small dense matmuls with
precomputed 1-D interpolation operators — each output row of the operator has
at most two non-zeros, but a dense [out,in] x [in,*] product rides the MXU and
fuses with neighbouring ops under XLA.  Operators are built once per
(in,out) pair at trace time from NumPy and closed over as constants.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _interp_matrix_np(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] align-corners linear interpolation operator."""
    if n_in == n_out:
        return np.eye(n_in, dtype=np.float32)
    if n_in == 1:
        return np.ones((n_out, 1), dtype=np.float32)
    if n_out == 1:
        m = np.zeros((1, n_in), dtype=np.float32)
        m[0, 0] = 1.0
        return m
    scale = (n_in - 1) / (n_out - 1)
    coords = np.arange(n_out, dtype=np.float64) * scale
    lo = np.floor(coords).astype(np.int64)
    lo = np.clip(lo, 0, n_in - 2)
    frac = coords - lo
    m = np.zeros((n_out, n_in), dtype=np.float32)
    m[np.arange(n_out), lo] = (1.0 - frac).astype(np.float32)
    m[np.arange(n_out), lo + 1] = frac.astype(np.float32)
    return m


@functools.lru_cache(maxsize=None)
def _cubic_interp_matrix_np(n_in: int, n_out: int,
                            align_corners: bool = False,
                            a: float = -0.75) -> np.ndarray:
    """[n_out, n_in] bicubic (Keys, a=-0.75) interpolation operator matching
    ``F.interpolate(mode='bicubic')`` semantics — the reference LidarEncoder
    upsamples its backbone feature with bicubic align_corners=False
    (`/root/reference/baseline/models/pcencoder/lidarencoder.py:72`).
    Border taps clamp (replicate), like PyTorch."""
    if n_in == 1:
        return np.ones((n_out, 1), dtype=np.float32)
    if align_corners:
        src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / max(n_out - 1,
                                                                    1)
    else:
        src = (np.arange(n_out, dtype=np.float64) + 0.5) * n_in / n_out - 0.5

    def kernel(t):
        t = np.abs(t)
        w = np.where(t <= 1.0, (a + 2) * t ** 3 - (a + 3) * t ** 2 + 1,
                     np.where(t < 2.0,
                              a * t ** 3 - 5 * a * t ** 2 + 8 * a * t - 4 * a,
                              0.0))
        return w

    lo = np.floor(src).astype(np.int64)
    m = np.zeros((n_out, n_in), dtype=np.float64)
    rows = np.arange(n_out)
    for tap in (-1, 0, 1, 2):
        idx = lo + tap
        w = kernel(src - idx)
        np.add.at(m, (rows, np.clip(idx, 0, n_in - 1)), w)
    return m.astype(np.float32)


def resize_bicubic(x: jnp.ndarray, out_h: int, out_w: int,
                   align_corners: bool = False) -> jnp.ndarray:
    """Bicubic resize of ...HWC tensors as two operator matmuls."""
    *lead, h, w, c = x.shape
    mh = jnp.asarray(_cubic_interp_matrix_np(h, out_h, align_corners),
                     dtype=x.dtype)
    mw = jnp.asarray(_cubic_interp_matrix_np(w, out_w, align_corners),
                     dtype=x.dtype)
    y = jnp.einsum("oh,...hwc->...owc", mh, x)
    return jnp.einsum("pw,...hwc->...hpc", mw, y)


@functools.lru_cache(maxsize=None)
def _pool_matrix_np(n_in: int, k: int) -> np.ndarray:
    """[n_in//k, n_in] average-pooling operator (stride == kernel == k)."""
    n_out = n_in // k
    m = np.zeros((n_out, n_in), dtype=np.float32)
    for i in range(n_out):
        m[i, i * k:(i + 1) * k] = 1.0 / k
    return m


def interp_matrix(n_in: int, n_out: int) -> jnp.ndarray:
    return jnp.asarray(_interp_matrix_np(n_in, n_out))


@functools.lru_cache(maxsize=None)
def _upsample_then_pool_np(n_in: int, n_up: int, k: int) -> np.ndarray:
    """Composite operator: align-corners upsample to n_up, then avg-pool by k.

    Fuses the reference's ``avg_pool2d(upsample(x))`` pattern
    (`heads/polyline_fpn_vit_vertex_2.py:295-296,400-402`) into one
    [n_up//k, n_in] matrix so the full-resolution intermediate never exists.
    """
    return _pool_matrix_np(n_up, k) @ _interp_matrix_np(n_in, n_up)


@functools.lru_cache(maxsize=None)
def _interp_gather_np(n_in: int, n_out: int):
    """(lo_index [n_out], frac [n_out]) for gather+lerp interpolation."""
    if n_in == 1:
        return (np.zeros(n_out, np.int32), np.zeros(n_out, np.float32))
    scale = (n_in - 1) / (n_out - 1) if n_out > 1 else 0.0
    coords = np.arange(n_out, dtype=np.float64) * scale
    lo = np.clip(np.floor(coords).astype(np.int32), 0, n_in - 2)
    frac = (coords - lo).astype(np.float32)
    return lo, frac


def _resize_axis_gather(x: jnp.ndarray, axis: int, n_out: int) -> jnp.ndarray:
    lo, frac = _interp_gather_np(x.shape[axis], n_out)
    lo = jnp.asarray(lo)
    frac_shape = [1] * x.ndim
    frac_shape[axis] = n_out
    f = jnp.asarray(frac, x.dtype).reshape(frac_shape)
    a = jnp.take(x, lo, axis=axis)
    b = jnp.take(x, lo + 1, axis=axis)
    return a * (1 - f) + b * f


# Gather+lerp resize looked attractive on paper (2 MACs per output vs the
# dense operator matmul's n_in) but MEASURED SLOWER on TPU v5e: 86.7 vs
# 108.7 tiles/s on the flagship pipeline — large row-gathers lower poorly
# while the MXU eats the extra matmul FLOPs for free.  Matmul form is the
# default; the gather path is kept for reference/CPU use.
_USE_GATHER_RESIZE = False
_GATHER_THRESHOLD = 64


def resize_bilinear_ac(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Align-corners bilinear resize of NHWC (or ...HWC) tensors as two
    1-D interpolation-operator matmuls (MXU-friendly, fuses under XLA)."""
    *lead, h, w, c = x.shape
    if _USE_GATHER_RESIZE and max(h, w) > _GATHER_THRESHOLD:
        y = _resize_axis_gather(x, x.ndim - 3, out_h)
        return _resize_axis_gather(y, x.ndim - 2, out_w)
    mh = jnp.asarray(_interp_matrix_np(h, out_h), dtype=x.dtype)
    mw = jnp.asarray(_interp_matrix_np(w, out_w), dtype=x.dtype)
    y = jnp.einsum("oh,...hwc->...owc", mh, x)
    y = jnp.einsum("pw,...hwc->...hpc", mw, y)
    return y


def upsample_then_avgpool(x: jnp.ndarray, up_h: int, up_w: int, k: int) -> jnp.ndarray:
    """Equivalent of avg_pool_k(resize_ac(x, up_h, up_w)) without the blowup."""
    *lead, h, w, c = x.shape
    mh = jnp.asarray(_upsample_then_pool_np(h, up_h, k), dtype=x.dtype)
    mw = jnp.asarray(_upsample_then_pool_np(w, up_w, k), dtype=x.dtype)
    y = jnp.einsum("oh,...hwc->...owc", mh, x)
    y = jnp.einsum("pw,...hwc->...hpc", mw, y)
    return y
