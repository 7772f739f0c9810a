"""Hierarchical shifted-window transformer backbone (Swin).

Capability parity with the reference's vendored Swin
(`/root/reference/baseline/models/backbone/swin_transformer.py:450-633` —
registered but dead there: never imported by `backbone/__init__.py:6-9`).
Implemented TPU-first: window partitioning is pure reshape/transpose (no
rolls in the attention inner loop — the cyclic shift is one pltpu-friendly
jnp.roll per block), relative position bias is a table gather, and all
attention runs as batched MXU matmuls.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..registry import BACKBONE


def window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """[B,H,W,C] -> [B*nW, w*w, C]."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)


def window_reverse(x: jnp.ndarray, w: int, H: int, W: int) -> jnp.ndarray:
    B = x.shape[0] // ((H // w) * (W // w))
    x = x.reshape(B, H // w, W // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


def _relative_index(w: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    heads: int
    window: int

    @nn.compact
    def __call__(self, x, mask=None):
        B_, N, C = x.shape
        head_dim = self.dim // self.heads
        qkv = nn.Dense(self.dim * 3, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(B_, N, 3, self.heads, head_dim)
                            .transpose(2, 0, 3, 1, 4), 3, axis=0)
        q, k, v = q[0], k[0], v[0]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32) * head_dim ** -0.5
        table = self.param("rel_bias", nn.initializers.normal(0.02),
                           ((2 * self.window - 1) ** 2, self.heads))
        idx = jnp.asarray(_relative_index(self.window))
        attn = attn + table[idx].transpose(2, 0, 1)[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(B_ // nw, nw, self.heads, N, N) + \
                mask[None, :, None]
            attn = attn.reshape(B_, self.heads, N, N)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B_, N, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        w = self.window
        shortcut = x
        y = nn.LayerNorm(name="norm1")(x)
        if self.shift:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
            mask = self._shift_mask(H, W)
        else:
            mask = None
        win = window_partition(y, w)
        win = WindowAttention(self.dim, self.heads, w, name="attn")(win, mask)
        y = window_reverse(win, w, H, W)
        if self.shift:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + y
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, name="fc2")(y)
        return x + y

    def _shift_mask(self, H, W):
        w, s = self.window, self.shift
        img = np.zeros((1, H, W, 1), np.float32)
        cnt = 0
        for hs in (slice(0, -w), slice(-w, -s), slice(-s, None)):
            for ws in (slice(0, -w), slice(-w, -s), slice(-s, None)):
                img[:, hs, ws, :] = cnt
                cnt += 1
        win = np.asarray(window_partition(jnp.asarray(img), w))[..., 0]
        diff = win[:, None, :] - win[:, :, None]
        return jnp.asarray(np.where(diff != 0, -100.0, 0.0), jnp.float32)


class PatchMerging(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)


class SwinTransformer(nn.Module):
    """Multi-stage Swin; returns the requested stage features (NHWC)."""

    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    out_indices: Sequence[int] = (0, 1, 2, 3)

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p),
                    name="patch_embed")(x)
        x = nn.LayerNorm(name="patch_norm")(x)
        outs = []
        dim = self.embed_dim
        for i, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            for d in range(depth):
                shift = 0 if d % 2 == 0 else self.window_size // 2
                x = SwinBlock(dim, heads, self.window_size, shift,
                              self.mlp_ratio, name=f"stage{i}_block{d}")(x)
            if i in self.out_indices:
                outs.append(nn.LayerNorm(name=f"out_norm{i}")(x))
            if i < len(self.depths) - 1:
                x = PatchMerging(dim, name=f"merge{i}")(x)
                dim *= 2
        return tuple(outs)


@BACKBONE.register_module(name="SwinTransformer")
def build_swin(cfg=None, **kw):
    fields = {f for f in SwinTransformer.__dataclass_fields__
              if f not in ("parent", "name")}
    return SwinTransformer(**{k: tuple(v) if isinstance(v, list) else v
                              for k, v in kw.items() if k in fields})
