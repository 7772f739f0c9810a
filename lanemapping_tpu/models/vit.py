"""Global feature correlator backbones: VitSegNet ("GFC-T") and MixSegNet.

Parity with `/root/reference/baseline/models/backbone/vitsegnet.py:132-214`
(patch-embed 8x8 over S x S x C -> (S/8)^2 tokens, learned pos-emb, no cls
token, pre-norm ViT, un-patch back to S x S x dim/64) and
`backbone/mixsegnet.py:33-76` (MLP-Mixer ablation).  NHWC layout; the
patch (un)flattening keeps the reference's (p1 p2 c) channel order so torch
checkpoints port weight-for-weight.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..registry import BACKBONE
from .transformer import Transformer


def patchify(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """NHWC [B,H,W,C] -> [B, (H/p)(W/p), p*p*C] in (p1 p2 c) order."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # b, h', w', p1, p2, c
    return x.reshape(b, (h // p) * (w // p), p * p * c)


def unpatchify(x: jnp.ndarray, hp: int, wp: int, p: int) -> jnp.ndarray:
    """[B, hp*wp, p*p*C] -> NHWC [B, hp*p, wp*p, C] (inverse of patchify)."""
    b, n, d = x.shape
    c = d // (p * p)
    x = x.reshape(b, hp, wp, p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hp * p, wp * p, c)


class VitSegNet(nn.Module):
    image_size: int = 144
    patch_h_size: int = 8
    patch_w_size: int = 8
    channels: int = 64
    dim: int = 512
    depth: int = 3
    heads: int = 16
    output_channels: int = 8
    expansion_factor: int = 4
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    is_with_shared_mlp: bool = False
    is_with_llm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.patch_h_size
        b, h, w, c = x.shape
        hp, wp = h // p, w // p
        tokens = patchify(x, p)
        tokens = nn.Dense(self.dim, name="patch_embed")(tokens)
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, hp * wp, self.dim))
        tokens = tokens + pos[:, : tokens.shape[1]]
        tokens = nn.Dropout(self.emb_dropout, deterministic=not train)(tokens)
        tokens = Transformer(self.dim, self.depth, self.heads, self.dim_head,
                             int(self.dim * self.expansion_factor),
                             self.dropout, name="transformer")(tokens, train)
        out = unpatchify(tokens, hp, wp, p)  # [B, h, w, dim/(p*p)]
        if self.is_with_shared_mlp:
            out = nn.Conv(self.output_channels, (1, 1), name="shared_mlp")(out)
        return out


class MixerBlock(nn.Module):
    """Token-mix + channel-mix (reference `mixsegnet.py:13-31`)."""

    num_tokens: int
    dim: int
    token_mlp_dim: int
    channel_mlp_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.LayerNorm(name="norm1")(x)
        y = y.transpose(0, 2, 1)
        y = nn.Dense(self.token_mlp_dim, name="token_fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.num_tokens, name="token_fc2")(y)
        x = x + y.transpose(0, 2, 1)
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(self.channel_mlp_dim, name="chan_fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, name="chan_fc2")(y)
        return x + y


class MixSegNet(nn.Module):
    image_size: int = 144
    patch_size: int = 8
    channels: int = 64
    dim: int = 512
    depth: int = 3
    output_channels: int = 8
    expansion_factor: int = 4
    dropout: float = 0.0
    is_with_shared_mlp: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.patch_size
        b, h, w, c = x.shape
        hp, wp = h // p, w // p
        tokens = patchify(x, p)
        tokens = nn.Dense(self.dim, name="patch_embed")(tokens)
        for i in range(self.depth):
            tokens = MixerBlock(hp * wp, self.dim,
                                self.dim * self.expansion_factor,
                                self.dim * self.expansion_factor,
                                self.dropout, name=f"mixer{i}")(tokens, train)
        tokens = nn.LayerNorm(name="norm")(tokens)
        out = unpatchify(tokens, hp, wp, p)
        if self.is_with_shared_mlp:
            out = nn.Conv(self.output_channels, (1, 1), name="shared_mlp")(out)
        return out


class Dummy(nn.Module):
    """Identity correlator for ablations (reference `backbone/dummy.py:11-19`)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return x


@BACKBONE.register_module(name="VitSegNet")
def build_vitsegnet(cfg=None, **kw):
    fields = {f for f in VitSegNet.__dataclass_fields__ if f not in ("parent", "name")}
    return VitSegNet(**{k: v for k, v in kw.items() if k in fields})


@BACKBONE.register_module(name="MixSegNet")
def build_mixsegnet(cfg=None, **kw):
    fields = {f for f in MixSegNet.__dataclass_fields__ if f not in ("parent", "name")}
    return MixSegNet(**{k: v for k, v in kw.items() if k in fields})


@BACKBONE.register_module(name="Dummy")
def build_dummy(cfg=None, **kw):
    return Dummy()
