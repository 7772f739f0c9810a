"""Pre-norm ViT blocks shared by backbones and heads.

Parity with `/root/reference/baseline/models/backbone/vitsegnet.py:20-83` and
`baseline/models/heads/transformer.py:20-92`.  Attention runs as batched
matmuls on the MXU with bf16-friendly accumulation (`preferred_element_type`).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class FeedForward(nn.Module):
    dim: int
    hidden_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Dense(self.hidden_dim, name="fc1")(x)
        y = nn.gelu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(self.dim, name="fc2")(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return y


class Attention(nn.Module):
    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        inner = self.heads * self.dim_head
        project_out = not (self.heads == 1 and self.dim_head == self.dim)
        b, n, _ = x.shape
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_split(t):
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads_split(q), heads_split(k), heads_split(v)
        scale = self.dim_head ** -0.5
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                            preferred_element_type=jnp.float32) * scale
        attn = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        if project_out:
            out = nn.Dense(self.dim, name="to_out")(out)
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.LayerNorm(name="norm1")(x)
        x = x + Attention(self.dim, self.heads, self.dim_head, self.dropout,
                          name="attn")(y, train)
        y = nn.LayerNorm(name="norm2")(x)
        x = x + FeedForward(self.dim, self.mlp_dim, self.dropout,
                            name="mlp")(y, train)
        return x


class Transformer(nn.Module):
    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.depth):
            x = TransformerBlock(self.dim, self.heads, self.dim_head,
                                 self.mlp_dim, self.dropout,
                                 name=f"block{i}")(x, train)
        return x
