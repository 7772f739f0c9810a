"""Loss primitives.

JAX replacements for the reference's torch loss surface:
`torchvision.ops.sigmoid_focal_loss` (used at
`/root/reference/baseline/models/heads/polyline_fpn_vit_vertex_2.py:505-524`,
`pcencoder/postprojector.py:99`), `F.smooth_l1_loss`, and masked
`F.cross_entropy` with sum reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                       alpha: float = 0.25, gamma: float = 2.0) -> jnp.ndarray:
    """Elementwise focal loss, matching torchvision defaults."""
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets)
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    return loss


def optax_sigmoid_ce(logits, labels):
    """Numerically stable binary CE with logits (elementwise)."""
    return jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray,
              beta: float = 1.0) -> jnp.ndarray:
    """Elementwise Huber/smooth-L1, torch semantics (beta=1)."""
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def cross_entropy_with_int_labels(logits: jnp.ndarray,
                                  labels: jnp.ndarray) -> jnp.ndarray:
    """Elementwise -log p[label]; logits [..., C], labels [...] int.

    One-hot contraction instead of take_along_axis: on TPU a gather over a
    full-resolution map lowers to a serial kernel (profiled at 78 ms/step,
    25% of the flagship train step, for the 4x1152x1152x3 semantic CE),
    while the one-hot multiply-sum is a fused vector op.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    labels = jnp.clip(labels, 0, logits.shape[-1] - 1)
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logp.dtype)
    return -jnp.sum(logp * onehot, axis=-1)


def masked_sum(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(x * mask.astype(x.dtype))
