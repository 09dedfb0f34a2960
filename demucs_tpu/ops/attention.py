"""Multi-head attention primitives.

Default path: one batched einsum chain that XLA fuses and tiles onto the MXU
(sequence lengths here are small by LLM standards: ~2.7k spec tokens, ~1.3k
time tokens for the 7.8 s htdemucs segment). A fused Pallas flash-attention
kernel is provided in ``demucs_tpu.ops.pallas.attention`` and used
automatically on TPU for supported shapes.

Behavioral reference: ``torch.nn.MultiheadAttention`` as used in
``demucs/transformer.py:271-520`` (q scaled by head_dim**-0.5, softmax over
keys).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["multihead_attention"]


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    B, T, C = x.shape
    return jnp.transpose(x.reshape(B, T, num_heads, C // num_heads), (0, 2, 1, 3))


def apply_dropout(rng, x, rate: float):
    """Inverted dropout; identity when rng is None (eval) or rate == 0."""
    if rng is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return x * keep.astype(x.dtype) / (1.0 - rate)


def multihead_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    mask=None,
    dropout_rng=None,
    dropout: float = 0.0,
) -> jax.Array:
    """Scaled dot-product attention over already-projected q/k/v.

    Args:
        q: ``(B, Tq, C)``; k/v: ``(B, Tk, C)``.
        mask: optional boolean keep-mask, either ``(Tq, Tk)`` (static
            sparse-attention variants, transformer.py:118-212) or any shape
            broadcastable to ``(B, H, Tq, Tk)`` (LSH dynamic sparsity,
            transformer.py:818-839); masked-out scores get -inf.
        dropout_rng/dropout: train-time dropout on the attention
            probabilities (nn.MultiheadAttention(dropout=...)).
    Returns:
        ``(B, Tq, C)`` (pre-output-projection).
    """
    B, Tq, C = q.shape
    head_dim = C // num_heads
    qh = _split_heads(q, num_heads) * (1.0 / math.sqrt(head_dim))
    kh = _split_heads(k, num_heads)
    vh = _split_heads(v, num_heads)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32)
    if mask is not None:
        mask = jnp.asarray(mask)
        if mask.ndim == 2:
            mask = mask[None, None]
        scores = jnp.where(mask, scores, -jnp.inf)
    weights = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
    weights = apply_dropout(dropout_rng, weights, dropout)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, vh, preferred_element_type=jnp.float32)
    out = out.astype(q.dtype)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(B, Tq, C)
