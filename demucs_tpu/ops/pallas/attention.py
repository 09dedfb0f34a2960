"""Fused (flash) attention kernel for the cross-domain transformer.

Replaces the two-matmul + softmax attention in ``demucs_tpu.ops.attention``
with a single Pallas kernel: online-softmax over key blocks, fp32
accumulators, O(block) VMEM. Sequence lengths here are short by LLM standards
(~2.7k spec tokens / ~1.3k time tokens for the 7.8 s htdemucs segment), so a
single pass over K per Q block is cheap; the win is avoiding the HBM
round-trip of the (Tq, Tk) score matrix.

Handles self- AND cross-attention (Tq != Tk) and ragged lengths via block
masking (lengths are padded up to the 128-lane tile).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256
_INTERPRET = False  # flipped by tests on CPU


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, kv_len: int,
                 sm_scale: float):
    q = q_ref[...].astype(jnp.float32) * sm_scale  # (block_q, d)
    block_q, d = q.shape
    n_kv_blocks = pl.cdiv(kv_len, block_k)

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (bq, bk)
        # mask out padded keys
        kv_ids = i * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(kv_ids < kv_len, s, -jnp.inf)
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, None])
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q,), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_kv_blocks, body, (acc0, m0, l0))
    o_ref[...] = (acc / l[:, None]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit, static_argnames=("num_heads", "block_q", "block_k", "interpret")
)
def flash_mha(q: jax.Array, k: jax.Array, v: jax.Array, num_heads: int,
              *, block_q: int = DEFAULT_BLOCK_Q, block_k: int = DEFAULT_BLOCK_K,
              interpret: bool = False) -> jax.Array:
    """Multi-head attention over projected q/k/v: ``(B, T, C)`` inputs.

    Drop-in for ``demucs_tpu.ops.attention.multihead_attention``.
    """
    B, Tq, C = q.shape
    Tk = k.shape[1]
    d = C // num_heads
    sm_scale = 1.0 / math.sqrt(d)

    def split(x, T):
        return (
            x.reshape(B, T, num_heads, d)
            .transpose(0, 2, 1, 3)
            .reshape(B * num_heads, T, d)
        )

    qh, kh, vh = split(q, Tq), split(k, Tk), split(v, Tk)

    tq_pad = _round_up(Tq, block_q)
    tk_pad = _round_up(Tk, block_k)
    if tq_pad != Tq:
        qh = jnp.pad(qh, [(0, 0), (0, tq_pad - Tq), (0, 0)])
    if tk_pad != Tk:
        kh = jnp.pad(kh, [(0, 0), (0, tk_pad - Tk), (0, 0)])
        vh = jnp.pad(vh, [(0, 0), (0, tk_pad - Tk), (0, 0)])

    grid = (B * num_heads, tq_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, block_k=block_k, kv_len=Tk,
                          sm_scale=sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, tk_pad, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, tk_pad, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * num_heads, tq_pad, d), q.dtype),
        interpret=interpret or _INTERPRET,
    )(qh, kh, vh)

    out = out[:, :Tq, :]
    return out.reshape(B, num_heads, Tq, d).transpose(0, 2, 1, 3).reshape(B, Tq, C)
