"""Fused (flash) attention kernel for the cross-domain transformer.

Replaces the two-matmul + softmax attention in ``demucs_tpu.ops.attention``
with a single Pallas kernel: online-softmax over key blocks, fp32
accumulators, O(block) VMEM. Sequence lengths here are short by LLM standards
(~2.7k spec tokens / ~1.3k time tokens for the 7.8 s htdemucs segment), so a
single pass over K per Q block is cheap; the win is avoiding the HBM
round-trip of the (Tq, Tk) score matrix.

Handles self- AND cross-attention (Tq != Tk), ragged lengths via block
masking (lengths are padded up to the 128-lane tile), optional boolean
keep-masks (the static sparse-attention variants,
``demucs/transformer.py:118-212``), and train-time dropout on the attention
probabilities (``nn.MultiheadAttention(dropout=...)``). Dropout uses a
counter-based hash PRNG keyed on (seed, batch*head, query, key) — identical
on every backend and statistically equivalent to (but not bit-matching) the
host path's ``jax.random.bernoulli`` stream.
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


def _uniform_hash(x: jax.Array) -> jax.Array:
    """uint32 -> uniform [0, 1) float32 via the murmur3 finalizer (a
    counter-based PRNG: statelessly decorrelated per position)."""
    x ^= x >> jnp.uint32(16)
    x *= jnp.uint32(0x85EBCA6B)
    x ^= x >> jnp.uint32(13)
    x *= jnp.uint32(0xC2B2AE35)
    x ^= x >> jnp.uint32(16)
    return (x >> jnp.uint32(8)).astype(jnp.float32) * (2.0 ** -24)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, kv_len: int,
                 sm_scale: float, dropout: float = 0.0, mask_ref=None,
                 seed_ref=None):
    q = q_ref[...].astype(jnp.float32) * sm_scale  # (block_q, d)
    block_q, d = q.shape
    n_kv_blocks = pl.cdiv(kv_len, block_k)
    bh = pl.program_id(0)
    iq = pl.program_id(1)

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (bq, bk)
        # mask out padded keys
        kv_ids = i * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        keep = kv_ids < kv_len
        if mask_ref is not None:
            keep &= mask_ref[:, pl.ds(i * block_k, block_k)] > 0
        s = jnp.where(keep, s, -jnp.inf)
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        # -inf-safe online softmax: rows with no kept key so far keep l == 0
        # (final 0/0 -> NaN matches the dense path's softmax over all -inf).
        safe_m = jnp.where(jnp.isneginf(m_new), 0.0, m_new)
        alpha = jnp.exp(m_prev - safe_m)  # exp(-inf - finite) == 0
        p = jnp.exp(s - safe_m[:, None])
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        if dropout > 0.0:
            # dropout(softmax(s)) == dropout(p)/l: the inverted-dropout scale
            # is linear, so drop the UNNORMALIZED probs but accumulate the
            # denominator l from the pre-dropout p.
            rows = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            cols = i * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            ctr = (rows.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
                   ^ cols.astype(jnp.uint32) * jnp.uint32(0x85EBCA77))
            ctr ^= (seed_ref[0].astype(jnp.uint32)
                    + bh.astype(jnp.uint32) * jnp.uint32(0x27D4EB2F))
            drop_keep = _uniform_hash(ctr) >= dropout
            p = jnp.where(drop_keep, p, 0.0) / (1.0 - dropout)
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
    jax.jit,
    static_argnames=("num_heads", "dropout", "block_q", "block_k", "interpret"),
)
def flash_mha(q: jax.Array, k: jax.Array, v: jax.Array, num_heads: int,
              *, mask: jax.Array | None = None, dropout: float = 0.0,
              dropout_seed: jax.Array | None = None,
              block_q: int = DEFAULT_BLOCK_Q, block_k: int = DEFAULT_BLOCK_K,
              interpret: bool = False) -> jax.Array:
    """Multi-head attention over projected q/k/v: ``(B, T, C)`` inputs.

    Drop-in for ``demucs_tpu.ops.attention.multihead_attention``:
    ``mask`` is the same boolean keep-mask ``(Tq, Tk)`` shared across batch
    and heads; ``dropout``/``dropout_seed`` enable train-time attention-prob
    dropout (seed: any int32 scalar, e.g. ``jax.random.randint(...)``).
    """
    B, Tq, C = q.shape
    Tk = k.shape[1]
    d = C // num_heads
    sm_scale = 1.0 / math.sqrt(d)
    dropout = float(dropout)
    if dropout and dropout_seed is None:
        raise ValueError("dropout > 0 requires dropout_seed")

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
    in_specs = [
        pl.BlockSpec((None, block_q, d), lambda b, i: (b, i, 0)),
        pl.BlockSpec((None, tk_pad, d), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((None, tk_pad, d), lambda b, i: (b, 0, 0)),
    ]
    operands = [qh, kh, vh]
    if mask is not None:
        keep = jnp.asarray(mask)
        assert keep.shape == (Tq, Tk), (keep.shape, Tq, Tk)
        keep = jnp.pad(keep.astype(jnp.float32),
                       [(0, tq_pad - Tq), (0, tk_pad - Tk)],
                       constant_values=1.0)
        in_specs.append(pl.BlockSpec((block_q, tk_pad), lambda b, i: (i, 0)))
        operands.append(keep)
    if dropout:
        from jax.experimental.pallas import tpu as pltpu

        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(jnp.asarray(dropout_seed, jnp.int32).reshape(1))

    # Rebind refs positionally: optional mask/seed refs come after o_ref in
    # pallas_call order (inputs..., outputs...), so wrap to name them.
    def wrapped(*refs):
        q_ref, k_ref, v_ref = refs[0], refs[1], refs[2]
        idx = 3
        mask_ref = None
        seed_ref = None
        if mask is not None:
            mask_ref = refs[idx]
            idx += 1
        if dropout:
            seed_ref = refs[idx]
            idx += 1
        o_ref = refs[idx]
        return _attn_kernel(q_ref, k_ref, v_ref, o_ref, block_k=block_k,
                            kv_len=Tk, sm_scale=sm_scale, dropout=dropout,
                            mask_ref=mask_ref, seed_ref=seed_ref)

    out = pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * num_heads, tq_pad, d), q.dtype),
        interpret=interpret or _INTERPRET,
    )(*operands)

    out = out[:, :Tq, :]
    return out.reshape(B, num_heads, Tq, d).transpose(0, 2, 1, 3).reshape(B, Tq, C)
