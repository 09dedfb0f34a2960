"""Cross-domain transformer (functional), behavioral ref: ``demucs/transformer.py``.

Two token streams — spectrogram tokens (flattened ``(t, f)`` grid with a 2-D
sinusoid embedding) and waveform tokens (1-D sinusoid / CAPE) — processed by
alternating self-attention (both domains independently) and cross-attention
(each domain queries the other), per ``transformer.py:526-719``.

Positional embeddings are computed host-side in numpy (they depend only on
static shapes) and constant-folded into the jitted graph.

Attention runs as one batched einsum chain (B*heads folded) so XLA maps the
two matmuls onto the MXU and fuses softmax; a fused Pallas flash-attention
kernel can be swapped in via ``demucs_tpu.ops.attention``.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from demucs_tpu.ops import nn as onn
from demucs_tpu.ops.attention import multihead_attention


@dataclasses.dataclass(frozen=True)
class TransformerSpec:
    dim: int
    num_layers: int = 5
    num_heads: int = 8
    hidden_scale: float = 4.0
    cross_first: bool = False
    emb: str = "sin"  # "sin" | "cape" | "scaled"
    norm_in: bool = True
    norm_in_group: bool = False
    group_norm: bool = False
    norm_first: bool = True
    norm_out: bool = True
    max_period: float = 10000.0
    layer_scale: bool = True
    gelu: bool = True
    weight_pos_embed: float = 1.0
    sin_random_shift: int = 0
    cape_mean_normalize: bool = True
    cape_augment: bool = True
    cape_glob_loc_scale: tp.Tuple[float, float, float] = (5000.0, 1.0, 1.4)
    sparse_self_attn: bool = False
    sparse_cross_attn: bool = False
    mask_type: str = "diag"
    mask_random_seed: int = 42
    sparse_attn_window: int = 500
    global_window: int = 50
    sparsity: float = 0.95
    auto_sparsity: bool = False  # LSH dynamic sparsity (transformer.py:818-839)
    flash_attn: bool = False  # use the fused Pallas attention kernel
    dropout: float = 0.0  # train-time dropout (attn probs + blocks)

    @property
    def hidden_dim(self) -> int:
        return int(self.dim * self.hidden_scale)

    @property
    def classic_parity(self) -> int:
        return 1 if self.cross_first else 0


# ---------------------------------------------------------------------------
# Positional embeddings (numpy, cached on static shapes)
# transformer.py:19-115
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _sin_embedding_np(length: int, dim: int, shift: int, max_period: float) -> np.ndarray:
    assert dim % 2 == 0
    pos = shift + np.arange(length, dtype=np.float64)[:, None]
    half_dim = dim // 2
    adim = np.arange(half_dim, dtype=np.float64)[None, :]
    phase = pos / (max_period ** (adim / (half_dim - 1)))
    return np.concatenate([np.cos(phase), np.sin(phase)], axis=-1).astype(np.float32)


def sin_embedding(length: int, dim: int, shift: int = 0, max_period: float = 10000.0):
    """1-D sinusoid embedding ``(length, dim)`` (transformer.py:19-34)."""
    return jnp.asarray(_sin_embedding_np(length, dim, shift, max_period))


@functools.lru_cache(maxsize=None)
def _sin_embedding_2d_np(d_model: int, height: int, width: int, max_period: float) -> np.ndarray:
    if d_model % 4 != 0:
        raise ValueError("2-D sin embedding requires dim % 4 == 0")
    pe = np.zeros((d_model, height, width), dtype=np.float64)
    half = d_model // 2
    div_term = np.exp(np.arange(0, half, 2, dtype=np.float64) * -(math.log(max_period) / half))
    pos_w = np.arange(width, dtype=np.float64)[:, None]
    pos_h = np.arange(height, dtype=np.float64)[:, None]
    pe[0:half:2] = np.sin(pos_w * div_term).T[:, None, :].repeat(height, axis=1)
    pe[1:half:2] = np.cos(pos_w * div_term).T[:, None, :].repeat(height, axis=1)
    pe[half::2] = np.sin(pos_h * div_term).T[:, :, None].repeat(width, axis=2)
    pe[half + 1 :: 2] = np.cos(pos_h * div_term).T[:, :, None].repeat(width, axis=2)
    return pe.astype(np.float32)


def sin_embedding_2d(d_model: int, height: int, width: int, max_period: float = 10000.0):
    """2-D sinusoid embedding ``(d_model, height, width)`` (transformer.py:37-70)."""
    return jnp.asarray(_sin_embedding_2d_np(d_model, height, width, max_period))


def cape_embedding(
    length: int,
    dim: int,
    batch_size: int,
    *,
    mean_normalize: bool,
    augment: bool,
    rng: tp.Optional[jax.Array] = None,
    max_global_shift: float = 0.0,
    max_local_shift: float = 0.0,
    max_scale: float = 1.0,
    max_period: float = 10000.0,
) -> jax.Array:
    """CAPE positional embedding ``(length, batch, dim)`` (transformer.py:73-115).

    With ``augment=True`` (training), random global/local shifts + scale are
    drawn from ``rng`` (explicit JAX PRNG, replacing the reference's
    np.random).
    """
    assert dim % 2 == 0
    pos = jnp.tile(jnp.arange(length, dtype=jnp.float32)[:, None, None], (1, batch_size, 1))
    if mean_normalize:
        pos = pos - jnp.mean(pos, axis=0, keepdims=True)
    if augment:
        assert rng is not None, "cape augment requires an rng key"
        k1, k2, k3 = jax.random.split(rng, 3)
        delta = jax.random.uniform(
            k1, (1, batch_size, 1), minval=-max_global_shift, maxval=max_global_shift
        )
        delta_local = jax.random.uniform(
            k2, (length, batch_size, 1), minval=-max_local_shift, maxval=max_local_shift
        )
        log_lambdas = jax.random.uniform(
            k3, (1, batch_size, 1), minval=-math.log(max_scale), maxval=math.log(max_scale)
        )
        pos = (pos + delta + delta_local) * jnp.exp(log_lambdas)
    half_dim = dim // 2
    adim = jnp.arange(half_dim, dtype=jnp.float32)[None, None, :]
    phase = pos / (max_period ** (adim / (half_dim - 1)))
    return jnp.concatenate([jnp.cos(phase), jnp.sin(phase)], axis=-1)


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------


def _norm_out(p: tp.Optional[dict], x: jax.Array) -> jax.Array:
    """MyGroupNorm(1) over (B, T, C): normalize all T,C per batch (transformer.py:258-268)."""
    if p is None:
        return x
    xt = jnp.swapaxes(x, 1, 2)  # (B, C, T)
    xt = onn.group_norm(xt, 1, p["weight"], p["bias"])
    return jnp.swapaxes(xt, 1, 2)


def _ln(p: dict, x: jax.Array) -> jax.Array:
    return onn.layer_norm(x, p["weight"], p["bias"])


def _gamma(p: tp.Optional[dict], x: jax.Array) -> jax.Array:
    return x if p is None else p["scale"] * x


def _sparse_mask(s: "TransformerSpec", Tq: int, Tk: int):
    from demucs_tpu.ops.sparse import get_mask

    return get_mask(Tk, Tq, s.mask_type, s.sparse_attn_window, s.global_window,
                    s.mask_random_seed, s.sparsity)


def _sparsity_key(s: "TransformerSpec", rng):
    """PRNG for the LSH projections. The reference redraws R with the global
    torch RNG on every forward, even at eval (transformer.py:833); here eval
    uses a fixed seed (deterministic, reproducible output) and training folds
    the step rng."""
    if rng is not None:
        return jax.random.fold_in(rng, 99)
    return jax.random.PRNGKey(s.mask_random_seed)


from demucs_tpu.ops.attention import apply_dropout as _dropout  # noqa: E402


def _attn(p: dict, q: jax.Array, k: jax.Array, v: jax.Array, num_heads: int,
          flash: bool = False, mask=None, rng=None, dropout: float = 0.0,
          auto_sparsity: float = 0.0, sparsity_rng=None) -> jax.Array:
    """torch nn.MultiheadAttention with packed in_proj, batch_first inputs."""
    C = q.shape[-1]
    w_q, w_k, w_v = jnp.split(p["in_proj_weight"], 3, axis=0)
    b_q, b_k, b_v = jnp.split(p["in_proj_bias"], 3, axis=0)
    qh = onn.linear(q, w_q, b_q)
    kh = onn.linear(k, w_k, b_k)
    vh = onn.linear(v, w_v, b_v)
    attn_dropout = dropout
    if auto_sparsity:
        # LSH dynamic sparsity on the projected per-head q/k
        # (transformer.py:789-791 routes to dynamic_sparse_attention; static
        # masks are never combined with it, transformer.py:347,477). The mask
        # is per (batch, head), so this takes the dense-masked einsum path —
        # per the flash verdict that path is the faster one at these lengths.
        from demucs_tpu.ops.sparse import dynamic_sparse_keep_mask

        assert mask is None, "auto_sparsity excludes static sparse masks"
        mask = dynamic_sparse_keep_mask(qh, kh, num_heads, auto_sparsity,
                                        sparsity_rng)
        flash = False
        # the reference's dynamic path never applies attention-probability
        # dropout (transformer.py:788-791: attn_drop only on the dense
        # else-branch); proj_drop at the end still applies on both
        attn_dropout = 0.0
    if flash:
        from demucs_tpu.ops.pallas.attention import flash_mha

        rate, seed = 0.0, None
        if rng is not None and attn_dropout > 0.0:
            # The kernel's counter-based PRNG is statistically equivalent to
            # (not bit-matching) the host path's bernoulli stream.
            rate = attn_dropout
            seed = jax.random.randint(rng, (), 0, 2**31 - 1)
        out = flash_mha(qh, kh, vh, num_heads, mask=mask, dropout=rate,
                        dropout_seed=seed)
    else:
        out = multihead_attention(qh, kh, vh, num_heads, mask=mask,
                                  dropout_rng=rng, dropout=attn_dropout)
    out = onn.linear(out, p["out_proj"]["weight"], p["out_proj"]["bias"])
    if mask is not None:
        # the sparse path's custom MHA also drops after the out-projection
        # (reference transformer.py:747,798 proj_drop)
        out = _dropout(None if rng is None else jax.random.fold_in(rng, 1),
                       out, dropout)
    return out


def _ff(p: dict, x: jax.Array, act, rng=None, dropout: float = 0.0) -> jax.Array:
    # linear2(dropout(act(linear1(x)))) — nn.TransformerEncoderLayer._ff_block
    y = onn.linear(x, p["linear1"]["weight"], p["linear1"]["bias"])
    y = _dropout(rng, act(y), dropout)
    return onn.linear(y, p["linear2"]["weight"], p["linear2"]["bias"])


def self_layer_forward(p: dict, s: TransformerSpec, x: jax.Array,
                       rng: tp.Optional[jax.Array] = None) -> jax.Array:
    """MyTransformerEncoderLayer (transformer.py:339-377), norm_first path.
    ``rng`` enables the reference's train-time dropouts (attn probs,
    post-attn dropout1, FFN-internal, post-FFN dropout2)."""
    act = onn.gelu if s.gelu else jax.nn.relu
    g1 = p.get("gamma_1") if s.layer_scale else None
    g2 = p.get("gamma_2") if s.layer_scale else None
    d = s.dropout
    ks = list(jax.random.split(rng, 4)) if rng is not None else [None] * 4

    auto = s.sparsity if (s.auto_sparsity and s.sparse_self_attn) else 0.0

    def sa(q):
        out = _attn(p["self_attn"], q, q, q, s.num_heads, flash=s.flash_attn,
                    mask=(_sparse_mask(s, x.shape[1], x.shape[1])
                          if s.sparse_self_attn and not auto else None),
                    rng=ks[0], dropout=d, auto_sparsity=auto,
                    sparsity_rng=_sparsity_key(s, rng) if auto else None)
        return _dropout(ks[1], out, d)  # dropout1

    def ff(y):
        return _dropout(ks[3], _ff(p, y, act, rng=ks[2], dropout=d), d)  # dropout2

    if s.norm_first:
        x = x + _gamma(g1, sa(_ln(p["norm1"], x)))
        x = x + _gamma(g2, ff(_ln(p["norm2"], x)))
        if s.norm_out:
            x = _norm_out(p.get("norm_out"), x)
    else:
        x = _ln(p["norm1"], x + _gamma(g1, sa(x)))
        x = _ln(p["norm2"], x + _gamma(g2, ff(x)))
    return x


def cross_layer_forward(p: dict, s: TransformerSpec, q: jax.Array, k: jax.Array,
                        rng: tp.Optional[jax.Array] = None) -> jax.Array:
    """CrossTransformerEncoderLayer (transformer.py:466-512), norm_first path."""
    act = onn.gelu if s.gelu else jax.nn.relu
    g1 = p.get("gamma_1") if s.layer_scale else None
    g2 = p.get("gamma_2") if s.layer_scale else None
    d = s.dropout
    ks = list(jax.random.split(rng, 4)) if rng is not None else [None] * 4

    auto = s.sparsity if (s.auto_sparsity and s.sparse_cross_attn) else 0.0

    def ca(qn, kn):
        out = _attn(p["cross_attn"], qn, kn, kn, s.num_heads, flash=s.flash_attn,
                    mask=(_sparse_mask(s, q.shape[1], k.shape[1])
                          if s.sparse_cross_attn and not auto else None),
                    rng=ks[0], dropout=d, auto_sparsity=auto,
                    sparsity_rng=_sparsity_key(s, rng) if auto else None)
        return _dropout(ks[1], out, d)  # dropout1

    def ff(y):
        return _dropout(ks[3], _ff(p, y, act, rng=ks[2], dropout=d), d)  # dropout2

    if s.norm_first:
        kn = _ln(p["norm2"], k)
        x = q + _gamma(g1, ca(_ln(p["norm1"], q), kn))
        x = x + _gamma(g2, ff(_ln(p["norm3"], x)))
        if s.norm_out:
            x = _norm_out(p.get("norm_out"), x)
    else:
        x = _ln(p["norm1"], q + _gamma(g1, ca(q, k)))
        x = _ln(p["norm2"], x + _gamma(g2, ff(x)))
    return x


def crosstransformer_forward(
    p: dict,
    s: TransformerSpec,
    x: jax.Array,
    xt: jax.Array,
    *,
    train: bool = False,
    rng: tp.Optional[jax.Array] = None,
) -> tp.Tuple[jax.Array, jax.Array]:
    """CrossTransformerEncoder forward (transformer.py:648-676).

    Args:
        x: spectrogram branch ``(B, C, Fr, T1)``.
        xt: waveform branch ``(B, C, T2)``.
    """
    B, C, Fr, T1 = x.shape
    pos_emb_2d = sin_embedding_2d(C, Fr, T1, s.max_period)  # (C, Fr, T1)
    # b c fr t1 -> b (t1 fr) c
    x = jnp.transpose(x, (0, 3, 2, 1)).reshape(B, T1 * Fr, C)
    pos2d = jnp.transpose(pos_emb_2d, (2, 1, 0)).reshape(1, T1 * Fr, C)
    if s.norm_in:
        x = _ln(p["norm_in"], x)
    elif s.norm_in_group:
        x = _norm_out(p["norm_in"], x)
    x = x + s.weight_pos_embed * pos2d.astype(x.dtype)

    T2 = xt.shape[-1]
    xt = jnp.swapaxes(xt, 1, 2)  # (B, T2, C)
    if s.emb == "sin":
        # sin_random_shift is 0 for all released configs; train-time random
        # shift would thread through `rng` here.
        pos_emb = sin_embedding(T2, C, 0, s.max_period)[None]
    elif s.emb == "cape":
        glob, loc, scale = s.cape_glob_loc_scale
        pe = cape_embedding(
            T2, C, B,
            mean_normalize=s.cape_mean_normalize,
            augment=bool(train and s.cape_augment),
            rng=rng,
            max_global_shift=glob, max_local_shift=loc, max_scale=scale,
            max_period=s.max_period,
        )
        pos_emb = jnp.swapaxes(pe, 0, 1)  # (B, T2, C)
    elif s.emb == "scaled":
        boost = 3.0
        pos_emb = (p["position_embeddings"]["embedding"]["weight"][:T2] * boost)[None]
    else:
        raise ValueError(f"unknown transformer embedding {s.emb}")
    if s.norm_in:
        xt = _ln(p["norm_in_t"], xt)
    elif s.norm_in_group:
        xt = _norm_out(p["norm_in_t"], xt)
    xt = xt + s.weight_pos_embed * pos_emb.astype(xt.dtype)

    drop = bool(train and s.dropout > 0.0 and rng is not None)
    layer_keys = (list(jax.random.split(jax.random.fold_in(rng, 77), 2 * s.num_layers))
                  if drop else [None] * (2 * s.num_layers))
    for idx in range(s.num_layers):
        k1, k2 = layer_keys[2 * idx], layer_keys[2 * idx + 1]
        if idx % 2 == s.classic_parity:
            x = self_layer_forward(p["layers"][idx], s, x, rng=k1)
            xt = self_layer_forward(p["layers_t"][idx], s, xt, rng=k2)
        else:
            old_x = x
            x = cross_layer_forward(p["layers"][idx], s, x, xt, rng=k1)
            xt = cross_layer_forward(p["layers_t"][idx], s, xt, old_x, rng=k2)

    x = jnp.transpose(x.reshape(B, T1, Fr, C), (0, 3, 2, 1))
    xt = jnp.swapaxes(xt, 1, 2)
    return x, xt
