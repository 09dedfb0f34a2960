"""Shared functional layers for the hybrid Demucs family (v3/v4).

Behavioral reference: ``demucs/hdemucs.py`` (HEncLayer 69-157, HDecLayer
256-335, ScaledEmbedding 43-66) and ``demucs/demucs.py`` (DConv 86-154,
LocalState 157-216, BLSTM 20-67).

Everything here is a pure function ``(params, spec, x) -> y``:

- ``params`` are nested dicts mirroring the reference's state-dict paths
  (numeric path components become integer dict keys), so the zoo bridge in
  ``demucs_tpu.zoo.torch_load`` is a pure re-nesting of the ``.th`` state.
- ``spec`` is a frozen dataclass of static layer hyperparameters, computed
  once per model config by :func:`build_hybrid_layout` (a faithful re-creation
  of the constructor loop at ``demucs/hdemucs.py:494-582`` /
  ``demucs/htdemucs.py:258-363``).

TPU notes: the per-frequency DConv branch is expressed as a batched conv over
``(B*F, C, T)`` (one big MXU-friendly conv, not a per-bin loop); the BLSTM uses
``lax.scan``; LocalState attention is three einsums that XLA fuses onto the
MXU.
"""

from __future__ import annotations

import dataclasses
import math
import typing as tp

import jax
import jax.numpy as jnp

from demucs_tpu.ops import nn as onn
from demucs_tpu.utils import unfold


# ---------------------------------------------------------------------------
# Specs
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DConvSpec:
    channels: int
    compress: float = 4.0
    depth: int = 2
    init: float = 1e-4
    norm: bool = True
    attn: bool = False
    heads: int = 4
    ndecay: int = 4
    lstm: bool = False
    gelu: bool = True
    kernel: int = 3
    dilate: bool = True


@dataclasses.dataclass(frozen=True)
class EncSpec:
    chin: int
    chout: int
    freq: bool
    kernel: int
    stride: int
    pad: int
    empty: bool
    norm: bool
    norm_groups: int
    rewrite: bool
    context: int
    dconv: tp.Optional[DConvSpec]
    multi_freqs: tp.Tuple[float, ...] = ()  # MultiWrap band ratios


@dataclasses.dataclass(frozen=True)
class DecSpec:
    chin: int
    chout: int
    freq: bool
    kernel: int
    stride: int
    pad: int
    empty: bool
    norm: bool
    norm_groups: int
    rewrite: bool
    context: int
    context_freq: bool
    last: bool
    dconv: tp.Optional[DConvSpec]
    multi_freqs: tp.Tuple[float, ...] = ()


@dataclasses.dataclass(frozen=True)
class HybridLayout:
    """Static structure of the dual-branch U-Net."""

    enc: tp.Tuple[EncSpec, ...]
    tenc: tp.Tuple[EncSpec, ...]
    dec: tp.Tuple[DecSpec, ...]
    tdec: tp.Tuple[DecSpec, ...]
    freq_emb_bins: int  # num embeddings for the ScaledEmbedding (0 = none)
    freq_emb_dim: int
    bottleneck_channels: int  # channels entering the bottleneck


def build_hybrid_layout(
    *,
    sources: tp.Sequence[str],
    audio_channels: int,
    channels: int,
    channels_time: tp.Optional[int],
    growth: float,
    nfft: int,
    cac: bool,
    depth: int,
    rewrite: bool,
    kernel_size: int,
    time_stride: int,
    stride: int,
    context: int,
    context_enc: int,
    norm_starts: int,
    norm_groups: int,
    dconv_mode: int,
    dconv_depth: int,
    dconv_comp: float,
    dconv_init: float,
    dconv_lstm_start: tp.Optional[int] = None,
    dconv_attn_start: tp.Optional[int] = None,
    freq_emb: float = 0.2,
    hybrid: bool = True,
    multi_freqs: tp.Sequence[float] = (),
    multi_freqs_depth: int = 0,
) -> HybridLayout:
    """Re-creation of the reference constructor loop (hdemucs.py:494-582)."""
    multi_freqs = tuple(multi_freqs or ())

    enc: list[EncSpec] = []
    tenc: list[EncSpec] = []
    dec: list[DecSpec] = []
    tdec: list[DecSpec] = []

    chin = audio_channels
    chin_z = chin * 2 if cac else chin
    chout = channels_time or channels
    chout_z = channels
    freqs = nfft // 2
    freq_emb_bins = 0
    freq_emb_dim = 0

    for index in range(depth):
        lstm = dconv_lstm_start is not None and index >= dconv_lstm_start
        attn = dconv_attn_start is not None and index >= dconv_attn_start
        norm = index >= norm_starts
        freq = freqs > 1
        stri = stride
        ker = kernel_size
        if not freq:
            assert freqs == 1
            ker = time_stride * 2
            stri = time_stride

        pad = True
        last_freq = False
        if freq and freqs <= kernel_size:
            ker = freqs
            pad = False
            last_freq = True

        if last_freq:
            chout_z = max(chout, chout_z)
            chout = chout_z

        def dconv_spec(ch: int) -> tp.Optional[DConvSpec]:
            return DConvSpec(
                channels=ch,
                compress=dconv_comp,
                depth=dconv_depth,
                init=dconv_init,
                lstm=lstm,
                attn=attn,
                gelu=True,
                # reference DConv: negative depth disables dilation
                # (demucs.py:100-104, dilate = depth > 0)
                dilate=dconv_depth > 0,
            )

        pad_amt = ker // 4 if pad else 0
        multi = bool(multi_freqs) and index < multi_freqs_depth
        enc.append(
            EncSpec(
                chin=chin_z, chout=chout_z, freq=freq, kernel=ker, stride=stri,
                pad=pad_amt, empty=False, norm=norm, norm_groups=norm_groups,
                rewrite=rewrite, context=context_enc,
                dconv=dconv_spec(chout_z) if dconv_mode & 1 else None,
                multi_freqs=multi_freqs if multi else (),
            )
        )
        if hybrid and freq:
            tenc.append(
                EncSpec(
                    chin=chin, chout=chout, freq=False, kernel=kernel_size,
                    stride=stride, pad=kernel_size // 4, empty=last_freq,
                    norm=norm, norm_groups=norm_groups, rewrite=rewrite,
                    context=context_enc,
                    dconv=dconv_spec(chout) if dconv_mode & 1 else None,
                )
            )

        if index == 0:
            chin = audio_channels * len(sources)
            chin_z = chin * 2 if cac else chin

        dec.insert(
            0,
            DecSpec(
                chin=chout_z, chout=chin_z, freq=freq, kernel=ker, stride=stri,
                pad=pad_amt, empty=False, norm=norm, norm_groups=norm_groups,
                rewrite=rewrite, context=context, context_freq=not multi,
                last=index == 0,
                dconv=dconv_spec(chout_z) if dconv_mode & 2 else None,
                multi_freqs=multi_freqs if multi else (),
            ),
        )
        if hybrid and freq:
            tdec.insert(
                0,
                DecSpec(
                    chin=chout, chout=chin, freq=False, kernel=kernel_size,
                    stride=stride, pad=kernel_size // 4, empty=last_freq,
                    norm=norm, norm_groups=norm_groups, rewrite=rewrite,
                    context=context, context_freq=True, last=index == 0,
                    dconv=dconv_spec(chout) if dconv_mode & 2 else None,
                ),
            )

        chin = chout
        chin_z = chout_z
        chout = int(growth * chout)
        chout_z = int(growth * chout_z)
        if freq:
            if freqs <= kernel_size:
                freqs = 1
            else:
                freqs //= stride
        if index == 0 and freq_emb:
            freq_emb_bins = freqs
            freq_emb_dim = chin_z

    return HybridLayout(
        enc=tuple(enc), tenc=tuple(tenc), dec=tuple(dec), tdec=tuple(tdec),
        freq_emb_bins=freq_emb_bins, freq_emb_dim=freq_emb_dim,
        bottleneck_channels=chin_z,
    )


# ---------------------------------------------------------------------------
# BLSTM (lax.scan) — demucs.py:20-67
# ---------------------------------------------------------------------------


def _lstm_dir(p: dict, x: jax.Array, reverse: bool) -> jax.Array:
    """Single-direction LSTM over ``x (T, B, C)`` with torch gate layout."""
    suffix = "_reverse" if reverse else ""
    w_ih = p[f"weight_ih_l{suffix}"]
    w_hh = p[f"weight_hh_l{suffix}"]
    b = p[f"bias_ih_l{suffix}"] + p[f"bias_hh_l{suffix}"]
    H = w_hh.shape[1]
    xs = jnp.einsum("tbc,gc->tbg", x, w_ih) + b  # precompute input proj

    def step(carry, x_t):
        h, c = carry
        gates = x_t + h @ w_hh.T
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    B = x.shape[1]
    init = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
    _, ys = jax.lax.scan(step, init, xs, reverse=reverse)
    return ys


def lstm_forward(p: dict, x: jax.Array, num_layers: int) -> jax.Array:
    """Bidirectional multi-layer LSTM matching torch ``nn.LSTM``.

    ``x (T, B, C)`` -> ``(T, B, 2H)``. Params use torch naming:
    ``weight_ih_l{k}[_reverse]`` etc.
    """
    for layer in range(num_layers):
        sub = {
            k.replace(f"l{layer}", "l"): v
            for k, v in p.items()
            if k.endswith(f"l{layer}") or k.endswith(f"l{layer}_reverse")
        }
        fwd = _lstm_dir(sub, x, reverse=False)
        bwd = _lstm_dir(sub, x, reverse=True)
        x = jnp.concatenate([fwd, bwd], axis=-1)
    return x


def blstm_forward(p: dict, x: jax.Array, *, layers: int, max_steps: tp.Optional[int],
                  skip: bool) -> jax.Array:
    """BLSTM module (demucs.py:20-67): optional frame chunking + linear + skip."""
    B, C, T = x.shape
    y = x
    framed = False
    if max_steps is not None and T > max_steps:
        width = max_steps
        stride = width // 2
        frames = unfold(x, width, stride)  # (B, C, F, width)
        nframes = frames.shape[2]
        framed = True
        x = jnp.moveaxis(frames, 2, 1).reshape(-1, C, width)

    xt = jnp.transpose(x, (2, 0, 1))  # (T', B', C)
    xt = lstm_forward(p["lstm"], xt, num_layers=layers)
    xt = onn.linear(xt, p["linear"]["weight"], p["linear"]["bias"])
    x = jnp.transpose(xt, (1, 2, 0))  # (B', C, T')

    if framed:
        frames_out = x.reshape(B, -1, C, width)
        limit = stride // 2
        out = []
        for k in range(nframes):
            if k == 0:
                out.append(frames_out[:, k, :, :-limit])
            elif k == nframes - 1:
                out.append(frames_out[:, k, :, limit:])
            else:
                out.append(frames_out[:, k, :, limit:-limit])
        x = jnp.concatenate(out, axis=-1)[..., :T]
    if skip:
        x = x + y
    return x


# ---------------------------------------------------------------------------
# LocalState attention — demucs.py:157-216
# ---------------------------------------------------------------------------


def local_state_forward(p: dict, x: jax.Array, *, heads: int, ndecay: int) -> jax.Array:
    """Content-based attention with decaying time penalty (no pos-emb)."""
    B, C, T = x.shape
    indexes = jnp.arange(T, dtype=x.dtype)
    delta = indexes[:, None] - indexes[None, :]

    queries = onn.conv1d(x, p["query"]["weight"], p["query"]["bias"]).reshape(B, heads, -1, T)
    keys = onn.conv1d(x, p["key"]["weight"], p["key"]["bias"]).reshape(B, heads, -1, T)
    dots = jnp.einsum("bhct,bhcs->bhts", keys, queries) / math.sqrt(keys.shape[2])
    if ndecay:
        decays = jnp.arange(1, ndecay + 1, dtype=x.dtype)
        decay_q = onn.conv1d(x, p["query_decay"]["weight"], p["query_decay"]["bias"])
        decay_q = jax.nn.sigmoid(decay_q.reshape(B, heads, -1, T)) / 2
        decay_kernel = -decays[:, None, None] * jnp.abs(delta) / math.sqrt(ndecay)
        dots = dots + jnp.einsum("fts,bhfs->bhts", decay_kernel, decay_q)

    dots = jnp.where(jnp.eye(T, dtype=bool)[None, None], -100.0, dots)
    weights = jax.nn.softmax(dots, axis=2)

    content = onn.conv1d(x, p["content"]["weight"], p["content"]["bias"]).reshape(B, heads, -1, T)
    result = jnp.einsum("bhts,bhct->bhcs", weights, content).reshape(B, -1, T)
    return x + onn.conv1d(result, p["proj"]["weight"], p["proj"]["bias"])


# ---------------------------------------------------------------------------
# DConv — demucs.py:86-154
# ---------------------------------------------------------------------------


def dconv_forward(p: dict, s: DConvSpec, x: jax.Array) -> jax.Array:
    """Residual dilated-conv branch. ``x (B, C, T)``.

    Sequential positions mirror the reference (demucs.py:133-149):
    0=conv1, 1=norm1, 2=act, [3=BLSTM][3+lstm=LocalState], then conv2, norm2,
    GLU, LayerScale.
    """
    act = onn.gelu if s.gelu else jax.nn.relu
    for d in range(abs(s.depth)):
        layer = p["layers"][d]
        dilation = 2**d if s.dilate else 1
        padding = dilation * (s.kernel // 2)
        y = onn.conv1d(
            x, layer[0]["weight"], layer[0]["bias"],
            dilation=dilation, padding=padding,
        )
        if s.norm:
            y = onn.group_norm(y, 1, layer[1]["weight"], layer[1]["bias"])
        y = act(y)
        pos = 3
        if s.lstm:
            y = blstm_forward(layer[pos], y, layers=2, max_steps=200, skip=True)
            pos += 1
        if s.attn:
            y = local_state_forward(layer[pos], y, heads=s.heads, ndecay=s.ndecay)
            pos += 1
        y = onn.conv1d(y, layer[pos]["weight"], layer[pos]["bias"])
        if s.norm:
            y = onn.group_norm(y, 1, layer[pos + 1]["weight"], layer[pos + 1]["bias"])
        y = onn.glu(y, axis=1)
        scale = layer[pos + 3]["scale"]
        x = x + scale[None, :, None] * y
    return x


# ---------------------------------------------------------------------------
# Encoder / decoder layers — hdemucs.py:69-157, 256-335
# ---------------------------------------------------------------------------


def _maybe_norm(par: tp.Optional[dict], s, groups: int, x: jax.Array) -> jax.Array:
    if par is None:
        return x
    return onn.group_norm(x, groups, par["weight"], par["bias"])


def _dconv_on_branch(p: dict, s_dconv: DConvSpec, y: jax.Array, freq: bool) -> jax.Array:
    if freq:
        B, C, Fr, T = y.shape
        y = jnp.moveaxis(y, 2, 1).reshape(-1, C, T)
        y = dconv_forward(p, s_dconv, y)
        return jnp.moveaxis(y.reshape(B, Fr, C, T), 1, 2)
    return dconv_forward(p, s_dconv, y)


def henc_forward(
    p: dict, s: EncSpec, x: jax.Array, inject: tp.Optional[jax.Array] = None
) -> jax.Array:
    """HEncLayer forward (hdemucs.py:123-157)."""
    if s.multi_freqs:
        assert inject is None
        return multiwrap_enc_forward(p, s, x)
    if not s.freq and x.ndim == 4:
        B, C, Fr, T = x.shape
        x = x.reshape(B, -1, T)
    if not s.freq:
        le = x.shape[-1]
        if le % s.stride != 0:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, s.stride - le % s.stride)])
    if s.freq:
        y = onn.conv2d(
            x, p["conv"]["weight"], p["conv"]["bias"],
            stride=(s.stride, 1), padding=(s.pad, 0),
        )
    else:
        y = onn.conv1d(
            x, p["conv"]["weight"], p["conv"]["bias"], stride=s.stride, padding=s.pad
        )
    if s.empty:
        return y
    if inject is not None:
        if inject.ndim == 3 and y.ndim == 4:
            inject = inject[:, :, None]
        y = y + inject
    y = onn.gelu(_maybe_norm(p.get("norm1") if s.norm else None, s, s.norm_groups, y))
    if s.dconv is not None:
        y = _dconv_on_branch(p["dconv"], s.dconv, y, s.freq)
    if s.rewrite:
        k = 1 + 2 * s.context
        if s.freq:
            z = onn.conv2d(y, p["rewrite"]["weight"], p["rewrite"]["bias"],
                           padding=(s.context, s.context))
        else:
            z = onn.conv1d(y, p["rewrite"]["weight"], p["rewrite"]["bias"],
                           padding=s.context)
        assert p["rewrite"]["weight"].shape[-1] == k
        z = _maybe_norm(p.get("norm2") if s.norm else None, s, s.norm_groups, z)
        z = onn.glu(z, axis=1)
    else:
        z = y
    return z


def hdec_forward(
    p: dict, s: DecSpec, x: jax.Array, skip: tp.Optional[jax.Array], length: int
) -> tp.Tuple[jax.Array, jax.Array]:
    """HDecLayer forward (hdemucs.py:304-335). Returns ``(z, pre)``."""
    if s.multi_freqs:
        return multiwrap_dec_forward(p, s, x, skip, length)
    if s.freq and x.ndim == 3:
        B, C, T = x.shape
        x = x.reshape(B, s.chin, -1, T)
    if not s.empty:
        x = x + skip
        if s.rewrite:
            if s.freq:
                if s.context_freq:
                    y = onn.conv2d(x, p["rewrite"]["weight"], p["rewrite"]["bias"],
                                   padding=(s.context, s.context))
                else:
                    y = onn.conv2d(x, p["rewrite"]["weight"], p["rewrite"]["bias"],
                                   padding=(0, s.context))
            else:
                y = onn.conv1d(x, p["rewrite"]["weight"], p["rewrite"]["bias"],
                               padding=s.context)
            y = _maybe_norm(p.get("norm1") if s.norm else None, s, s.norm_groups, y)
            y = onn.glu(y, axis=1)
        else:
            y = x
        if s.dconv is not None:
            y = _dconv_on_branch(p["dconv"], s.dconv, y, s.freq)
    else:
        y = x
        assert skip is None
    if s.freq:
        z = onn.conv_transpose2d(
            y, p["conv_tr"]["weight"], p["conv_tr"]["bias"], stride=(s.stride, 1)
        )
    else:
        z = onn.conv_transpose1d(
            y, p["conv_tr"]["weight"], p["conv_tr"]["bias"], stride=s.stride
        )
    z = _maybe_norm(p.get("norm2") if s.norm else None, s, s.norm_groups, z)
    if s.freq:
        if s.pad:
            z = z[..., s.pad : -s.pad, :]
    else:
        z = z[..., s.pad : s.pad + length]
        assert z.shape[-1] == length, (z.shape[-1], length)
    if not s.last:
        z = onn.gelu(z)
    return z, y


def scaled_embedding_forward(p: dict, ids: jax.Array, scale: float) -> jax.Array:
    """ScaledEmbedding forward (hdemucs.py:43-66): stored weight × scale."""
    return onn.embedding(ids, p["embedding"]["weight"]) * scale


# ---------------------------------------------------------------------------
# MultiWrap — per-frequency-band layer replication (hdemucs.py:160-253)
# ---------------------------------------------------------------------------


def multiwrap_enc_forward(p: dict, s: EncSpec, x: jax.Array) -> jax.Array:
    """Encoder MultiWrap: split the freq axis into bands (ratios +[1]), run a
    replica layer per band with explicit edge padding, concat. All band-limit
    arithmetic mirrors hdemucs.py:195-224 and is static."""
    B, C, Fr, T = x.shape
    ratios = list(s.multi_freqs) + [1]
    sub_spec = dataclasses.replace(s, multi_freqs=(), pad=0)
    start = 0
    outs = []
    pad = s.kernel // 4
    for k, ratio in enumerate(ratios):
        if ratio == 1:
            limit = Fr
        else:
            limit = int(round(Fr * ratio))
            le = limit - start
            if start == 0:
                le += pad
            frames = round((le - s.kernel) / s.stride + 1)
            limit = start + (frames - 1) * s.stride + s.kernel
            if start == 0:
                limit -= pad
        assert limit - start > 0, (limit, start)
        assert limit <= Fr, (limit, Fr)
        y = x[:, :, start:limit, :]
        if start == 0:
            y = jnp.pad(y, [(0, 0), (0, 0), (pad, 0), (0, 0)])
        if ratio == 1:
            y = jnp.pad(y, [(0, 0), (0, 0), (0, pad), (0, 0)])
        outs.append(henc_forward(p["layers"][k], sub_spec, y))
        start = limit - s.kernel + s.stride
    return jnp.concatenate(outs, axis=2)


def multiwrap_dec_forward(
    p: dict, s: DecSpec, x: jax.Array, skip: jax.Array, length: int
) -> tp.Tuple[jax.Array, tp.Optional[jax.Array]]:
    """Decoder MultiWrap (hdemucs.py:226-253): per-band transposed convs with
    overlap-correction stitching at band boundaries."""
    B, C, Fr, T = x.shape
    ratios = list(s.multi_freqs) + [1]
    # Band replicas run unpadded and without the final GELU (last=True).
    sub_spec = dataclasses.replace(s, multi_freqs=(), pad=0, last=True)
    start = 0
    outs: list = []
    for k, ratio in enumerate(ratios):
        limit = Fr if ratio == 1 else int(round(Fr * ratio))
        y = x[:, :, start:limit]
        sk = skip[:, :, start:limit]
        out, _ = hdec_forward(p["layers"][k], sub_spec, y, sk, length)
        if outs:
            bias = p["layers"][k]["conv_tr"]["bias"].reshape(1, -1, 1, 1)
            outs[-1] = outs[-1].at[:, :, -s.stride :].add(
                out[:, :, : s.stride] - bias
            )
            out = out[:, :, s.stride :]
        if ratio == 1:
            out = out[:, :, : -s.stride // 2, :]
        if start == 0:
            out = out[:, :, s.stride // 2 :, :]
        outs.append(out)
        start = limit
    out = jnp.concatenate(outs, axis=2)
    if not s.last:
        out = onn.gelu(out)
    return out, None
