"""Demucs (v2): time-domain U-Net with optional BLSTM bottleneck.

Behavioral reference: ``demucs/demucs.py:219-447``. Encoder: Conv1d k=8 s=4 +
GELU + DConv + GLU rewrite; decoder: context conv + GLU + ConvTranspose1d with
center-trimmed skip adds; 2x sinc upsample in / 0.5x out; per-track mono
mean/std normalization; ``valid_length`` telescopes conv sizes so output ==
input length.

Parameter paths mirror the torch ``nn.Sequential`` numeric indices, so the zoo
bridge stays a pure re-nesting (the reference's own legacy rename shim,
demucs.py:438-447, is applied at load time in ``demucs_tpu.zoo``).
"""

from __future__ import annotations

import dataclasses
import functools
import math
import typing as tp

import jax
import jax.numpy as jnp

from demucs_tpu.ops import nn as onn
from demucs_tpu.ops.resample import resample_frac
from demucs_tpu.models import hlayers as hl
from demucs_tpu.utils import center_trim


@dataclasses.dataclass(frozen=True)
class DemucsConfig:
    sources: tp.Tuple[str, ...] = ("drums", "bass", "other", "vocals")
    audio_channels: int = 2
    channels: int = 64
    growth: float = 2.0
    depth: int = 6
    rewrite: bool = True
    lstm_layers: int = 0
    kernel_size: int = 8
    stride: int = 4
    context: int = 1
    gelu: bool = True
    glu: bool = True
    norm_starts: int = 4
    norm_groups: int = 4
    dconv_mode: int = 1
    dconv_depth: int = 2
    dconv_comp: float = 4.0
    dconv_attn: int = 4
    dconv_lstm: int = 4
    dconv_init: float = 1e-4
    normalize: bool = True
    resample: bool = True
    rescale: float = 0.1
    samplerate: int = 44100
    segment: float = 40.0
    # Explicit jax matmul precision for the forward's convs/matmuls (e.g.
    # "tensorfloat32" = 3-pass bf16 MXU, "highest" = exact) — the knob the
    # presets ladder sets (demucs_tpu/presets.py). None = backend default.
    matmul_precision: tp.Optional[str] = None


def valid_length(cfg: DemucsConfig, length: int) -> int:
    """Nearest valid input length (demucs.py:376-397)."""
    if cfg.resample:
        length *= 2
    for _ in range(cfg.depth):
        length = math.ceil((length - cfg.kernel_size) / cfg.stride) + 1
        length = max(1, length)
    for _ in range(cfg.depth):
        length = (length - 1) * cfg.stride + cfg.kernel_size
    if cfg.resample:
        length = math.ceil(length / 2)
    return int(length)


@dataclasses.dataclass(frozen=True)
class _V2Layout:
    enc_dconv: tp.Tuple[tp.Optional[hl.DConvSpec], ...]
    dec_dconv: tp.Tuple[tp.Optional[hl.DConvSpec], ...]
    enc_norm: tp.Tuple[bool, ...]
    channels: tp.Tuple[int, ...]  # per-layer channel counts


@functools.lru_cache(maxsize=None)
def convtr_param_names(cfg: DemucsConfig) -> tp.FrozenSet[str]:
    """Dotted names of the decoder ConvTranspose1d weights. The v2 decoder
    dict uses positional keys (mirroring init_demucs's layout below), so the
    SVD penalty's transposed-conv handling (reference svd.py:58-61 checks
    isinstance) needs this explicit enumeration."""
    lay = layout(cfg)
    names = []
    for index in range(cfg.depth):
        pos = 0
        if cfg.rewrite:
            pos += 3
        if lay.dec_dconv[index] is not None:
            pos += 1
        names.append(f"decoder.{cfg.depth - 1 - index}.{pos}.weight")
    return frozenset(names)


def layout(cfg: DemucsConfig) -> _V2Layout:
    enc_dconv, dec_dconv, enc_norm, chans = [], [], [], []
    channels = cfg.channels
    for index in range(cfg.depth):
        attn = index >= cfg.dconv_attn
        lstm = index >= cfg.dconv_lstm
        spec = hl.DConvSpec(
            channels=channels, compress=cfg.dconv_comp, depth=cfg.dconv_depth,
            init=cfg.dconv_init, attn=attn, lstm=lstm,
        )
        enc_dconv.append(spec if cfg.dconv_mode & 1 else None)
        dec_dconv.append(spec if cfg.dconv_mode & 2 else None)
        enc_norm.append(index >= cfg.norm_starts)
        chans.append(channels)
        channels = int(cfg.growth * channels)
    return _V2Layout(tuple(enc_dconv), tuple(dec_dconv), tuple(enc_norm), tuple(chans))


def forward(
    params: dict,
    mix: jax.Array,
    cfg: DemucsConfig,
    *,
    train: bool = False,
    rng: tp.Optional[jax.Array] = None,
) -> jax.Array:
    """``mix (B, C, L)`` -> stems ``(B, S, C, L)`` (demucs.py:399-436)."""
    import contextlib

    scope = (jax.default_matmul_precision(cfg.matmul_precision)
             if cfg.matmul_precision else contextlib.nullcontext())
    with scope:
        return _forward_body(params, mix, cfg, train=train, rng=rng)


def _forward_body(
    params: dict,
    mix: jax.Array,
    cfg: DemucsConfig,
    *,
    train: bool,
    rng: tp.Optional[jax.Array],
) -> jax.Array:
    del train, rng
    lay = layout(cfg)
    x = mix
    length = x.shape[-1]

    if cfg.normalize:
        mono = mix.mean(axis=1, keepdims=True)
        mean = mono.mean(axis=-1, keepdims=True)
        std = onn.std_unbiased(mono, axis=-1)
        x = (x - mean) / (1e-5 + std)
    else:
        mean = 0.0
        std = 1.0

    delta = valid_length(cfg, length) - length
    x = jnp.pad(x, [(0, 0), (0, 0), (delta // 2, delta - delta // 2)])

    if cfg.resample:
        x = resample_frac(x, 1, 2)

    ch_scale = 2 if cfg.glu else 1
    act2 = onn.gelu if cfg.gelu else jax.nn.relu
    activation = (lambda v: onn.glu(v, axis=1)) if cfg.glu else jax.nn.relu

    saved = []
    for index in range(cfg.depth):
        p = params["encoder"][index]
        norm = lay.enc_norm[index]
        x = onn.conv1d(x, p[0]["weight"], p[0]["bias"], stride=cfg.stride)
        if norm:
            x = onn.group_norm(x, cfg.norm_groups, p[1]["weight"], p[1]["bias"])
        x = act2(x)
        pos = 3
        if lay.enc_dconv[index] is not None:
            x = hl.dconv_forward(p[pos], lay.enc_dconv[index], x)
            pos += 1
        if cfg.rewrite:
            x = onn.conv1d(x, p[pos]["weight"], p[pos]["bias"])
            if norm:
                x = onn.group_norm(x, cfg.norm_groups, p[pos + 1]["weight"], p[pos + 1]["bias"])
            x = activation(x)
        saved.append(x)

    if cfg.lstm_layers:
        x = hl.blstm_forward(params["lstm"], x, layers=cfg.lstm_layers,
                             max_steps=None, skip=False)

    for idx in range(cfg.depth):
        index = cfg.depth - 1 - idx  # decoder[idx] was built at `index`
        p = params["decoder"][idx]
        norm = lay.enc_norm[index]
        skip = saved.pop(-1)
        x = x + center_trim(skip, x)
        pos = 0
        if cfg.rewrite:
            x = onn.conv1d(x, p[pos]["weight"], p[pos]["bias"], padding=cfg.context)
            if norm:
                x = onn.group_norm(x, cfg.norm_groups, p[pos + 1]["weight"], p[pos + 1]["bias"])
            x = activation(x)
            pos += 3
        if lay.dec_dconv[index] is not None:
            x = hl.dconv_forward(p[pos], lay.dec_dconv[index], x)
            pos += 1
        x = onn.conv_transpose1d(x, p[pos]["weight"], p[pos]["bias"], stride=cfg.stride)
        if index > 0:
            if norm:
                x = onn.group_norm(x, cfg.norm_groups, p[pos + 1]["weight"], p[pos + 1]["bias"])
            x = act2(x)

    if cfg.resample:
        x = resample_frac(x, 2, 1)
    x = x * std + mean
    x = center_trim(x, length)
    return x.reshape(x.shape[0], len(cfg.sources), cfg.audio_channels, x.shape[-1])


def init_demucs(cfg: DemucsConfig, seed: int = 0) -> dict:
    """Random params (torch-equivalent distributions + rescale)."""
    from demucs_tpu.models import initializers as I

    ini = I.Init(seed)
    lay = layout(cfg)
    ch_scale = 2 if cfg.glu else 1
    params: dict = {"encoder": {}, "decoder": {}}
    in_channels = cfg.audio_channels
    for index in range(cfg.depth):
        channels = lay.channels[index]
        norm = lay.enc_norm[index]
        enc: dict = {0: ini.conv((channels, in_channels, cfg.kernel_size), cfg.rescale)}
        if norm:
            enc[1] = ini.norm(channels)
        pos = 3
        if lay.enc_dconv[index] is not None:
            enc[pos] = I.init_dconv(ini, lay.enc_dconv[index], cfg.rescale)
            pos += 1
        if cfg.rewrite:
            enc[pos] = ini.conv((ch_scale * channels, channels, 1), cfg.rescale)
            if norm:
                enc[pos + 1] = ini.norm(ch_scale * channels)
        params["encoder"][index] = enc

        out_channels = (lay.channels[index - 1] if index > 0
                        else len(cfg.sources) * cfg.audio_channels)
        dec: dict = {}
        pos = 0
        if cfg.rewrite:
            dec[pos] = ini.conv((ch_scale * channels, channels, 2 * cfg.context + 1), cfg.rescale)
            if norm:
                dec[pos + 1] = ini.norm(ch_scale * channels)
            pos += 3
        if lay.dec_dconv[index] is not None:
            dec[pos] = I.init_dconv(ini, lay.dec_dconv[index], cfg.rescale)
            pos += 1
        dec[pos] = ini.conv_tr((channels, out_channels, cfg.kernel_size), cfg.rescale)
        if index > 0 and norm:
            dec[pos + 1] = ini.norm(out_channels)
        params["decoder"][cfg.depth - 1 - index] = dec
        in_channels = channels

    if cfg.lstm_layers:
        dim = lay.channels[-1]
        lstm_p = {}
        bound = 1.0 / math.sqrt(dim)
        import numpy as np

        for ly in range(cfg.lstm_layers):
            in_dim = dim if ly == 0 else 2 * dim
            for direction in ("", "_reverse"):
                for name, shape in (
                    (f"weight_ih_l{ly}{direction}", (4 * dim, in_dim)),
                    (f"weight_hh_l{ly}{direction}", (4 * dim, dim)),
                    (f"bias_ih_l{ly}{direction}", (4 * dim,)),
                    (f"bias_hh_l{ly}{direction}", (4 * dim,)),
                ):
                    lstm_p[name] = jnp.asarray(
                        ini.rng.uniform(-bound, bound, size=shape).astype(np.float32))
        params["lstm"] = {"lstm": lstm_p, "linear": ini.linear(dim, 2 * dim)}
    return params
