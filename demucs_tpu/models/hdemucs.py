"""HDemucs (v3): hybrid spectrogram+waveform U-Net (no transformer).

Behavioral reference: ``demucs/hdemucs.py:338-794``. Differences from HTDemucs:
depth 6 (branches merge by injection at the stride-aligned layer and split via
the ``pre`` tensor in the decoder), decoder input initialized to zeros (signal
flows through U-Net skips), DConv branches gain BLSTM + LocalState attention
from ``dconv_lstm``/``dconv_attn`` depth on, optional ``hybrid_old`` padding-bug
replication for MDX-era checkpoints, and no train-segment pinning.
"""

from __future__ import annotations

import dataclasses
import functools
import typing as tp

import jax
import jax.numpy as jnp

from demucs_tpu.ops import nn as onn
from demucs_tpu.ops.spec import cac_pack, cac_unpack, demucs_ispec, demucs_spec
from demucs_tpu.models import hlayers as hl


@dataclasses.dataclass(frozen=True)
class HDemucsConfig:
    sources: tp.Tuple[str, ...] = ("drums", "bass", "other", "vocals")
    audio_channels: int = 2
    channels: int = 48
    channels_time: tp.Optional[int] = None
    growth: int = 2
    # STFT
    nfft: int = 4096
    wiener_iters: int = 0
    end_iters: int = 0
    wiener_residual: bool = False
    cac: bool = True
    # Main structure
    depth: int = 6
    rewrite: bool = True
    hybrid: bool = True
    hybrid_old: bool = False
    # Frequency branch
    multi_freqs: tp.Tuple[float, ...] = ()
    multi_freqs_depth: int = 2
    freq_emb: float = 0.2
    emb_scale: float = 10.0
    emb_smooth: bool = True
    # Convolutions
    kernel_size: int = 8
    time_stride: int = 2
    stride: int = 4
    context: int = 1
    context_enc: int = 0
    # Normalization
    norm_starts: int = 4
    norm_groups: int = 4
    # DConv residual branch
    dconv_mode: int = 1
    dconv_depth: int = 2
    dconv_comp: float = 4.0
    dconv_attn: int = 4
    dconv_lstm: int = 4
    dconv_init: float = 1e-4
    # Weight init
    rescale: float = 0.1
    # Metadata
    samplerate: int = 44100
    segment: float = 40.0
    # Explicit jax matmul precision for the forward's convs/matmuls (e.g.
    # "tensorfloat32" = 3-pass bf16 MXU, "highest" = exact) — the knob the
    # presets ladder sets (demucs_tpu/presets.py). None = backend default.
    matmul_precision: tp.Optional[str] = None

    @property
    def hop_length(self) -> int:
        return self.nfft // 4


@functools.lru_cache(maxsize=None)
def layout(cfg: HDemucsConfig) -> hl.HybridLayout:
    return hl.build_hybrid_layout(
        sources=cfg.sources,
        audio_channels=cfg.audio_channels,
        channels=cfg.channels,
        channels_time=cfg.channels_time,
        growth=cfg.growth,
        nfft=cfg.nfft,
        cac=cfg.cac,
        depth=cfg.depth,
        rewrite=cfg.rewrite,
        kernel_size=cfg.kernel_size,
        time_stride=cfg.time_stride,
        stride=cfg.stride,
        context=cfg.context,
        context_enc=cfg.context_enc,
        norm_starts=cfg.norm_starts,
        norm_groups=cfg.norm_groups,
        dconv_mode=cfg.dconv_mode,
        dconv_depth=cfg.dconv_depth,
        dconv_comp=cfg.dconv_comp,
        dconv_init=cfg.dconv_init,
        dconv_lstm_start=cfg.dconv_lstm,
        dconv_attn_start=cfg.dconv_attn,
        freq_emb=cfg.freq_emb,
        hybrid=cfg.hybrid,
        multi_freqs=cfg.multi_freqs,
        multi_freqs_depth=cfg.multi_freqs_depth,
    )


def forward(
    params: dict,
    mix: jax.Array,
    cfg: HDemucsConfig,
    *,
    train: bool = False,
    rng: tp.Optional[jax.Array] = None,
) -> jax.Array:
    """``mix (B, C, L)`` -> stems ``(B, S, C, L)`` (hdemucs.py:689-794)."""
    import contextlib

    scope = (jax.default_matmul_precision(cfg.matmul_precision)
             if cfg.matmul_precision else contextlib.nullcontext())
    with scope:
        return _forward_body(params, mix, cfg, train=train, rng=rng)


def _forward_body(
    params: dict,
    mix: jax.Array,
    cfg: HDemucsConfig,
    *,
    train: bool,
    rng: tp.Optional[jax.Array],
) -> jax.Array:
    del rng
    lay = layout(cfg)
    length = mix.shape[-1]

    z = demucs_spec(mix, cfg.nfft, hybrid_old=cfg.hybrid_old) if cfg.hybrid else None
    if not cfg.hybrid:
        from demucs_tpu.ops.spec import stft

        z = stft(mix, cfg.nfft, cfg.hop_length)[..., :-1, :]
    mag = cac_pack(z) if cfg.cac else jnp.abs(z)
    x = mag
    B, C, Fq, T = x.shape

    mean = x.mean(axis=(1, 2, 3), keepdims=True)
    std = onn.std_unbiased(x, axis=(1, 2, 3))
    x = (x - mean) / (1e-5 + std)

    if cfg.hybrid:
        xt = mix
        meant = xt.mean(axis=(1, 2), keepdims=True)
        stdt = onn.std_unbiased(xt, axis=(1, 2))
        xt = (xt - meant) / (1e-5 + stdt)

    saved, saved_t, lengths, lengths_t = [], [], [], []
    for idx, espec in enumerate(lay.enc):
        lengths.append(x.shape[-1])
        inject = None
        if cfg.hybrid and idx < len(lay.tenc):
            lengths_t.append(xt.shape[-1])
            tspec = lay.tenc[idx]
            xt = hl.henc_forward(params["tencoder"][idx], tspec, xt)
            if not tspec.empty:
                saved_t.append(xt)
            else:
                inject = xt
        x = hl.henc_forward(params["encoder"][idx], espec, x, inject)
        if idx == 0 and lay.freq_emb_bins:
            frs = jnp.arange(x.shape[-2])
            emb = hl.scaled_embedding_forward(params["freq_emb"], frs, cfg.emb_scale)
            x = x + cfg.freq_emb * emb.T[None, :, :, None]
        saved.append(x)

    # Decoder input: zeros — signal flows through the skips (hdemucs.py:742-745).
    x = jnp.zeros_like(x)
    if cfg.hybrid:
        xt = jnp.zeros_like(x)

    for idx, dspec in enumerate(lay.dec):
        skip = saved.pop(-1)
        x, pre = hl.hdec_forward(params["decoder"][idx], dspec, x, skip, lengths.pop(-1))
        if cfg.hybrid:
            offset = cfg.depth - len(lay.tdec)
            if idx >= offset:
                tspec = lay.tdec[idx - offset]
                length_t = lengths_t.pop(-1)
                if tspec.empty:
                    assert pre.shape[2] == 1, pre.shape
                    pre = pre[:, :, 0]
                    xt, _ = hl.hdec_forward(params["tdecoder"][idx - offset], tspec,
                                            pre, None, length_t)
                else:
                    skip_t = saved_t.pop(-1)
                    xt, _ = hl.hdec_forward(params["tdecoder"][idx - offset], tspec,
                                            xt, skip_t, length_t)

    assert not saved and not saved_t and not lengths_t

    S = len(cfg.sources)
    x = x.reshape(B, S, -1, Fq, T)
    x = x * std[:, None] + mean[:, None]

    if cfg.cac:
        zout = cac_unpack(x)
    else:
        # Magnitude-mask output: phase from the mixture or Wiener EM
        # (hdemucs.py:644-687 / htdemucs.py:463-509).
        niters = cfg.end_iters if train else cfg.wiener_iters
        if niters < 0:
            zout = z[:, None] / (1e-8 + jnp.abs(z)[:, None]) * x
        else:
            from demucs_tpu.ops.wiener import apply_wiener

            zout = apply_wiener(x, z, niters, residual=cfg.wiener_residual)
    if cfg.hybrid:
        x = demucs_ispec(zout, length, hybrid_old=cfg.hybrid_old)
    else:
        # Non-hybrid: plain centered iSTFT after re-appending the Nyquist row
        # (hdemucs.py:614-631 else-branch).
        from demucs_tpu.ops.spec import istft

        zfull = jnp.pad(zout, [(0, 0)] * (zout.ndim - 2) + [(0, 1), (0, 0)])
        x = istft(zfull, cfg.nfft, cfg.hop_length, length=length)

    if cfg.hybrid:
        xt = xt.reshape(B, S, -1, length)
        xt = xt * stdt[:, None] + meant[:, None]
        x = xt + x
    return x


def init_hdemucs(cfg: HDemucsConfig, seed: int = 0) -> dict:
    """Random params (torch-equivalent distributions, incl. rescale trick)."""
    from demucs_tpu.models import initializers as I

    ini = I.Init(seed)
    lay = layout(cfg)
    params: dict = {
        "encoder": {i: I.init_enc(ini, s, cfg.rescale) for i, s in enumerate(lay.enc)},
        "decoder": {i: I.init_dec(ini, s, cfg.rescale) for i, s in enumerate(lay.dec)},
    }
    if cfg.hybrid:
        params["tencoder"] = {i: I.init_enc(ini, s, cfg.rescale) for i, s in enumerate(lay.tenc)}
        params["tdecoder"] = {i: I.init_dec(ini, s, cfg.rescale) for i, s in enumerate(lay.tdec)}
    if lay.freq_emb_bins:
        params["freq_emb"] = ini.embedding(
            lay.freq_emb_bins, lay.freq_emb_dim, smooth=cfg.emb_smooth, scale=cfg.emb_scale)
    return params
