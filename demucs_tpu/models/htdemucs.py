"""HTDemucs (v4): hybrid dual-branch U-Net + cross-domain transformer.

Behavioral reference: ``demucs/htdemucs.py:27-759``. Pure-functional:
``HTDemucsConfig`` (frozen, hashable — safe as a jit static arg) + a parameter
pytree whose structure mirrors the reference state-dict paths (see
``demucs_tpu.zoo.torch_load``).

The forward is a single traced program: STFT -> CaC -> dual encoder stacks ->
cross-transformer -> dual decoder stacks -> iSTFT + time branch. All shapes are
static; ``use_train_segment`` pins the processing length to the training
segment at trace time (htdemucs.py:511-537).
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
from demucs_tpu.models.transformer import TransformerSpec, crosstransformer_forward


@dataclasses.dataclass(frozen=True)
class HTDemucsConfig:
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
    depth: int = 4
    rewrite: bool = True
    # Frequency branch
    multi_freqs: tp.Tuple[float, ...] = ()
    multi_freqs_depth: int = 3
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
    dconv_comp: float = 8.0
    dconv_init: float = 1e-3
    # Before the transformer
    bottom_channels: int = 0
    # Transformer
    t_layers: int = 5
    t_emb: str = "sin"
    t_hidden_scale: float = 4.0
    t_heads: int = 8
    t_dropout: float = 0.0
    t_max_positions: int = 10000
    t_norm_in: bool = True
    t_norm_in_group: bool = False
    t_group_norm: bool = False
    t_norm_first: bool = True
    t_norm_out: bool = True
    t_max_period: float = 10000.0
    t_weight_decay: float = 0.0
    t_lr: tp.Optional[float] = None
    t_layer_scale: bool = True
    t_gelu: bool = True
    t_weight_pos_embed: float = 1.0
    t_sin_random_shift: int = 0
    t_cape_mean_normalize: bool = True
    t_cape_augment: bool = True
    t_cape_glob_loc_scale: tp.Tuple[float, float, float] = (5000.0, 1.0, 1.4)
    t_sparse_self_attn: bool = False
    t_sparse_cross_attn: bool = False
    t_mask_type: str = "diag"
    t_mask_random_seed: int = 42
    t_sparse_attn_window: int = 500
    t_global_window: int = 100
    t_sparsity: float = 0.95
    t_auto_sparsity: bool = False
    t_cross_first: bool = False
    # Weight init
    rescale: float = 0.1
    # Metadata
    samplerate: int = 44100
    segment: float = 10.0
    use_train_segment: bool = True
    # Fused Pallas attention kernel for the transformer (numerics-equivalent).
    t_flash_attn: bool = False
    # Compute dtype policy:
    #   "float32"  — exact parity (default).
    #   "bfloat16" — MXU-native bf16 activations/weights in every core stage
    #     (fp32 accumulation; STFT/iSTFT, normalization statistics and
    #     softmax stay fp32). Fastest (1.38x default); ~56 dB SER vs true
    #     fp32 because the core's activations are stored rounded — only
    #     ~3 dB below the default f32 path's own distance from true fp32
    #     (BENCHMARKS.md "Precision ladder").
    #   "mixed"    — fp32 activations/weights with precision HIGH
    #     ("tensorfloat32" = the 3-pass bf16 MXU algorithm on TPU) for every
    #     conv AND dot. Measured on v5e at released width
    #     (tools/precision_sweep.py): 82.5 dB SER vs true fp32 where the
    #     plain-f32 DEFAULT path (XLA lowers it to 1-pass bf16 MXU) sits at
    #     58.7 dB — i.e. "mixed" is MORE accurate than default f32, at ~73%
    #     of its speed. (The explicit dot algorithm BF16_BF16_F32_X3 covers
    #     dots only, leaving convs at 1-pass — measured no better than
    #     default; precision HIGH is the string that reaches convolutions.)
    compute_dtype: str = "float32"
    # Explicit per-stage bf16 set ("encoder"/"tencoder"/"transformer"/
    # "decoder"/"tdecoder") — overrides compute_dtype's stage policy when
    # non-empty (sensitivity sweeps, custom deployments).
    bf16_stages: tp.Tuple[str, ...] = ()
    # Explicit jax matmul precision / dot algorithm for the core's convs and
    # matmuls (e.g. "bfloat16", "BF16_BF16_F32_X3", "highest"); None = the
    # compute_dtype policy ("mixed" implies "tensorfloat32" = precision HIGH,
    # the string that reaches convolutions — see _matmul_precision below).
    matmul_precision: tp.Optional[str] = None
    # Per-stage precision overrides ((stage, precision), ...): each named
    # stage's convs/matmuls trace under that precision, others under
    # matmul_precision/compute_dtype policy. Since the freq/time branches'
    # encoders+decoders are convolutions and the transformer is dots, this
    # doubles as per-op-class precision control (tools/precision_sweep.py
    # attribution; the engineered quality ladder in BENCHMARKS.md).
    precision_stages: tp.Tuple[tp.Tuple[str, str], ...] = ()

    @property
    def hop_length(self) -> int:
        return self.nfft // 4

    @property
    def training_length(self) -> int:
        return int(self.segment * self.samplerate)


@functools.lru_cache(maxsize=None)
def layout(cfg: HTDemucsConfig) -> hl.HybridLayout:
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
        freq_emb=cfg.freq_emb,
        multi_freqs=cfg.multi_freqs,
        multi_freqs_depth=cfg.multi_freqs_depth,
    )


@functools.lru_cache(maxsize=None)
def transformer_spec(cfg: HTDemucsConfig) -> TransformerSpec:
    dim = cfg.bottom_channels or cfg.channels * cfg.growth ** (cfg.depth - 1)
    return TransformerSpec(
        dim=dim,
        num_layers=cfg.t_layers,
        num_heads=cfg.t_heads,
        hidden_scale=cfg.t_hidden_scale,
        cross_first=cfg.t_cross_first,
        emb=cfg.t_emb,
        norm_in=cfg.t_norm_in,
        norm_in_group=cfg.t_norm_in_group,
        group_norm=cfg.t_group_norm,
        norm_first=cfg.t_norm_first,
        norm_out=cfg.t_norm_out,
        max_period=cfg.t_max_period,
        layer_scale=cfg.t_layer_scale,
        gelu=cfg.t_gelu,
        weight_pos_embed=cfg.t_weight_pos_embed,
        sin_random_shift=cfg.t_sin_random_shift,
        cape_mean_normalize=cfg.t_cape_mean_normalize,
        cape_augment=cfg.t_cape_augment,
        cape_glob_loc_scale=cfg.t_cape_glob_loc_scale,
        sparse_self_attn=cfg.t_sparse_self_attn,
        sparse_cross_attn=cfg.t_sparse_cross_attn,
        mask_type=cfg.t_mask_type,
        mask_random_seed=cfg.t_mask_random_seed,
        sparse_attn_window=cfg.t_sparse_attn_window,
        global_window=cfg.t_global_window,
        sparsity=cfg.t_sparsity,
        auto_sparsity=cfg.t_auto_sparsity,
        flash_attn=cfg.t_flash_attn,
        dropout=cfg.t_dropout,
    )


_STAGES = ("encoder", "tencoder", "transformer", "decoder", "tdecoder")


def _bf16_stage_set(cfg: HTDemucsConfig) -> frozenset:
    """Which core stages run with bf16 activations/weights."""
    if cfg.bf16_stages:
        unknown = set(cfg.bf16_stages) - set(_STAGES)
        if unknown:
            raise ValueError(f"unknown bf16_stages {sorted(unknown)}")
        return frozenset(cfg.bf16_stages)
    if cfg.compute_dtype == "bfloat16":
        return frozenset(_STAGES)
    if cfg.compute_dtype in ("float32", "mixed"):
        return frozenset()
    raise ValueError(f"unknown compute_dtype {cfg.compute_dtype!r}")


def _matmul_precision(cfg: HTDemucsConfig) -> tp.Optional[str]:
    if cfg.matmul_precision:
        return cfg.matmul_precision
    if cfg.compute_dtype == "mixed":
        # precision HIGH: 3-pass bf16 on the MXU for convs AND dots (the
        # dot-algorithm strings don't reach convolutions, which dominate
        # the error — see the class attribute note and precision_sweep.py)
        return "tensorfloat32"
    return None


def _precision_scope(cfg: HTDemucsConfig):
    """Context manager applying the core's matmul precision policy (traced
    ops inherit it); DSP (STFT/iSTFT/Wiener) runs outside the scope."""
    import contextlib

    p = _matmul_precision(cfg)
    return jax.default_matmul_precision(p) if p else contextlib.nullcontext()


def _core(
    params: dict,
    cfg: HTDemucsConfig,
    mag: jax.Array,
    mix: jax.Array,
    *,
    train: bool,
    rng: tp.Optional[jax.Array],
) -> tp.Tuple[jax.Array, jax.Array]:
    """Encoder/transformer/decoder core (htdemucs.py:677-759, ``forward_core``).

    Args:
        mag: ``(B, C[*2 if cac], F, T)`` spectrogram-as-channels input.
        mix: ``(B, audio_channels, L)`` waveform.
    Returns:
        ``(spec_out (B, S, C_spec, F, T), time_out (B, S, C, L))`` pre-masking.
    """
    lay = layout(cfg)
    x = mag
    B, C, Fq, T = x.shape

    mean = x.mean(axis=(1, 2, 3), keepdims=True)
    std = onn.std_unbiased(x, axis=(1, 2, 3))
    x = (x - mean) / (1e-5 + std)

    xt = mix
    length = xt.shape[-1]
    meant = xt.mean(axis=(1, 2), keepdims=True)
    stdt = onn.std_unbiased(xt, axis=(1, 2))
    xt = (xt - meant) / (1e-5 + stdt)

    bf16 = _bf16_stage_set(cfg)
    prec_over = dict(cfg.precision_stages)
    if set(prec_over) - set(_STAGES):
        raise ValueError(
            f"unknown precision_stages {sorted(set(prec_over) - set(_STAGES))}")

    def stage_cast(name: str, a: jax.Array) -> jax.Array:
        return a.astype(jnp.bfloat16 if name in bf16 else jnp.float32)

    def stage_params(name: str, p):
        if name not in bf16:
            return p
        return jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            p)

    def stage_prec(name: str):
        import contextlib

        p = prec_over.get(name)
        return jax.default_matmul_precision(p) if p else contextlib.nullcontext()

    saved, saved_t, lengths, lengths_t = [], [], [], []
    for idx, spec_l in enumerate(lay.enc):
        lengths.append(x.shape[-1])
        inject = None
        if idx < len(lay.tenc):
            lengths_t.append(xt.shape[-1])
            tspec = lay.tenc[idx]
            xt = stage_cast("tencoder", xt)
            with stage_prec("tencoder"):
                xt = hl.henc_forward(
                    stage_params("tencoder", params["tencoder"][idx]), tspec, xt)
            if not tspec.empty:
                saved_t.append(xt)
            else:
                inject = xt
        x = stage_cast("encoder", x)
        if inject is not None:
            inject = stage_cast("encoder", inject)
        with stage_prec("encoder"):
            x = hl.henc_forward(
                stage_params("encoder", params["encoder"][idx]), spec_l, x,
                inject)
        if idx == 0 and lay.freq_emb_bins:
            frs = jnp.arange(x.shape[-2])
            emb = hl.scaled_embedding_forward(
                stage_params("encoder", params["freq_emb"]), frs, cfg.emb_scale)
            x = x + cfg.freq_emb * emb.T[None, :, :, None].astype(x.dtype)
        saved.append(x)

    if cfg.t_layers > 0:
        x = stage_cast("transformer", x)
        xt = stage_cast("transformer", xt)
        with stage_prec("transformer"):
            if cfg.bottom_channels:
                up = stage_params("transformer", params["channel_upsampler"])
                up_t = stage_params("transformer",
                                    params["channel_upsampler_t"])
                b, c, f, t = x.shape
                x = x.reshape(b, c, f * t)
                x = onn.conv1d(x, up["weight"], up["bias"])
                x = x.reshape(b, -1, f, t)
                xt = onn.conv1d(xt, up_t["weight"], up_t["bias"])
            x, xt = crosstransformer_forward(
                stage_params("transformer", params["crosstransformer"]),
                transformer_spec(cfg), x, xt,
                train=train, rng=rng,
            )
            if cfg.bottom_channels:
                down = stage_params("transformer",
                                    params["channel_downsampler"])
                down_t = stage_params("transformer",
                                      params["channel_downsampler_t"])
                b, c, f, t = x.shape
                x = x.reshape(b, c, f * t)
                x = onn.conv1d(x, down["weight"], down["bias"])
                x = x.reshape(b, -1, f, t)
                xt = onn.conv1d(xt, down_t["weight"], down_t["bias"])

    x = stage_cast("decoder", x)
    xt = stage_cast("tdecoder", xt)
    for idx, dspec in enumerate(lay.dec):
        skip = stage_cast("decoder", saved.pop(-1))
        with stage_prec("decoder"):
            x, pre = hl.hdec_forward(
                stage_params("decoder", params["decoder"][idx]), dspec, x,
                skip, lengths.pop(-1))
        offset = cfg.depth - len(lay.tdec)
        if idx >= offset:
            tspec = lay.tdec[idx - offset]
            length_t = lengths_t.pop(-1)
            tdec_params = stage_params(
                "tdecoder", params["tdecoder"][idx - offset])
            with stage_prec("tdecoder"):
                if tspec.empty:
                    assert pre.shape[2] == 1, pre.shape
                    pre = stage_cast("tdecoder", pre[:, :, 0])
                    xt, _ = hl.hdec_forward(tdec_params, tspec, pre, None,
                                            length_t)
                else:
                    skip_t = stage_cast("tdecoder", saved_t.pop(-1))
                    xt, _ = hl.hdec_forward(tdec_params, tspec, xt, skip_t,
                                            length_t)

    assert not saved and not saved_t and not lengths_t

    S = len(cfg.sources)
    x = x.astype(jnp.float32).reshape(B, S, -1, Fq, T)
    x = x * std[:, None] + mean[:, None]
    xt = xt.astype(jnp.float32).reshape(B, S, -1, length)
    xt = xt * stdt[:, None] + meant[:, None]
    return x, xt


def forward_core(
    params: dict,
    mag: jax.Array,
    mix: jax.Array,
    cfg: HTDemucsConfig,
) -> tp.Tuple[jax.Array, jax.Array]:
    """Export-boundary core (htdemucs.py:662-759): precomputed mag + mix in,
    (spec_out, time_out) before masking/iSTFT out."""
    with _precision_scope(cfg):
        return _core(params, cfg, mag, mix, train=False, rng=None)


def forward(
    params: dict,
    mix: jax.Array,
    cfg: HTDemucsConfig,
    *,
    train: bool = False,
    rng: tp.Optional[jax.Array] = None,
) -> jax.Array:
    """Full forward: ``mix (B, C, L)`` -> stems ``(B, S, C, L)``.

    Behavioral reference: htdemucs.py:527-660. In eval mode with
    ``use_train_segment`` the input is right-zero-padded to the training
    segment (static at trace time) and the output cropped back.
    """
    length = mix.shape[-1]
    length_pre_pad = None
    if cfg.use_train_segment and not train:
        training_length = cfg.training_length
        if length < training_length:
            length_pre_pad = length
            mix = jnp.pad(mix, [(0, 0), (0, 0), (0, training_length - length)])
        elif length > training_length:
            raise ValueError(
                f"Input length {length} exceeds training length {training_length}"
            )
    z = demucs_spec(mix, cfg.nfft)
    mag = cac_pack(z) if cfg.cac else jnp.abs(z)

    with _precision_scope(cfg):
        x, xt = _core(params, cfg, mag, mix, train=train, rng=rng)

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
    x = demucs_ispec(zout, mix.shape[-1])
    out = xt + x
    if length_pre_pad:
        out = out[..., :length_pre_pad]
    return out


# ---------------------------------------------------------------------------
# Random initialization
# ---------------------------------------------------------------------------


def init_htdemucs(cfg: HTDemucsConfig, seed: int = 0) -> dict:
    """Random params with torch-equivalent init distributions + rescale trick."""
    from demucs_tpu.models import initializers as I

    ini = I.Init(seed)
    lay = layout(cfg)
    params: dict = {
        "encoder": {i: I.init_enc(ini, s, cfg.rescale) for i, s in enumerate(lay.enc)},
        "tencoder": {i: I.init_enc(ini, s, cfg.rescale) for i, s in enumerate(lay.tenc)},
        "decoder": {i: I.init_dec(ini, s, cfg.rescale) for i, s in enumerate(lay.dec)},
        "tdecoder": {i: I.init_dec(ini, s, cfg.rescale) for i, s in enumerate(lay.tdec)},
    }
    if lay.freq_emb_bins:
        params["freq_emb"] = ini.embedding(
            lay.freq_emb_bins, lay.freq_emb_dim, smooth=cfg.emb_smooth, scale=cfg.emb_scale)
    if cfg.bottom_channels:
        tc = cfg.channels * cfg.growth ** (cfg.depth - 1)
        params["channel_upsampler"] = ini.conv((cfg.bottom_channels, tc, 1))
        params["channel_downsampler"] = ini.conv((tc, cfg.bottom_channels, 1))
        params["channel_upsampler_t"] = ini.conv((cfg.bottom_channels, tc, 1))
        params["channel_downsampler_t"] = ini.conv((tc, cfg.bottom_channels, 1))
    if cfg.t_layers > 0:
        params["crosstransformer"] = I.init_transformer(ini, transformer_spec(cfg))
    return params
