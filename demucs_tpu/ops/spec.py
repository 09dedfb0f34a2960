"""STFT / iSTFT with the Demucs framing conventions, TPU-first.

Behavioral reference: ``demucs/spec.py:11-47`` (torch.stft wrapper, normalized,
centered, Hann window, hop = n_fft // 4) and the Demucs pad/trim conventions in
``demucs/htdemucs.py:420-450`` / ``demucs/hdemucs.py:587-631``.

Design notes (TPU):

- Framing is expressed as *pure slicing* when ``n_fft % hop == 0`` (always the
  case here: hop = n_fft/4): the padded signal is reshaped into hop-sized
  chunks and each analysis frame is the concatenation of 4 consecutive chunks.
  This avoids a gather, so XLA lowers it to cheap dynamic-slice + concat and can
  fuse the windowing multiply.
- The FFT itself uses ``jnp.fft.rfft``/``irfft`` which XLA lowers to the TPU
  FFT implementation. A Pallas matmul-DFT kernel (MXU-friendly for the 4096-bin
  case) can be swapped in behind the same interface.
- Overlap-add in the iSTFT is likewise expressed as 4 shifted slice-adds
  instead of a scatter.

All functions are shape-polymorphic in leading (batch/channel) dims and jit
friendly: every length computation happens at trace time from static shapes.
"""

from __future__ import annotations

import functools
import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "hann_window",
    "stft",
    "istft",
    "pad1d",
    "demucs_spec",
    "demucs_ispec",
    "cac_pack",
    "cac_unpack",
]


@functools.lru_cache(maxsize=None)
def _hann_np(n: int) -> np.ndarray:
    # Periodic Hann window (torch.hann_window default periodic=True).
    t = np.arange(n, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * t / n)).astype(np.float32)


def hann_window(n: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window of length ``n``."""
    return jnp.asarray(_hann_np(n), dtype=dtype)


def _frame(x: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Slice ``x (..., L)`` into overlapping frames ``(..., n_frames, n_fft)``.

    Requires ``(L - n_fft) % hop == 0`` handling via floor like torch:
    n_frames = 1 + (L - n_fft) // hop; trailing remainder samples are dropped.
    """
    L = x.shape[-1]
    n_frames = 1 + (L - n_fft) // hop
    if n_fft % hop == 0:
        ratio = n_fft // hop
        n_chunks = L // hop
        y = x[..., : n_chunks * hop].reshape(*x.shape[:-1], n_chunks, hop)
        # frame t = chunks [t, t+ratio); all shifts are static slices.
        parts = [y[..., j : j + n_frames, :] for j in range(ratio)]
        return jnp.concatenate(parts, axis=-1)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return x[..., idx]


# STFT/iSTFT inner transform: "fft" = jnp.fft (XLA butterfly, VPU-bound on
# TPU), "matmul" = dense DFT basis matmuls (MXU path; the framed DFT is a
# (frames, n_fft) @ (n_fft, freqs) contraction), or "pallas" = the fused
# Pallas kernel (ops/pallas/stft.py — same chunk-matmul math in one
# VMEM-resident pass; the BASELINE north star's STFT-as-TPU-kernel, measured
# at parity with the XLA matmul path on v5e). None = resolve lazily: matmul
# on accelerators (+15% full-forward throughput over fft on v5e), fft on CPU
# where the dense basis loses. Set to "fft"/"matmul"/"pallas" to pin.
DEFAULT_METHOD: tp.Optional[str] = None


def _default_method() -> str:
    if DEFAULT_METHOD is not None:
        return DEFAULT_METHOD
    try:
        import jax

        # jax_default_device may pin CPU while an accelerator plugin owns
        # jax.default_backend() (this deployment's TPU plugin ignores
        # JAX_PLATFORMS) — decide by where compute actually runs.
        default = jax.config.jax_default_device
        platform = (default.platform if default is not None
                    else jax.default_backend())
        return "matmul" if platform != "cpu" else "fft"
    except Exception:
        return "fft"


@functools.lru_cache(maxsize=None)
def _rdft_basis_np(n_fft: int) -> tuple:
    eye = np.eye(n_fft, dtype=np.float64)
    F = np.fft.rfft(eye, axis=-1)  # (n_fft, freqs)
    return F.real.astype(np.float32), F.imag.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _irdft_basis_np(n_fft: int) -> tuple:
    freqs = n_fft // 2 + 1
    eye = np.eye(freqs, dtype=np.float64)
    Mr = np.fft.irfft(eye, n=n_fft, axis=-1)  # irfft of real unit vectors
    Mi = np.fft.irfft(1j * eye, n=n_fft, axis=-1)
    return Mr.astype(np.float32), Mi.astype(np.float32)


def stft(
    x: jax.Array,
    n_fft: int,
    hop: int,
    *,
    normalized: bool = True,
    center: bool = True,
    method: tp.Optional[str] = None,
) -> jax.Array:
    """Complex STFT matching ``torch.stft(..., window=hann, pad_mode='reflect')``.

    Args:
        x: real signal ``(..., L)``.
    Returns:
        complex64 ``(..., n_fft // 2 + 1, n_frames)``.
    """
    method = method or _default_method()
    dtype = x.dtype
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    if method == "pallas" and n_fft % hop == 0:
        # Pallas fused kernel — same chunk-matmul DFT math, one VMEM-resident
        # pass per (frame-block, freq-block) cell (ops/pallas/stft.py).
        from demucs_tpu.ops.pallas.stft import stft_chunk_dft

        L = x.shape[-1]
        lead = x.shape[:-1]
        n_chunks = L // hop
        y = x[..., : n_chunks * hop].reshape(-1, n_chunks, hop)
        zr, zi = stft_chunk_dft(y.astype(jnp.float32), n_fft, hop)
        z = jax.lax.complex(zr, zi).reshape(*lead, zr.shape[-2], zr.shape[-1])
    elif method == "matmul" and n_fft % hop == 0:
        # Fused chunk-matmul DFT: never materialize the overlapped frames.
        # With r = n_fft/hop, frame t = chunks [t, t+r), so
        # Z[t] = sum_j chunks[t+j] @ G_j with G_j the windowed DFT basis rows
        # for chunk j — r shifted matmuls straight onto the MXU.
        r = n_fft // hop
        L = x.shape[-1]
        n_frames = 1 + (L - n_fft) // hop
        n_chunks = L // hop
        y = x[..., : n_chunks * hop].reshape(*x.shape[:-1], n_chunks, hop)
        Fr, Fi = _rdft_basis_np(n_fft)
        win_np = _hann_np(n_fft)[:, None].astype(np.float64)
        zr = zi = 0.0
        for j in range(r):
            Gr = jnp.asarray((win_np * Fr)[j * hop : (j + 1) * hop].astype(np.float32))
            Gi = jnp.asarray((win_np * Fi)[j * hop : (j + 1) * hop].astype(np.float32))
            yj = y[..., j : j + n_frames, :]
            zr = zr + jnp.matmul(yj, Gr, preferred_element_type=jnp.float32)
            zi = zi + jnp.matmul(yj, Gi, preferred_element_type=jnp.float32)
        z = jax.lax.complex(zr, zi)
    else:
        frames = _frame(x, n_fft, hop)
        win = hann_window(n_fft, dtype=dtype)
        fw = frames * win
        if method == "matmul":
            Fr, Fi = _rdft_basis_np(n_fft)
            zr = jnp.matmul(fw, jnp.asarray(Fr), preferred_element_type=jnp.float32)
            zi = jnp.matmul(fw, jnp.asarray(Fi), preferred_element_type=jnp.float32)
            z = jax.lax.complex(zr, zi)
        else:
            z = jnp.fft.rfft(fw, axis=-1)
    if normalized:
        z = z * jnp.asarray(1.0 / math.sqrt(n_fft), dtype=dtype)
    return jnp.swapaxes(z, -1, -2)


def _overlap_add(frames: jax.Array, hop: int) -> jax.Array:
    """Overlap-add frames ``(..., n_frames, n_fft)`` at stride ``hop``.

    Output length = (n_frames - 1) * hop + n_fft. Uses shifted slice-adds
    (no scatter) when n_fft % hop == 0.
    """
    *lead, n_frames, n_fft = frames.shape
    out_len = (n_frames - 1) * hop + n_fft
    if n_fft % hop == 0:
        ratio = n_fft // hop
        # Split each frame into `ratio` hop-chunks; chunk j of frame t lands on
        # output chunk t + j. Accumulate per-j contributions with zero padding.
        chunks = frames.reshape(*lead, n_frames, ratio, hop)
        n_out_chunks = n_frames - 1 + ratio
        out = jnp.zeros((*lead, n_out_chunks, hop), dtype=frames.dtype)
        for j in range(ratio):
            contrib = chunks[..., :, j, :]
            pad_cfg = [(0, 0)] * len(lead) + [(j, n_out_chunks - n_frames - j), (0, 0)]
            out = out + jnp.pad(contrib, pad_cfg)
        return out.reshape(*lead, out_len)
    out = jnp.zeros((*lead, out_len), dtype=frames.dtype)
    for t in range(n_frames):
        out = out.at[..., t * hop : t * hop + n_fft].add(frames[..., t, :])
    return out


@functools.lru_cache(maxsize=None)
def _window_envelope_np(n_fft: int, hop: int, n_frames: int) -> np.ndarray:
    """Sum of squared windows at every output sample (torch.istft denominator)."""
    win = _hann_np(n_fft).astype(np.float64)
    out_len = (n_frames - 1) * hop + n_fft
    env = np.zeros(out_len)
    w2 = win**2
    for t in range(n_frames):
        env[t * hop : t * hop + n_fft] += w2
    return env.astype(np.float32)


def istft(
    z: jax.Array,
    n_fft: int,
    hop: int,
    *,
    length: int | None = None,
    normalized: bool = True,
    center: bool = True,
    method: tp.Optional[str] = None,
) -> jax.Array:
    """Inverse STFT matching ``torch.istft`` (hann window, centered).

    Args:
        z: complex ``(..., n_fft // 2 + 1, n_frames)``.
    Returns:
        real ``(..., length)`` (with ``length=None``: the torch.istft
        default length, i.e. the OLA output minus the center pad on both
        ends).
    """
    method = method or _default_method()
    n_frames = z.shape[-1]
    zt = jnp.swapaxes(z, -1, -2)  # (..., n_frames, freqs)
    if normalized:
        zt = zt * math.sqrt(n_fft)
    if method == "pallas" and n_fft % hop == 0:
        from demucs_tpu.ops.pallas.stft import istft_chunk_dft

        lead = zt.shape[:-2]
        freqs = zt.shape[-1]
        zf = zt.reshape(-1, n_frames, freqs)
        y = istft_chunk_dft(zf.real.astype(jnp.float32),
                            zf.imag.astype(jnp.float32), n_fft, hop)
        y = y.reshape(*lead, y.shape[-1])
    elif method == "matmul" and n_fft % hop == 0:
        # Fused matmul iDFT + overlap-add: out_chunk[c] = sum_j Z[c-j] @ M_j
        # with M_j the windowed inverse-basis columns for chunk j. Shifted
        # matmul accumulation — the windowed frames are never materialized.
        r = n_fft // hop
        n_out_chunks = n_frames - 1 + r
        Mr, Mi = _irdft_basis_np(n_fft)
        win_np = _hann_np(n_fft)[None, :].astype(np.float64)
        lead = zt.shape[:-2]
        y = jnp.zeros((*lead, n_out_chunks, hop), jnp.float32)
        zre, zim = zt.real, zt.imag
        for j in range(r):
            Mrj = jnp.asarray((Mr * win_np)[:, j * hop : (j + 1) * hop].astype(np.float32))
            Mij = jnp.asarray((Mi * win_np)[:, j * hop : (j + 1) * hop].astype(np.float32))
            contrib = (
                jnp.matmul(zre, Mrj, preferred_element_type=jnp.float32)
                + jnp.matmul(zim, Mij, preferred_element_type=jnp.float32)
            )
            pad_cfg = [(0, 0)] * len(lead) + [(j, n_out_chunks - n_frames - j), (0, 0)]
            y = y + jnp.pad(contrib, pad_cfg)
        y = y.reshape(*lead, n_out_chunks * hop)
    else:
        if method == "matmul":
            Mr, Mi = _irdft_basis_np(n_fft)
            frames = (
                jnp.matmul(zt.real, jnp.asarray(Mr), preferred_element_type=jnp.float32)
                + jnp.matmul(zt.imag, jnp.asarray(Mi), preferred_element_type=jnp.float32)
            )
        else:
            frames = jnp.fft.irfft(zt, n=n_fft, axis=-1)
        win = hann_window(n_fft, dtype=frames.dtype)
        y = _overlap_add(frames * win, hop)
    env = jnp.asarray(_window_envelope_np(n_fft, hop, n_frames))
    y = y / jnp.maximum(env, 1e-11)
    if center:
        pad = n_fft // 2
        if length is not None:
            y = y[..., pad : pad + length]
        else:
            # torch.istft(center=True, length=None) trims the center pad on
            # BOTH ends (y[pad:-pad]), not just the left
            y = y[..., pad : y.shape[-1] - pad]
    elif length is not None:
        y = y[..., :length]
    return y


def pad1d(
    x: jax.Array,
    paddings: tuple[int, int],
    mode: str = "constant",
    value: float = 0.0,
) -> jax.Array:
    """1-D pad on the last axis; reflect-pad stays valid for short inputs.

    Mirrors ``demucs/hdemucs.py:23-40``: when reflect padding is requested and
    the signal is shorter than the max pad, zeros are inserted first so the
    reflection is well defined. All arithmetic is static (trace-time).
    """
    length = x.shape[-1]
    padding_left, padding_right = paddings
    lead = [(0, 0)] * (x.ndim - 1)
    if mode == "reflect":
        max_pad = max(padding_left, padding_right)
        if length <= max_pad:
            extra_pad = max_pad - length + 1
            extra_pad_right = min(padding_right, extra_pad)
            extra_pad_left = extra_pad - extra_pad_right
            paddings = (padding_left - extra_pad_left, padding_right - extra_pad_right)
            x = jnp.pad(x, lead + [(extra_pad_left, extra_pad_right)])
        return jnp.pad(x, lead + [list(paddings)], mode="reflect")
    return jnp.pad(x, lead + [(padding_left, padding_right)], constant_values=value)


def demucs_spec(x: jax.Array, nfft: int, *, hybrid_old: bool = False,
                method: tp.Optional[str] = None) -> jax.Array:
    """Demucs-convention spectrogram of ``x (..., L)``.

    Pads so frames == ceil(L / hop) (kernel-style 'same' behavior), drops the
    Nyquist row, trims 2 frames on each side. Behavioral reference:
    ``demucs/htdemucs.py:420-440``. Returns complex ``(..., nfft//2, le)``.
    """
    hop = nfft // 4
    le = int(math.ceil(x.shape[-1] / hop))
    pad = hop // 2 * 3
    mode = "constant" if hybrid_old else "reflect"
    x = pad1d(x, (pad, pad + le * hop - x.shape[-1]), mode=mode)
    z = stft(x, nfft, hop, method=method)[..., :-1, :]
    assert z.shape[-1] == le + 4, (z.shape, le)
    return z[..., 2 : 2 + le]


def demucs_ispec(z: jax.Array, length: int, *, hybrid_old: bool = False,
                 method: tp.Optional[str] = None) -> jax.Array:
    """Inverse of :func:`demucs_spec` cropped to ``length``.

    Re-appends the Nyquist row, re-pads 2 frames each side, and inverts with
    the centered iSTFT. Behavioral reference: ``demucs/htdemucs.py:442-450``.
    """
    hop = 2 * z.shape[-2] // 4  # n_fft = 2 * freqs(+nyquist) - 2 = 2 * freqs
    lead = [(0, 0)] * (z.ndim - 2)
    z = jnp.pad(z, lead + [(0, 1), (2, 2)])
    pad = hop // 2 * 3
    if hybrid_old:
        le = hop * int(math.ceil(length / hop))
        x = istft(z, 4 * hop, hop, length=le, method=method)
        return x[..., :length]
    le = hop * int(math.ceil(length / hop)) + 2 * pad
    x = istft(z, 4 * hop, hop, length=le, method=method)
    return x[..., pad : pad + length]


def cac_pack(z: jax.Array) -> jax.Array:
    """Complex-as-channels: ``(B, C, F, T)`` complex -> ``(B, 2C, F, T)`` real.

    Channel order [c0_re, c0_im, c1_re, c1_im, ...] matching
    ``demucs/htdemucs.py:452-461`` (view_as_real + permute + reshape).
    """
    B, C, Fq, T = z.shape
    m = jnp.stack([z.real, z.imag], axis=2)  # (B, C, 2, F, T)
    return m.reshape(B, C * 2, Fq, T)


def cac_unpack(m: jax.Array) -> jax.Array:
    """Inverse of :func:`cac_pack` over source-stacked output.

    ``(B, S, 2C, F, T)`` real -> ``(B, S, C, F, T)`` complex
    (``demucs/htdemucs.py:463-471``).
    """
    B, S, C2, Fq, T = m.shape
    m = m.reshape(B, S, C2 // 2, 2, Fq, T)
    return jax.lax.complex(m[:, :, :, 0], m[:, :, :, 1])
