"""STFT/iSTFT parity vs torch + Demucs framing conventions.

Covers the hard-parts called out in SURVEY.md §7: reflect-pad + normalized
Hann + Nyquist-drop + frame-trim must match the reference closely or SDR
parity fails downstream.
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp
import torch

from demucs_tpu.ops import spec as jspec


def _torch_spectro(x: torch.Tensor, n_fft: int, hop: int) -> torch.Tensor:
    # Reference behavior: demucs/spec.py:11-27.
    *other, length = x.shape
    x = x.reshape(-1, length)
    z = torch.stft(
        x,
        n_fft,
        hop,
        window=torch.hann_window(n_fft).to(x),
        win_length=n_fft,
        normalized=True,
        center=True,
        return_complex=True,
        pad_mode="reflect",
    )
    _, freqs, frames = z.shape
    return z.view(*other, freqs, frames)


def _torch_ispectro(z: torch.Tensor, hop: int, length=None) -> torch.Tensor:
    # Reference behavior: demucs/spec.py:30-47.
    *other, freqs, frames = z.shape
    n_fft = 2 * freqs - 2
    z = z.view(-1, freqs, frames)
    x = torch.istft(
        z,
        n_fft,
        hop,
        window=torch.hann_window(n_fft).to(z.real),
        win_length=n_fft,
        normalized=True,
        length=length,
        center=True,
    )
    _, length = x.shape
    return x.view(*other, length)


@pytest.mark.parametrize("n_fft,hop,L", [(512, 128, 4410), (4096, 1024, 44100), (64, 16, 300)])
def test_stft_matches_torch(n_fft, hop, L):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 2, L)).astype(np.float32)
    zt = _torch_spectro(torch.from_numpy(x), n_fft, hop).numpy()
    zj = np.asarray(jspec.stft(jnp.asarray(x), n_fft, hop))
    assert zj.shape == zt.shape
    np.testing.assert_allclose(zj, zt, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("n_fft,hop,L", [(512, 128, 4410), (4096, 1024, 44100)])
def test_istft_matches_torch(n_fft, hop, L):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, L)).astype(np.float32)
    z = _torch_spectro(torch.from_numpy(x), n_fft, hop)
    yt = _torch_ispectro(z, hop, length=L).numpy()
    yj = np.asarray(jspec.istft(jnp.asarray(z.numpy()), n_fft, hop, length=L))
    np.testing.assert_allclose(yj, yt, atol=2e-5, rtol=1e-4)
    # round trip is identity
    np.testing.assert_allclose(yj, x, atol=1e-4, rtol=1e-4)


def test_istft_default_length_matches_torch():
    """length=None must reproduce torch.istft's default output length (the
    center pad trimmed on BOTH ends — a left-only trim leaves n_fft//2
    trailing window-tapered samples)."""
    n_fft, hop, L = 512, 128, 4410
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, L)).astype(np.float32)
    z = _torch_spectro(torch.from_numpy(x), n_fft, hop)
    yt = torch.istft(
        z.reshape(-1, *z.shape[-2:]), n_fft, hop,
        window=torch.hann_window(n_fft), normalized=True, center=True,
    ).reshape(2, -1).numpy()
    yj = np.asarray(jspec.istft(jnp.asarray(z.numpy()), n_fft, hop))
    assert yj.shape == yt.shape, (yj.shape, yt.shape)
    np.testing.assert_allclose(yj, yt, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("L", [44100, 343980, 1000])
def test_demucs_spec_shapes_and_parity(L):
    """demucs _spec convention: z has exactly (nfft//2, ceil(L/hop)) cells."""
    nfft, hop = 4096, 1024
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 2, L)).astype(np.float32)
    le = math.ceil(L / hop)

    # torch replica of demucs/htdemucs.py:420-440
    xt = torch.from_numpy(x)
    pad = hop // 2 * 3
    padded = _torch_pad1d(xt, (pad, pad + le * hop - L))
    zt = _torch_spectro(padded, nfft, hop)[..., :-1, :]
    zt = zt[..., 2 : 2 + le].numpy()

    zj = np.asarray(jspec.demucs_spec(jnp.asarray(x), nfft))
    assert zj.shape == (1, 2, nfft // 2, le)
    np.testing.assert_allclose(zj, zt, atol=3e-5, rtol=1e-4)


def _torch_pad1d(x, paddings, mode="reflect", value=0.0):
    # Reference behavior: demucs/hdemucs.py:23-40.
    import torch.nn.functional as F

    length = x.shape[-1]
    padding_left, padding_right = paddings
    if mode == "reflect":
        max_pad = max(padding_left, padding_right)
        if length <= max_pad:
            extra_pad = max_pad - length + 1
            extra_pad_right = min(padding_right, extra_pad)
            extra_pad_left = extra_pad - extra_pad_right
            paddings = (padding_left - extra_pad_left, padding_right - extra_pad_right)
            x = F.pad(x, (extra_pad_left, extra_pad_right))
    return F.pad(x, paddings, mode, value)


@pytest.mark.parametrize("L", [44100, 343980])
def test_demucs_ispec_parity(L):
    """demucs_ispec matches the torch replica of htdemucs.py:442-450.

    Note the reference's own spec->ispec roundtrip is NOT identity (the
    Nyquist row is dropped and 2 edge frames are zero-refilled), so we compare
    against the torch pipeline, not the input.
    """
    import torch.nn.functional as F

    nfft, hop = 4096, 1024
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 2, L)).astype(np.float32)
    z = jspec.demucs_spec(jnp.asarray(x), nfft)
    y = np.asarray(jspec.demucs_ispec(z, L))
    assert y.shape == x.shape

    zt = torch.from_numpy(np.asarray(z))
    z2 = F.pad(zt, (0, 0, 0, 1))
    z2 = F.pad(z2, (2, 2))
    pad = hop // 2 * 3
    le = hop * math.ceil(L / hop) + 2 * pad
    yt = _torch_ispectro(z2, hop, length=le)[..., pad : pad + L].numpy()
    np.testing.assert_allclose(y, yt, atol=1e-4, rtol=1e-4)

    # Away from the edges, the roundtrip reconstructs the input up to the
    # (tiny for real audio) Nyquist-bin content.
    mid = slice(8192, -8192)
    err = np.abs(y[..., mid] - x[..., mid]).max()
    assert err < 0.1, err


def test_pad1d_short_input_reflect():
    """Reflect pad bigger than the signal inserts zeros first (hdemucs.py:23-40)."""
    x = np.array([[1.0, 2.0, 3.0]], dtype=np.float32)
    got = np.asarray(jspec.pad1d(jnp.asarray(x), (5, 5), mode="reflect"))
    want = _torch_pad1d(torch.from_numpy(x), (5, 5)).numpy()
    np.testing.assert_allclose(got, want)


def test_cac_roundtrip_and_layout():
    rng = np.random.default_rng(4)
    z = (rng.standard_normal((2, 2, 8, 5)) + 1j * rng.standard_normal((2, 2, 8, 5))).astype(
        np.complex64
    )
    m = jspec.cac_pack(jnp.asarray(z))
    assert m.shape == (2, 4, 8, 5)
    # channel order: [c0_re, c0_im, c1_re, c1_im] (htdemucs.py:452-461)
    np.testing.assert_allclose(np.asarray(m)[:, 0], z.real[:, 0])
    np.testing.assert_allclose(np.asarray(m)[:, 1], z.imag[:, 0])
    np.testing.assert_allclose(np.asarray(m)[:, 2], z.real[:, 1])
    # unpack of source-stacked mask
    stacked = jnp.stack([m, 2 * m], axis=1)  # (B, S=2, 2C, F, T)
    zz = np.asarray(jspec.cac_unpack(stacked))
    np.testing.assert_allclose(zz[:, 0], z, atol=1e-6)
    np.testing.assert_allclose(zz[:, 1], 2 * z, atol=1e-6)


def test_matmul_dft_matches_fft():
    """MXU-path DFT matmuls reproduce the FFT STFT/iSTFT exactly."""
    rng = np.random.default_rng(9)
    x = rng.standard_normal((2, 2, 8000)).astype(np.float32)
    for n_fft, hop in [(512, 128), (4096, 1024)]:
        z_fft = np.asarray(jspec.stft(jnp.asarray(x), n_fft, hop, method="fft"))
        z_mm = np.asarray(jspec.stft(jnp.asarray(x), n_fft, hop, method="matmul"))
        np.testing.assert_allclose(z_mm, z_fft, atol=3e-5, rtol=1e-4)
        y_fft = np.asarray(jspec.istft(jnp.asarray(z_fft), n_fft, hop, length=8000,
                                       method="fft"))
        y_mm = np.asarray(jspec.istft(jnp.asarray(z_fft), n_fft, hop, length=8000,
                                      method="matmul"))
        np.testing.assert_allclose(y_mm, y_fft, atol=3e-5, rtol=1e-4)
