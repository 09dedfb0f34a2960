"""Pallas STFT/iSTFT kernels (ops/pallas/stft.py): parity with the fft and
matmul methods, roundtrip, and the Demucs framing conventions on top.

Runs in interpret mode on CPU; the compiled Mosaic kernels are validated on
the real chip (BENCHMARKS.md: parity 4e-7 vs matmul, throughput at parity
with the XLA matmul-DFT path)."""

import numpy as np
import pytest

import jax.numpy as jnp

from demucs_tpu.ops import spec as S
from demucs_tpu.ops.pallas import stft as PS


@pytest.fixture(autouse=True)
def _interpret():
    old = PS._INTERPRET
    PS._INTERPRET = True
    yield
    PS._INTERPRET = old


@pytest.mark.parametrize("shape", [(1, 44100), (2, 3, 22050)])
def test_stft_pallas_matches_fft(shape):
    x = jnp.asarray((np.random.default_rng(0).standard_normal(shape) * 0.3
                     ).astype(np.float32))
    za = np.asarray(S.stft(x, 4096, 1024, method="fft"))
    zb = np.asarray(S.stft(x, 4096, 1024, method="pallas"))
    assert zb.shape == za.shape
    np.testing.assert_allclose(zb, za, atol=2e-6)


def test_istft_pallas_roundtrip():
    x = (np.random.default_rng(1).standard_normal((2, 44100)) * 0.3
         ).astype(np.float32)
    z = S.stft(jnp.asarray(x), 4096, 1024, method="pallas")
    y = np.asarray(S.istft(z, 4096, 1024, length=44100, method="pallas"))
    np.testing.assert_allclose(y, x, atol=3e-6)


def test_demucs_conventions_on_pallas():
    """demucs_spec/demucs_ispec (pad, Nyquist drop, frame trim) compose with
    the pallas method exactly as with fft."""
    x = jnp.asarray((np.random.default_rng(2).standard_normal((1, 2, 8192))
                     * 0.3).astype(np.float32))
    za = np.asarray(S.demucs_spec(x, 2048, method="fft"))
    zb = np.asarray(S.demucs_spec(x, 2048, method="pallas"))
    np.testing.assert_allclose(zb, za, atol=2e-6)
