"""Validation of the julius-equivalent sinc resampler (ops/resample.py).

Since julius itself is not installed, correctness is established by
first-principles properties: bandlimited signals survive a 1->2->1 round trip,
upsampling preserves the spectrum, and the torch oracle in tests/torchref.py
(used for Demucs-v2 parity) matches the JAX implementation exactly."""

import numpy as np

import jax.numpy as jnp

from demucs_tpu.ops.resample import resample_frac


def _bandlimited(L, sr=1.0, fmax=0.2, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(L) / sr
    x = np.zeros(L)
    for _ in range(12):
        f = rng.uniform(0.01, fmax)
        x += rng.standard_normal() * np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28))
    return (x / np.abs(x).max()).astype(np.float32)


def test_roundtrip_identity():
    x = _bandlimited(4096)[None, None]
    up = resample_frac(jnp.asarray(x), 1, 2)
    down = np.asarray(resample_frac(up, 2, 1))
    assert down.shape == x.shape
    # ignore filter-length edges
    err = np.abs(down[..., 64:-64] - x[..., 64:-64]).max()
    assert err < 1e-3, err


def test_upsample_shape_and_dc():
    x = jnp.ones((1, 1, 1000), jnp.float32)
    y = np.asarray(resample_frac(x, 1, 2))
    assert y.shape == (1, 1, 2000)
    # julius semantics: per-phase kernel renormalization + replicate padding
    # preserve a constant EXACTLY, including the edges (zero padding / the
    # analytic sr/old_sr scale would both break this)
    assert np.abs(y - 1.0).max() < 5e-6, np.abs(y - 1.0).max()


def test_fractional_ratio():
    x = _bandlimited(4410, fmax=0.1)[None]
    y = np.asarray(resample_frac(jnp.asarray(x), 44100, 16000))
    assert y.shape[-1] == 1600


def test_matches_torch_oracle():
    import torch

    from torchref import _install_stubs
    import sys

    _install_stubs()
    julius = sys.modules["julius"]
    x = _bandlimited(2048)[None, None]
    for old, new in [(1, 2), (2, 1), (44100, 16000), (3, 5)]:
        want = julius.resample_frac(torch.from_numpy(x), old, new).numpy()
        got = np.asarray(resample_frac(jnp.asarray(x), old, new))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
