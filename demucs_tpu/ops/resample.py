"""Bandlimited sinc resampling (julius-equivalent) in JAX.

Implements the standard windowed-sinc polyphase resampler (J.O. Smith,
"Digital Audio Resampling Home Page") with a Hann^2 window — the same
formulation as the ``julius.resample_frac`` dependency the reference uses for
the Demucs-v2 2x up/down sampling (``demucs/demucs.py:416,432``) and data-side
rate conversion (``demucs/audio.py:169-172``).

The kernel bank is precomputed host-side (static in old_sr/new_sr) and applied
as one strided conv — MXU-friendly, no gathers.
"""

from __future__ import annotations

import functools
import math
from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resample_frac"]


@functools.lru_cache(maxsize=None)
def _kernels_np(old_sr: int, new_sr: int, zeros: int, rolloff: float):
    sr = min(new_sr, old_sr) * rolloff
    width = math.ceil(zeros * old_sr / sr)
    idx = np.arange(-width, width + old_sr, dtype=np.float64)
    kernels = []
    for i in range(new_sr):
        t = (-i / new_sr + idx / old_sr) * sr
        t = np.clip(t, -zeros, zeros)
        window = np.cos(t / zeros / 2 * math.pi) ** 2
        t = t * math.pi
        kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t)) * window
        # julius renormalizes each phase kernel by its own sum so a constant
        # signal is preserved exactly (no per-phase DC ripple); the analytic
        # sr/old_sr scale leaves truncation ripple julius doesn't have.
        kernel /= kernel.sum()
        kernels.append(kernel)
    return np.stack(kernels).astype(np.float32), width


def resample_frac(
    x: jax.Array, old_sr: int, new_sr: int, zeros: int = 24, rolloff: float = 0.945
) -> jax.Array:
    """Resample ``x (..., T)`` from ``old_sr`` to ``new_sr`` (ratio semantics)."""
    gcd = math.gcd(old_sr, new_sr)
    old_sr //= gcd
    new_sr //= gcd
    if old_sr == new_sr:
        return x
    kernels, width = _kernels_np(old_sr, new_sr, zeros, rolloff)
    kernel = jnp.asarray(kernels)[:, None, :]  # (new_sr, 1, K)
    *shape, length = x.shape
    xr = x.reshape(-1, 1, length)
    # julius pads with edge replication (F.pad mode='replicate'), not zeros —
    # zero padding diverges from the reference over the first/last ~width
    # samples of every resample (audible at Demucs-v2 segment boundaries).
    xr = jnp.pad(xr, [(0, 0), (0, 0), (width, width + old_sr)], mode="edge")
    y = jax.lax.conv_general_dilated(
        xr, kernel, window_strides=(old_sr,), padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    # (B, new_sr, frames) -> interleave phases -> (B, new_sr*frames)
    y = jnp.swapaxes(y, 1, 2).reshape(y.shape[0], -1)
    target = int(Fraction(length * new_sr, old_sr))
    return y[..., :target].reshape(*shape, target)
