"""Multichannel Wiener filtering via Expectation-Maximization, in JAX.

Behavioral reference: the ``openunmix.filtering.wiener`` dependency used by
``demucs/hdemucs.py:661-687`` / ``demucs/htdemucs.py:480-509`` for models with
``cac=False`` (the mdx-era hybrids). The algorithm is the standard local
Gaussian model EM of Liutkus & Badeau (norbert):

    repeat `iterations` times:
      M-step: per-source PSD v_j(t,f) = mean_c |y_j|^2;
              spatial covariance R_j(f) = sum_t y_j y_j^H / (v_j + eps)
                                          normalized by sum_t v_j
      E-step: C_x(t,f) = sum_j v_j R_j + eps I
              y_j = v_j R_j C_x^{-1} x      (multichannel Wiener gain)

Initialization uses the mixture phase with the estimated magnitudes. Inputs
are scaled down by max(1, |x|_inf / 10) for conditioning, as in openunmix.

All frames are processed in one batched einsum chain (the reference loops a
300-frame window host-side; our model wrappers replicate that windowing for
behavioral parity — see ``apply_wiener``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["wiener", "apply_wiener"]

# openunmix filtering.py defaults: eps=1e-10 weights the R normalization;
# the E-step covariance is regularized with sqrt(eps)*I = 1e-5*I (100x
# stronger than eps*I — it is what keeps near-singular bins stable).
_EPS = 1e-10


def _inv_hermitian(m: jax.Array) -> jax.Array:
    """Inverse of small Hermitian matrices ``(..., C, C)`` (C = 1 or 2 fast
    paths, general fallback)."""
    C = m.shape[-1]
    if C == 1:
        return 1.0 / m
    if C == 2:
        a = m[..., 0, 0]
        b = m[..., 0, 1]
        c = m[..., 1, 0]
        d = m[..., 1, 1]
        det = a * d - b * c
        det = jnp.where(jnp.abs(det) < _EPS, det + _EPS, det)
        inv = jnp.stack(
            [jnp.stack([d, -b], axis=-1), jnp.stack([-c, a], axis=-1)], axis=-2
        )
        return inv / det[..., None, None]
    return jnp.linalg.inv(m)


def expectation_maximization(y: jax.Array, x: jax.Array, iterations: int = 2,
                             eps: float = _EPS) -> jax.Array:
    """EM refinement. ``y (T, F, C, S)`` complex initial estimates,
    ``x (T, F, C)`` complex mixture -> refined ``y``."""
    for _ in range(iterations):
        # M-step: R_j(f) = sum_t y y^H / (eps + sum_t v_j)  (norbert local
        # Gaussian model)
        v = jnp.mean(jnp.abs(y) ** 2, axis=2)  # (T, F, S) PSD
        num = jnp.einsum("tfcs,tfds->fcds", y, jnp.conj(y))
        den = eps + jnp.sum(v, axis=0)  # (F, S)
        R = num / den[:, None, None, :]

        # E-step (openunmix regularizes with sqrt(eps) * I)
        Cx = jnp.einsum("tfs,fcds->tfcd", v, R)
        Cx = Cx + (eps ** 0.5) * jnp.eye(x.shape[-1], dtype=Cx.dtype)
        inv_Cx = _inv_hermitian(Cx)  # (T, F, C, C)
        # gain_j = v_j R_j Cx^-1 ; y_j = gain_j x
        y = jnp.einsum("tfs,fcds,tfde,tfe->tfcs", v, R, inv_Cx, x)
    return y


def wiener(targets_spectrograms: jax.Array, mix_stft: jax.Array, iterations: int = 1,
           residual: bool = False, scale_factor: float = 10.0) -> jax.Array:
    """openunmix-style wiener.

    Args:
        targets_spectrograms: real magnitudes ``(T, F, C, S)``.
        mix_stft: complex mixture ``(T, F, C)``.
    Returns:
        complex source estimates ``(T, F, C, S[+1 if residual])``.
    """
    # Conditioning scale (openunmix filtering.py)
    max_abs = jnp.maximum(1.0, jnp.max(jnp.abs(mix_stft)) / scale_factor)
    mix = mix_stft / max_abs
    targets = targets_spectrograms / max_abs

    # Initialize with mixture phase
    angle = jnp.angle(mix)
    phase = jnp.exp(1j * angle).astype(jnp.complex64)
    y = targets.astype(jnp.complex64) * phase[..., None]

    if residual:
        res = (mix - y.sum(axis=-1))[..., None]
        y = jnp.concatenate([y, res], axis=-1)

    if iterations == 0:
        return y * max_abs

    y = expectation_maximization(y, mix.astype(jnp.complex64), iterations)
    return y * max_abs


def apply_wiener(mag_out: jax.Array, mix_stft: jax.Array, niters: int,
                 residual: bool = False, wiener_win_len: int = 300) -> jax.Array:
    """The models' ``_wiener`` wrapper (htdemucs.py:480-509): per-sample,
    300-frame windows (EM statistics are window-local in the reference —
    replicated here for behavioral parity).

    Args:
        mag_out: ``(B, S, C, F, T)`` estimated magnitudes.
        mix_stft: ``(B, C, F, T)`` complex mixture.
    Returns:
        complex ``(B, S, C, F, T)``.
    """
    B, S, C, Fq, T = mag_out.shape
    mags = jnp.transpose(mag_out, (0, 4, 3, 2, 1))  # (B, T, F, C, S)
    mix = jnp.transpose(mix_stft, (0, 3, 2, 1))  # (B, T, F, C)

    # One EM graph per WINDOW SHAPE, not per window: the trailing window is
    # zero-padded to wiener_win_len and all (B * n_win) windows run through
    # lax.map over a single traced body. Zero frames are numerics-neutral:
    # they add nothing to the R statistics (v = 0), their own outputs are
    # zero and sliced away, and they cannot raise the window's conditioning
    # max. The per-(sample, window) EM locality of the reference loop is
    # preserved exactly; compile time/graph size no longer grow with track
    # length (the unrolled form deterministically exhausted XLA:CPU JIT code
    # memory on long tracks).
    n_win = -(-T // wiener_win_len)
    Tp = n_win * wiener_win_len
    if Tp != T:
        mags = jnp.pad(mags, [(0, 0), (0, Tp - T), (0, 0), (0, 0), (0, 0)])
        mix = jnp.pad(mix, [(0, 0), (0, Tp - T), (0, 0), (0, 0)])
    mw = mags.reshape(B * n_win, wiener_win_len, Fq, C, S)
    xw = mix.reshape(B * n_win, wiener_win_len, Fq, C)

    def one(args):
        m, x = args
        return wiener(m, x, niters, residual=residual)

    out = jax.lax.map(one, (mw, xw))  # (B*n_win, W, F, C, S[+1])
    out = out.reshape(B, Tp, Fq, C, -1)[:, :T]
    if residual:
        out = out[..., :-1]
    out = jnp.transpose(out, (0, 4, 3, 2, 1))
    assert out.shape == (B, S, C, Fq, T), out.shape
    return out
