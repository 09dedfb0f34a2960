"""Second-implementation cross-check for ``ops/wiener.py``.

The suite's other Wiener tests use analytic 2-source EM oracles and a
network-gated openunmix golden; this file adds an INDEPENDENT pure-numpy
float64 EM transcribed step-by-step from the published openunmix algorithm
(filtering.py: expectation_maximization / wiener; the norbert local Gaussian
model of Liutkus & Badeau) — naive loops over sources/frames/windows, no
shared code or vectorization tricks with the JAX implementation. It
cross-checks the einsum chains, the 2x2 Hermitian inverse fast path, the
conditioning scale, the residual source, and apply_wiener's padded-window
reshape against the reference's host-side 300-frame window loop
(/root/reference/demucs/htdemucs.py:480-509 consumer).
"""

import numpy as np
import jax

import pytest

from demucs_tpu.ops.wiener import apply_wiener, wiener

EPS = 1e-10


def oracle_em(y, x, iterations, eps=EPS):
    """Naive-loop EM: y (T,F,C,S) complex128 estimates, x (T,F,C) mixture."""
    T, F, C, S = y.shape
    for _ in range(iterations):
        # M-step: per-source PSD and frequency-wise spatial covariance
        v = np.mean(np.abs(y) ** 2, axis=2)  # (T, F, S)
        R = np.zeros((F, C, C, S), np.complex128)
        for j in range(S):
            num = np.zeros((F, C, C), np.complex128)
            for t in range(T):
                yj = y[t, :, :, j]  # (F, C)
                num += yj[:, :, None] * np.conj(yj)[:, None, :]
            R[..., j] = num / (eps + v[:, :, j].sum(axis=0))[:, None, None]

        # E-step: per-frame mixture covariance, inverse, Wiener gains
        ynew = np.zeros_like(y)
        for t in range(T):
            Cx = np.broadcast_to(np.sqrt(eps) * np.eye(C), (F, C, C)).astype(
                np.complex128).copy()
            for j in range(S):
                Cx += v[t, :, j][:, None, None] * R[..., j]
            inv = np.linalg.inv(Cx)  # (F, C, C)
            for j in range(S):
                gain = v[t, :, j][:, None, None] * np.einsum(
                    "fcd,fde->fce", R[..., j], inv)
                ynew[t, :, :, j] = np.einsum("fce,fe->fc", gain, x[t])
        y = ynew
    return y


def oracle_wiener(mags, mix, iterations, residual=False, scale_factor=10.0):
    """openunmix wiener: conditioning scale, mixture-phase init, optional
    residual source, EM refinement."""
    max_abs = max(1.0, float(np.abs(mix).max()) / scale_factor)
    mix = mix / max_abs
    targets = mags / max_abs
    y = targets * np.exp(1j * np.angle(mix))[..., None]
    if residual:
        y = np.concatenate([y, (mix - y.sum(axis=-1))[..., None]], axis=-1)
    if iterations:
        y = oracle_em(y.astype(np.complex128), mix.astype(np.complex128),
                      iterations)
    return y * max_abs


def oracle_apply(mag_out, mix_stft, niters, residual=False, win_len=300):
    """The models' _wiener wrapper as a plain host-side window loop."""
    B, S, C, F, T = mag_out.shape
    out = np.zeros((B, S, C, F, T), np.complex128)
    for b in range(B):
        mags = np.transpose(mag_out[b], (3, 2, 1, 0))  # (T, F, C, S)
        mix = np.transpose(mix_stft[b], (2, 1, 0))  # (T, F, C)
        for lo in range(0, T, win_len):
            hi = min(T, lo + win_len)
            y = oracle_wiener(mags[lo:hi], mix[lo:hi], niters,
                              residual=residual)
            if residual:
                y = y[..., :-1]
            out[b, :, :, :, lo:hi] = np.transpose(y, (3, 2, 1, 0))
    return out


def _random_case(seed, T=7, F=5, C=2, S=3):
    rng = np.random.default_rng(seed)
    mix = (rng.standard_normal((T, F, C)) +
           1j * rng.standard_normal((T, F, C))).astype(np.complex64)
    mags = np.abs(rng.standard_normal((T, F, C, S))).astype(np.float32)
    return mags, mix


@pytest.mark.parametrize("iterations", [0, 1, 2, 3])
@pytest.mark.parametrize("residual", [False, True])
def test_wiener_vs_numpy_oracle(iterations, residual):
    mags, mix = _random_case(seed=100 + iterations)
    want = oracle_wiener(mags.astype(np.float64), mix.astype(np.complex128),
                         iterations, residual=residual)
    got = np.asarray(jax.jit(
        lambda m, x: wiener(m, x, iterations, residual=residual))(mags, mix))
    assert got.shape == want.shape
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * max(scale, 1.0),
                               rtol=2e-4)


def test_wiener_big_mixture_conditioning_scale():
    """|x|_inf > scale_factor engages the conditioning division."""
    mags, mix = _random_case(seed=7)
    mix = mix * 40.0
    mags = mags * 40.0
    want = oracle_wiener(mags.astype(np.float64), mix.astype(np.complex128), 2)
    got = np.asarray(wiener(mags, mix, 2))
    np.testing.assert_allclose(got, want, atol=2e-5 * np.abs(want).max(),
                               rtol=2e-4)


@pytest.mark.parametrize("T,win", [(7, 3), (9, 3), (6, 300)])
def test_apply_wiener_windowing_vs_loop_oracle(T, win):
    """Padded-window lax.map == naive per-window loop, including the ragged
    trailing window and the single-window case."""
    rng = np.random.default_rng(5)
    B, S, C, F = 2, 3, 2, 4
    mix = (rng.standard_normal((B, C, F, T)) +
           1j * rng.standard_normal((B, C, F, T))).astype(np.complex64)
    mags = np.abs(rng.standard_normal((B, S, C, F, T))).astype(np.float32)
    for niters, residual in ((1, False), (2, True)):
        want = oracle_apply(mags.astype(np.float64),
                            mix.astype(np.complex128), niters,
                            residual=residual, win_len=win)
        got = np.asarray(apply_wiener(mags, mix, niters, residual=residual,
                                      wiener_win_len=win))
        np.testing.assert_allclose(got, want, atol=2e-5 * np.abs(want).max(),
                                   rtol=2e-4)
