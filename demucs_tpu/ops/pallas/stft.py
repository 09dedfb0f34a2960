"""Pallas STFT/iSTFT kernels: fused windowed chunk-matmul DFT (MXU path).

The BASELINE north star asks for the STFT as a TPU kernel. Formulation (same
math as ops/spec.py's ``method="matmul"``, which it matches bit-for-bit):
with ``r = n_fft // hop`` (4 for the Demucs convention), analysis frame ``t``
is the concatenation of hop-chunks ``t..t+r-1``, so

    Z[t] = sum_j chunks[t+j] @ G_j,   G_j = (window * DFT)[j*hop:(j+1)*hop]

— ``r`` shifted (frames, hop) x (hop, freqs) matmuls. The kernel fuses the
window (baked into G), the ``r``-way reduction, and both real/imag outputs in
one VMEM-resident pass per (frame-block, freq-block) grid cell, so the
overlapped frames are never materialized in HBM.

The iSTFT is the transpose: output hop-chunk ``c`` overlap-adds the tails of
frames ``c-r+1..c``:

    x[c] = sum_j (Zr[c-j] @ Mr_j + Zi[c-j] @ Mi_j)

with ``M_j`` the (freqs, hop) slices of the inverse-DFT-times-window basis.
Window-envelope normalization stays outside (ops/spec.py), identical to the
other methods.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

BLOCK_FRAMES = 128
# 128-freq blocks keep the double-buffered windowed-DFT basis slices
# (r x hop x block x 4B x2 buffers x re/im) within the 16 MB VMEM budget.
BLOCK_FREQS = 128
_INTERPRET = False  # flipped by tests on CPU


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _stft_kernel(y_ref, wr_ref, wi_ref, zr_ref, zi_ref, *, r: int):
    acc_r = None
    acc_i = None
    for j in range(r):  # static unroll: r shifted MXU matmuls
        yj = y_ref[j, 0].astype(jnp.float32)  # (block_f, hop)
        gr = wr_ref[j].astype(jnp.float32)  # (hop, block_q)
        gi = wi_ref[j].astype(jnp.float32)
        pr = jnp.dot(yj, gr, preferred_element_type=jnp.float32)
        pi = jnp.dot(yj, gi, preferred_element_type=jnp.float32)
        acc_r = pr if acc_r is None else acc_r + pr
        acc_i = pi if acc_i is None else acc_i + pi
    zr_ref[0] = acc_r
    zi_ref[0] = acc_i


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "interpret"))
def stft_chunk_dft(y: jax.Array, n_fft: int, hop: int,
                   *, interpret: bool = False):
    """Windowed chunk-matmul DFT: ``y (B, n_chunks, hop)`` hop-chunked signal
    -> ``(zr, zi)`` of shape ``(B, n_frames, n_fft//2+1)`` float32 (caller
    normalizes / packs complex)."""
    from demucs_tpu.ops.spec import _hann_np, _rdft_basis_np

    r = n_fft // hop
    assert r * hop == n_fft, (n_fft, hop)
    B, n_chunks, _ = y.shape
    n_frames = n_chunks - r + 1
    freqs = n_fft // 2 + 1

    Fr, Fi = _rdft_basis_np(n_fft)
    win = _hann_np(n_fft)[:, None].astype(np.float64)
    freq_pad = _round_up(freqs, BLOCK_FREQS)
    wr = np.zeros((r, hop, freq_pad), np.float32)
    wi = np.zeros((r, hop, freq_pad), np.float32)
    for j in range(r):
        wr[j, :, :freqs] = (win * Fr)[j * hop : (j + 1) * hop]
        wi[j, :, :freqs] = (win * Fi)[j * hop : (j + 1) * hop]

    nf_pad = _round_up(n_frames, BLOCK_FRAMES)
    # r shifted frame views, stacked: ys[j, b, t] = chunks[t + j]
    pad_chunks = nf_pad + r - 1 - n_chunks
    ypad = jnp.pad(y, [(0, 0), (0, max(0, pad_chunks)), (0, 0)])
    ys = jnp.stack([ypad[:, j : j + nf_pad, :] for j in range(r)])  # (r,B,nf,hop)

    grid = (B, nf_pad // BLOCK_FRAMES, freq_pad // BLOCK_FREQS)
    kernel = functools.partial(_stft_kernel, r=r)
    zr, zi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((r, 1, BLOCK_FRAMES, hop), lambda b, t, q: (0, b, t, 0)),
            pl.BlockSpec((r, hop, BLOCK_FREQS), lambda b, t, q: (0, 0, q)),
            pl.BlockSpec((r, hop, BLOCK_FREQS), lambda b, t, q: (0, 0, q)),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_FRAMES, BLOCK_FREQS), lambda b, t, q: (b, t, q)),
            pl.BlockSpec((1, BLOCK_FRAMES, BLOCK_FREQS), lambda b, t, q: (b, t, q)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, nf_pad, freq_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, nf_pad, freq_pad), jnp.float32),
        ],
        interpret=interpret or _INTERPRET,
    )(ys, jnp.asarray(wr), jnp.asarray(wi))
    return zr[:, :n_frames, :freqs], zi[:, :n_frames, :freqs]


def _istft_kernel(zr_ref, zi_ref, mr_ref, mi_ref, o_ref, *, r: int):
    acc = None
    for j in range(r):  # frame c-j contributes its j-th hop slice to chunk c
        fr = zr_ref[j, 0].astype(jnp.float32)  # (block_c, block_freqs)
        fi = zi_ref[j, 0].astype(jnp.float32)
        mr = mr_ref[j].astype(jnp.float32)  # (block_freqs, hop)
        mi = mi_ref[j].astype(jnp.float32)
        p = (jnp.dot(fr, mr, preferred_element_type=jnp.float32)
             + jnp.dot(fi, mi, preferred_element_type=jnp.float32))
        acc = p if acc is None else acc + p

    # freq blocks are the innermost (sequential) grid dim: accumulate the
    # partial inverse-DFT sums into the revisited output block.
    q = pl.program_id(2)

    @pl.when(q == 0)
    def _init():
        o_ref[0] = acc

    @pl.when(q > 0)
    def _accum():
        o_ref[0] += acc


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "interpret"))
def istft_chunk_dft(zr: jax.Array, zi: jax.Array, n_fft: int, hop: int,
                    *, interpret: bool = False):
    """Transpose kernel: windowed inverse-DFT + overlap-add.

    ``zr/zi (B, n_frames, freqs)`` -> ``(B, total_len)`` float32 where
    ``total_len = (n_frames - 1) * hop + n_fft`` (window-sum normalization is
    the caller's, as in ops/spec.py)."""
    from demucs_tpu.ops.spec import _hann_np, _irdft_basis_np

    r = n_fft // hop
    B, n_frames, freqs = zr.shape
    n_out_chunks = n_frames - 1 + r
    total = n_out_chunks * hop
    assert total == (n_frames - 1) * hop + n_fft

    Mr, Mi = _irdft_basis_np(n_fft)  # (freqs, n_fft)
    win = _hann_np(n_fft)[None, :].astype(np.float64)
    freq_pad = _round_up(freqs, BLOCK_FREQS)
    mr = np.zeros((r, freq_pad, hop), np.float32)
    mi = np.zeros((r, freq_pad, hop), np.float32)
    for j in range(r):
        mr[j, :freqs] = (Mr * win)[:, j * hop : (j + 1) * hop]
        mi[j, :freqs] = (Mi * win)[:, j * hop : (j + 1) * hop]

    nc_pad = _round_up(n_out_chunks, BLOCK_FRAMES)
    if freq_pad != freqs:
        zr = jnp.pad(zr, [(0, 0), (0, 0), (0, freq_pad - freqs)])
        zi = jnp.pad(zi, [(0, 0), (0, 0), (0, freq_pad - freqs)])
    # chunk c sums frames c-j for j in [0, r): stack r shifted frame views,
    # zero-padded so out-of-range frames contribute nothing.
    zr_s = jnp.stack([
        jnp.pad(zr, [(0, 0), (j, nc_pad - n_frames - j), (0, 0)])
        for j in range(r)
    ])  # (r, B, nc_pad, freq_pad); view j at chunk c = frame c - j
    zi_s = jnp.stack([
        jnp.pad(zi, [(0, 0), (j, nc_pad - n_frames - j), (0, 0)])
        for j in range(r)
    ])

    grid = (B, nc_pad // BLOCK_FRAMES, freq_pad // BLOCK_FREQS)
    kernel = functools.partial(_istft_kernel, r=r)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((r, 1, BLOCK_FRAMES, BLOCK_FREQS),
                         lambda b, c, q: (0, b, c, q)),
            pl.BlockSpec((r, 1, BLOCK_FRAMES, BLOCK_FREQS),
                         lambda b, c, q: (0, b, c, q)),
            pl.BlockSpec((r, BLOCK_FREQS, hop), lambda b, c, q: (0, q, 0)),
            pl.BlockSpec((r, BLOCK_FREQS, hop), lambda b, c, q: (0, q, 0)),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_FRAMES, hop), lambda b, c, q: (b, c, 0)),
        out_shape=jax.ShapeDtypeStruct((B, nc_pad, hop), jnp.float32),
        interpret=interpret or _INTERPRET,
    )(zr_s, zi_s, jnp.asarray(mr), jnp.asarray(mi))
    return out[:, :n_out_chunks, :].reshape(B, total)
