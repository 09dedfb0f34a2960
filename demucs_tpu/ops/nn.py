"""Core NN primitives with PyTorch-compatible semantics on TPU-friendly layouts.

These are thin, jit-friendly wrappers over ``jax.lax`` that accept weights in
the same layout as the reference's serialized checkpoints (so the zoo bridge in
``demucs_tpu.zoo`` is a pure name-mapping):

- conv weights: ``(out, in/groups, *kernel)`` (torch Conv{1,2}d layout)
- transposed conv weights: ``(in, out/groups, *kernel)`` (torch ConvTranspose)
- linear weights: ``(out, in)``

Numerical parity notes:

- ``gelu`` is the *exact* erf formulation (torch ``F.gelu`` default); JAX's
  default is the tanh approximation, which would break checkpoint parity.
- ``group_norm``/``layer_norm`` use eps=1e-5 (torch defaults) and biased
  variance, matching torch normalization layers.
- ``std`` helpers use Bessel's correction (ddof=1) where the reference uses
  ``Tensor.std()`` (e.g. input normalization in the hybrid models).

Compute dtype: convolutions/matmuls accept an optional ``preferred_dtype`` for
bf16 activations with fp32 accumulation (``preferred_element_type``).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "conv1d",
    "conv2d",
    "conv_transpose1d",
    "conv_transpose2d",
    "linear",
    "group_norm",
    "layer_norm",
    "glu",
    "gelu",
    "std_unbiased",
    "embedding",
]


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU — parity with torch ``F.gelu`` default."""
    return jax.nn.gelu(x, approximate=False)


def glu(x: jax.Array, axis: int = 1) -> jax.Array:
    """Gated linear unit along ``axis`` (torch ``F.glu`` semantics)."""
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


def std_unbiased(x: jax.Array, axis, keepdims: bool = True) -> jax.Array:
    """Standard deviation with Bessel's correction (torch ``Tensor.std``)."""
    return jnp.std(x, axis=axis, keepdims=keepdims, ddof=1)


def _accum_dtype(x: jax.Array) -> jnp.dtype:
    """Conv result type = input type.

    On TPU the MXU accumulates partials in fp32 regardless of the HLO result
    type, and every conv here downcasts to ``x.dtype`` immediately after, so
    requesting ``preferred_element_type=float32`` for bf16 inputs is
    numerically a no-op — while making the conv non-differentiable (this JAX
    version's conv transpose rule rejects cotangent/operand dtype mixes,
    breaking mixed-precision training)."""
    return x.dtype


def conv1d(
    x: jax.Array,
    w: jax.Array,
    b: tp.Optional[jax.Array] = None,
    *,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jax.Array:
    """1-D convolution. ``x (B, C, L)``, ``w (O, I/groups, K)`` (torch layout)."""
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
        preferred_element_type=_accum_dtype(x),
    ).astype(x.dtype)
    if b is not None:
        out = out + b[None, :, None].astype(out.dtype)
    return out


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: tp.Optional[jax.Array] = None,
    *,
    stride: tp.Union[int, tuple[int, int]] = 1,
    padding: tp.Union[int, tuple[int, int]] = 0,
    dilation: tp.Union[int, tuple[int, int]] = 1,
    groups: int = 1,
) -> jax.Array:
    """2-D convolution. ``x (B, C, H, W)``, ``w (O, I/groups, Kh, Kw)``."""
    stride = (stride, stride) if isinstance(stride, int) else tuple(stride)
    padding = (padding, padding) if isinstance(padding, int) else tuple(padding)
    dilation = (dilation, dilation) if isinstance(dilation, int) else tuple(dilation)
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        rhs_dilation=dilation,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        preferred_element_type=_accum_dtype(x),
    ).astype(x.dtype)
    if b is not None:
        out = out + b[None, :, None, None].astype(out.dtype)
    return out


def _phase_kernels(w: jax.Array, stride: int) -> jax.Array:
    """Split a transposed-conv kernel ``(I, O, K)`` into per-output-phase
    sub-kernels ``(O*stride, I, ceil(K/stride))``, reversed for correlation.

    out[s*q + p] = sum_j x[q - j] * w[s*j + p]  — each output phase p is a
    plain convolution with taps ``w[p::s]``. This does 1/s of the MACs of the
    input-dilated formulation (no multiplications against inserted zeros) and
    keeps the MXU conv path dense.
    """
    I, O, K = w.shape
    Kp = -(-K // stride)
    if K != Kp * stride:
        w = jnp.pad(w, [(0, 0), (0, 0), (0, Kp * stride - K)])
    # (I, O, Kp, s) -> (s, O, I, Kp), reversed taps for the correlation form
    wp = w.reshape(I, O, Kp, stride).transpose(3, 1, 0, 2)[..., ::-1]
    return wp.reshape(stride * O, I, Kp)


def conv_transpose1d(
    x: jax.Array,
    w: jax.Array,
    b: tp.Optional[jax.Array] = None,
    *,
    stride: int = 1,
    padding: int = 0,
) -> jax.Array:
    """1-D transposed convolution, torch semantics.

    ``x (B, C, L)``, ``w (I, O, K)`` (torch ConvTranspose1d layout).
    out_len = (L - 1) * stride - 2 * padding + K.

    Implemented by phase decomposition: one dense conv producing all ``stride``
    output phases as channels, then an interleaving reshape — s x fewer MACs
    than the input-dilated form.
    """
    I, O, K = w.shape
    if stride == 1:
        w_flip = jnp.swapaxes(w, 0, 1)[..., ::-1]
        out = lax.conv_general_dilated(
            x, w_flip, window_strides=(1,), padding=[(K - 1 - padding,) * 2],
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=_accum_dtype(x),
        ).astype(x.dtype)
        if b is not None:
            out = out + b[None, :, None].astype(out.dtype)
        return out
    B, _, T = x.shape
    Kp = -(-K // stride)
    wp = _phase_kernels(w, stride)  # (s*O, I, Kp)
    y = lax.conv_general_dilated(
        x, wp, window_strides=(1,), padding=[(Kp - 1, Kp - 1)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=_accum_dtype(x),
    ).astype(x.dtype)  # (B, s*O, Q) with Q = T + Kp - 1
    Q = y.shape[-1]
    # (B, s, O, Q) -> (B, O, Q, s) -> interleave
    y = y.reshape(B, stride, O, Q).transpose(0, 2, 3, 1).reshape(B, O, Q * stride)
    out_len = (T - 1) * stride + K
    out = y[..., : out_len]
    if padding:
        out = out[..., padding:-padding]
    if b is not None:
        out = out + b[None, :, None].astype(out.dtype)
    return out


def conv_transpose2d(
    x: jax.Array,
    w: jax.Array,
    b: tp.Optional[jax.Array] = None,
    *,
    stride: tp.Union[int, tuple[int, int]] = 1,
    padding: tp.Union[int, tuple[int, int]] = 0,
) -> jax.Array:
    """2-D transposed convolution, torch semantics. ``w (I, O, Kh, Kw)``.

    The hybrid models' freq decoders use stride (s, 1); that case runs the
    phase-decomposed dense form (see :func:`conv_transpose1d`); other shapes
    fall back to the input-dilated formulation.
    """
    stride = (stride, stride) if isinstance(stride, int) else tuple(stride)
    padding = (padding, padding) if isinstance(padding, int) else tuple(padding)
    I, O, Kh, Kw = w.shape
    sh, sw = stride
    if sh > 1 and sw == 1 and padding == (0, 0):
        B, _, H, W = x.shape
        Khp = -(-Kh // sh)
        wpad = w if Kh == Khp * sh else jnp.pad(
            w, [(0, 0), (0, 0), (0, Khp * sh - Kh), (0, 0)])
        # (I, O, Khp, s, Kw) -> (s, O, I, Khp, Kw), reversed taps on H; W axis
        # is stride-1 so it keeps the plain flipped-kernel correlation form.
        wp = wpad.reshape(I, O, Khp, sh, Kw).transpose(3, 1, 0, 2, 4)
        wp = wp[..., ::-1, ::-1].reshape(sh * O, I, Khp, Kw)
        y = lax.conv_general_dilated(
            x, wp, window_strides=(1, 1),
            padding=[(Khp - 1, Khp - 1), (Kw - 1, Kw - 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=_accum_dtype(x),
        ).astype(x.dtype)  # (B, s*O, Q, Wout)
        Q, Wout = y.shape[-2:]
        y = y.reshape(B, sh, O, Q, Wout).transpose(0, 2, 3, 1, 4)
        y = y.reshape(B, O, Q * sh, Wout)
        out = y[..., : (H - 1) * sh + Kh, :]
        if b is not None:
            out = out + b[None, :, None, None].astype(out.dtype)
        return out
    w_flip = jnp.swapaxes(w, 0, 1)[..., ::-1, ::-1]
    out = lax.conv_general_dilated(
        x,
        w_flip,
        window_strides=(1, 1),
        padding=[
            (Kh - 1 - padding[0], Kh - 1 - padding[0]),
            (Kw - 1 - padding[1], Kw - 1 - padding[1]),
        ],
        lhs_dilation=stride,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=_accum_dtype(x),
    ).astype(x.dtype)
    if b is not None:
        out = out + b[None, :, None, None].astype(out.dtype)
    return out


def linear(x: jax.Array, w: jax.Array, b: tp.Optional[jax.Array] = None) -> jax.Array:
    """Affine map on the last axis. ``w (out, in)`` (torch Linear layout)."""
    out = jnp.einsum(
        "...i,oi->...o", x, w, preferred_element_type=_accum_dtype(x)
    ).astype(x.dtype)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def group_norm(
    x: jax.Array,
    num_groups: int,
    w: tp.Optional[jax.Array] = None,
    b: tp.Optional[jax.Array] = None,
    *,
    eps: float = 1e-5,
) -> jax.Array:
    """GroupNorm over ``x (B, C, *spatial)`` — torch ``nn.GroupNorm`` semantics.

    Normalizes over (C/G, *spatial) per group with biased variance; affine
    params are per-channel.
    """
    B, C = x.shape[:2]
    spatial = x.shape[2:]
    xg = x.reshape(B, num_groups, C // num_groups, *spatial).astype(jnp.float32)
    axes = tuple(range(2, xg.ndim))
    mean = xg.mean(axis=axes, keepdims=True)
    var = jnp.mean((xg - mean) ** 2, axis=axes, keepdims=True)
    xg = (xg - mean) * lax.rsqrt(var + eps)
    out = xg.reshape(B, C, *spatial).astype(x.dtype)
    if w is not None:
        shape = (1, C) + (1,) * len(spatial)
        out = out * w.reshape(shape).astype(out.dtype)
        if b is not None:
            out = out + b.reshape(shape).astype(out.dtype)
    return out


def layer_norm(
    x: jax.Array,
    w: tp.Optional[jax.Array] = None,
    b: tp.Optional[jax.Array] = None,
    *,
    eps: float = 1e-5,
) -> jax.Array:
    """LayerNorm over the last axis — torch ``nn.LayerNorm`` semantics."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    out = ((xf - mean) * lax.rsqrt(var + eps)).astype(x.dtype)
    if w is not None:
        out = out * w.astype(out.dtype)
        if b is not None:
            out = out + b.astype(out.dtype)
    return out


def embedding(ids: jax.Array, table: jax.Array) -> jax.Array:
    """Embedding lookup; ``table (num_embeddings, dim)``."""
    return jnp.take(table, ids, axis=0)
