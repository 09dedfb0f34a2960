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

import math
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
    return jnp.float32 if x.dtype in (jnp.bfloat16, jnp.float16) else x.dtype


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

    Implemented as an input-dilated convolution with the flipped kernel, which
    XLA maps directly onto the MXU conv path.
    """
    K = w.shape[-1]
    # conv_transpose == conv(lhs_dilation=stride, pad=K-1-padding, kernel flipped, IO swapped)
    w_flip = jnp.swapaxes(w, 0, 1)[..., ::-1]  # (O, I, K)
    out = lax.conv_general_dilated(
        x,
        w_flip,
        window_strides=(1,),
        padding=[(K - 1 - padding, K - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=_accum_dtype(x),
    ).astype(x.dtype)
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
    """2-D transposed convolution, torch semantics. ``w (I, O, Kh, Kw)``."""
    stride = (stride, stride) if isinstance(stride, int) else tuple(stride)
    padding = (padding, padding) if isinstance(padding, int) else tuple(padding)
    Kh, Kw = w.shape[-2:]
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
