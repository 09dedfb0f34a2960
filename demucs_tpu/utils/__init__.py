"""Small array utilities shared across the framework."""

from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp

__all__ = ["center_trim", "unfold"]


def center_trim(x: jax.Array, reference: tp.Union[jax.Array, int]) -> jax.Array:
    """Center-trim last axis of ``x`` to the length of ``reference``.

    Extra sample (odd delta) is removed on the right side — matches
    ``demucs/utils.py:38-54``.
    """
    ref_size = reference if isinstance(reference, int) else reference.shape[-1]
    delta = x.shape[-1] - ref_size
    if delta < 0:
        raise ValueError(f"tensor must be larger than reference. Delta is {delta}.")
    if delta:
        x = x[..., delta // 2 : -(delta - delta // 2)]
    return x


def unfold(x: jax.Array, kernel_size: int, stride: int) -> jax.Array:
    """Extract frames: ``(..., T) -> (..., F, K)`` with ``F = ceil(T / stride)``.

    Zero-pads the tail so every frame is complete — matches
    ``demucs/utils.py:20-35``. Static-shape (jit friendly).
    """
    length = x.shape[-1]
    n_frames = math.ceil(length / stride)
    tgt_length = (n_frames - 1) * stride + kernel_size
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, tgt_length - length)])
    if kernel_size % stride == 0:
        ratio = kernel_size // stride
        n_chunks = x.shape[-1] // stride
        y = x[..., : n_chunks * stride].reshape(*x.shape[:-1], n_chunks, stride)
        parts = [y[..., j : j + n_frames, :] for j in range(ratio)]
        return jnp.concatenate(parts, axis=-1)
    idx = jnp.arange(n_frames)[:, None] * stride + jnp.arange(kernel_size)[None, :]
    return x[..., idx]
