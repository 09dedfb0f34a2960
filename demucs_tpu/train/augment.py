"""Batch augmentations as jitted array programs with explicit PRNG.

Behavioral reference: ``demucs/augment.py`` — Shift / FlipChannels / FlipSign /
Scale / Remix (group-size invariant shuffling, augment.py:64-95). The
reference's implicit torch RNG becomes explicit ``jax.random`` keys so the
whole augment pipeline fuses into the jitted train step (no separate GPU
kernel launches, no host sync).

Input/output: ``wav (B, S, C, T)`` stacked sources.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Mirrors conf/config.yaml `augment` section defaults."""

    shift: int = 8192
    shift_same: bool = False
    flip: bool = True
    scale_proba: float = 1.0
    scale_min: float = 0.25
    scale_max: float = 1.25
    remix_proba: float = 1.0
    remix_group_size: int = 4


def shift_aug(rng: jax.Array, wav: jax.Array, shift: int, same: bool,
              train: bool = True) -> jax.Array:
    """Random time shift by up to ``shift`` samples (augment.py:14-35).

    Output length T - shift; eval mode just truncates.
    """
    B, S, C, T = wav.shape
    length = T - shift
    if shift <= 0:
        return wav
    if not train:
        return wav[..., :length]
    srcs = 1 if same else S
    offsets = jax.random.randint(rng, (B, srcs, 1, 1), 0, shift)[:, :, 0, 0]
    offsets = jnp.broadcast_to(offsets, (B, S))
    # Per-(batch, source) contiguous window: vmapped dynamic_slice lowers to
    # cheap offset arithmetic on TPU where an equivalent full-size
    # take_along_axis gather costs ~2x the model forward (the same pathology
    # tools/probe_ola.py measured in the inference overlap-add).
    slice_one = lambda w, off: jax.lax.dynamic_slice_in_dim(  # noqa: E731
        w, off, length, axis=-1)
    return jax.vmap(jax.vmap(slice_one))(wav, offsets)


def flip_channels_aug(rng: jax.Array, wav: jax.Array, train: bool = True) -> jax.Array:
    """Random left/right swap per (batch, source) (augment.py:38-49)."""
    B, S, C, T = wav.shape
    if not train or C != 2:
        return wav
    left = jax.random.randint(rng, (B, S, 1, 1), 0, 2)
    # elementwise select of the channel-reversed view — no gather
    return jnp.where(left == 1, wav[:, :, ::-1, :], wav)


def flip_sign_aug(rng: jax.Array, wav: jax.Array, train: bool = True) -> jax.Array:
    """Random sign flip per (batch, source) (augment.py:52-61)."""
    B, S, C, T = wav.shape
    if not train:
        return wav
    signs = jax.random.randint(rng, (B, S, 1, 1), 0, 2).astype(wav.dtype)
    return wav * (2 * signs - 1)


def scale_aug(rng: jax.Array, wav: jax.Array, proba: float, lo: float, hi: float,
              train: bool = True) -> jax.Array:
    """Random per-(batch,source) gain in [lo, hi] (augment.py:98-111).

    The reference draws one Bernoulli(proba) per *batch*; here that draw is a
    traced value so the whole step stays jittable.
    """
    B, S, C, T = wav.shape
    if not train or proba <= 0:
        return wav
    k1, k2 = jax.random.split(rng)
    scales = jax.random.uniform(k1, (B, S, 1, 1), minval=lo, maxval=hi)
    apply = jax.random.uniform(k2, ()) < proba
    return jnp.where(apply, wav * scales, wav)


def remix_aug(rng: jax.Array, wav: jax.Array, proba: float, group_size: int,
              train: bool = True) -> jax.Array:
    """Shuffle sources within groups of ``group_size`` (augment.py:64-95).

    Group-wise shuffling keeps the mixing distribution invariant to the
    data-parallel world size.
    """
    B, S, C, T = wav.shape
    if not train or proba <= 0:
        return wav
    group_size = group_size or B
    if B % group_size != 0:
        raise ValueError(f"Batch size {B} must be divisible by group size {group_size}")
    groups = B // group_size
    k1, k2 = jax.random.split(rng)
    wavg = wav.reshape(groups, group_size, S, C, T)
    perm = jnp.argsort(jax.random.uniform(k1, (groups, group_size, S, 1, 1)),
                       axis=1)[..., 0, 0]  # (groups, group_size, S)
    # Exact selection as a masked sum over the tiny group axis (exactly one
    # term is nonzero per output) — streams group_size x the array instead of
    # an arbitrary full-size gather, which is the faster trade on TPU.
    shuffled = sum(
        jnp.where((perm == j)[:, :, :, None, None], wavg[:, j][:, None], 0.0)
        for j in range(group_size)
    ).reshape(B, S, C, T)
    apply = jax.random.uniform(k2, ()) < proba
    return jnp.where(apply, shuffled, wav)


def make_augment(cfg: AugmentConfig, full: bool) -> tp.Callable[[jax.Array, jax.Array], jax.Array]:
    """Build the train-time augment pipeline (solver.py:53-61 ordering):
    Shift [+FlipChannels +FlipSign] [+Scale +Remix if ``full``]."""

    def augment(rng: jax.Array, wav: jax.Array) -> jax.Array:
        keys = jax.random.split(rng, 5)
        wav = shift_aug(keys[0], wav, cfg.shift, cfg.shift_same)
        if cfg.flip:
            wav = flip_channels_aug(keys[1], wav)
            wav = flip_sign_aug(keys[2], wav)
        if full:
            wav = scale_aug(keys[3], wav, cfg.scale_proba, cfg.scale_min, cfg.scale_max)
            wav = remix_aug(keys[4], wav, cfg.remix_proba, cfg.remix_group_size)
        return wav

    return augment
