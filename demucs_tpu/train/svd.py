"""Spectral (largest-singular-value) penalty on big weight matrices.

Behavioral reference: ``demucs/svd.py`` — penalize sigma_max^2 of every large
conv/linear/LSTM matrix; exact SVD at validation, randomized low-rank SVD (or
power iteration) at train time; a shared seeded RNG makes all data-parallel
workers skip the penalty on the same steps (svd.py:26-28).

Matrix collection walks the param pytree by path: conv weights (O,I,K[,K])
flatten to (O, -1); transposed convs (I,O,K[,K]) are transposed first when
``convtr``; 1-D params are skipped; LSTM/linear matrices included unless
``conv_only``.
"""

from __future__ import annotations

import random
import typing as tp

import jax
import jax.numpy as jnp

from demucs_tpu.zoo.torch_load import flatten_state

# Shared RNG so all DP workers skip together (svd.py:26-28).
penalty_rng = random.Random(1234)


def _collect_matrices(params: dict, min_size: float, convtr: bool,
                      conv_only: bool) -> tp.List[jax.Array]:
    mats = []
    for name, p in flatten_state(params).items():
        if p.size / 2**18 < min_size:
            continue
        if p.ndim in (3, 4):
            # conv weight; transposed convs have (in, out, k...) layout and the
            # param path ends in conv_tr.weight
            if convtr and ".conv_tr." in name:
                p = jnp.swapaxes(p, 0, 1)
            p = p.reshape(p.shape[0], -1)
        elif p.ndim == 1:
            continue
        elif conv_only:
            continue
        if p.ndim != 2:
            continue
        mats.append(p)
    return mats


def power_iteration(m: jax.Array, key: jax.Array, niters: int = 1, bs: int = 1):
    """Power method on a square PSD matrix (svd.py:11-23)."""
    assert m.ndim == 2 and m.shape[0] == m.shape[1]
    dim = m.shape[0]
    b = jax.random.normal(key, (dim, bs), dtype=m.dtype)
    norm = jnp.zeros((1, bs), m.dtype)
    for _ in range(niters):
        n = m @ b
        norm = jnp.linalg.norm(n, axis=0, keepdims=True)
        b = n / (1e-10 + norm)
    return norm.mean()


def _svd_lowrank_sq(p: jax.Array, key: jax.Array, dim: int, niters: int):
    """Randomized subspace iteration estimate of sigma_max^2
    (torch.svd_lowrank equivalent: Halko et al. 2009)."""
    m, n = p.shape
    q = jax.random.normal(key, (n, dim), dtype=p.dtype)
    q = p @ q
    for _ in range(niters):
        q, _ = jnp.linalg.qr(q)
        q = p @ (p.T @ q)
    q, _ = jnp.linalg.qr(q)
    b = q.T @ p
    s = jnp.linalg.svd(b, compute_uv=False)
    return s[0] ** 2


def svd_penalty(params: dict, *, min_size: float = 0.1, dim: int = 1, niters: int = 2,
                powm: bool = False, convtr: bool = True, proba: float = 1.0,
                conv_only: bool = False, exact: bool = False, bs: int = 1,
                key: tp.Optional[jax.Array] = None):
    """Sum of sigma_max^2 over large matrices (svd.py:31-83). Differentiable."""
    if penalty_rng.random() > proba:
        return 0.0
    if key is None:
        key = jax.random.PRNGKey(penalty_rng.randrange(2**31))
    total = 0.0
    mats = _collect_matrices(params, min_size, convtr, conv_only)
    for i, p in enumerate(mats):
        sub = jax.random.fold_in(key, i)
        if exact:
            s = jnp.linalg.svd(p, compute_uv=False)
            estimate = (s**2).max()
        elif powm:
            a, b = p.shape
            n = p @ p.T if a < b else p.T @ p
            estimate = power_iteration(n, sub, niters, bs)
        else:
            estimate = _svd_lowrank_sq(p, sub, dim, niters)
        total = total + estimate
    return total / proba
