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
                      conv_only: bool,
                      convtr_names: tp.FrozenSet[str] = frozenset(),
                      ) -> tp.List[jax.Array]:
    mats = []
    for name, p in flatten_state(params).items():
        if p.size / 2**18 < min_size:
            continue
        if p.ndim in (3, 4):
            # conv weight; transposed convs have (in, out, k...) layout. The
            # hybrid models name them ".conv_tr."; the v2 Demucs decoder's
            # live at positional paths (decoder.{i}.{pos}.weight), which
            # `convtr_names` enumerates (the reference checks isinstance
            # ConvTranspose1d, svd.py:58-61).
            if convtr and (".conv_tr." in name or name in convtr_names):
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


def convtr_names_for(model) -> tp.FrozenSet[str]:
    """Dotted param names of transposed-conv weights that are NOT named
    ``conv_tr`` in the pytree (Demucs v2's positional decoder entries)."""
    if getattr(model, "kind", None) != "demucs":
        return frozenset()
    from demucs_tpu.models.demucs import convtr_param_names

    return convtr_param_names(model.cfg)


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


def svd_total(params: dict, *, min_size: float = 0.1, dim: int = 1,
              niters: int = 2, powm: bool = False, convtr: bool = True,
              conv_only: bool = False, exact: bool = False, bs: int = 1,
              key: tp.Optional[jax.Array] = None,
              convtr_names: tp.FrozenSet[str] = frozenset()):
    """Unbiased-by-nothing penalty core: no host RNG, safe under jit (pass an
    explicit ``key`` for the randomized estimators)."""
    if key is None and not exact:
        raise ValueError("svd_total needs an explicit key for the "
                         "randomized estimators (exact=True needs none)")
    total = 0.0
    mats = _collect_matrices(params, min_size, convtr, conv_only, convtr_names)
    for i, p in enumerate(mats):
        if exact:
            s = jnp.linalg.svd(p, compute_uv=False)
            estimate = (s**2).max()
        elif powm:
            a, b = p.shape
            n = p @ p.T if a < b else p.T @ p
            estimate = power_iteration(n, jax.random.fold_in(key, i), niters, bs)
        else:
            estimate = _svd_lowrank_sq(p, jax.random.fold_in(key, i), dim, niters)
        total = total + estimate
    return total


def svd_penalty(params: dict, *, min_size: float = 0.1, dim: int = 1, niters: int = 2,
                powm: bool = False, convtr: bool = True, proba: float = 1.0,
                conv_only: bool = False, exact: bool = False, bs: int = 1,
                key: tp.Optional[jax.Array] = None,
                convtr_names: tp.FrozenSet[str] = frozenset()):
    """Sum of sigma_max^2 over large matrices (svd.py:31-83), with the
    reference's stochastic 1/proba-unbiased skip.

    NOT jit-safe: the proba skip (and the key fallback) use host-side RNG
    that would execute once at trace time and be baked into the compiled
    program. Inside a jitted loss, use :func:`svd_total` with an explicit
    key and decide the skip host-side (as the solver does)."""
    if penalty_rng.random() > proba:
        return 0.0
    if key is None and not exact:
        key = jax.random.PRNGKey(penalty_rng.randrange(2**31))
    return svd_total(params, min_size=min_size, dim=dim, niters=niters,
                     powm=powm, convtr=convtr, conv_only=conv_only,
                     exact=exact, bs=bs, key=key,
                     convtr_names=convtr_names) / proba
