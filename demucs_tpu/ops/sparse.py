"""Sparse attention masks for the "sparse" HTDemucs variants.

Behavioral reference: ``demucs/transformer.py:118-212`` — elementary masks
(``diag`` band, ``jmask`` triangular-number offsets, seeded ``random``
Bernoulli, ``global`` first-k rows/cols) combinable as "diag_jmask_random".
No released checkpoint enables these (conf/config.yaml:260-267), but the 9.20
dB paper variant does, so the capability is kept.

The reference routes the mask through xformers' CUDA sparse kernels; on TPU
the sequences are short (~2.7k tokens) and a dense additive mask feeding the
attention kernel is faster than block-sparse bookkeeping, so masks are built
dense (numpy, cached on static shapes) and applied as ``-inf`` biases.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = ["get_elementary_mask", "get_mask"]


def get_elementary_mask(T1: int, T2: int, mask_type: str, sparse_attn_window: int,
                        global_window: int, mask_random_seed: int,
                        sparsity: float) -> np.ndarray:
    """Boolean keep-mask of shape (T2, T1) (transformer.py:123-175)."""
    assert mask_type in ("diag", "jmask", "random", "global")

    if mask_type == "global":
        mask = np.zeros((T2, T1), dtype=bool)
        mask[:, :global_window] = True
        line_window = int(global_window * T2 / T1)
        mask[:line_window, :] = True
        return mask

    if mask_type == "diag":
        mask = np.zeros((T2, T1), dtype=bool)
        rows = np.arange(T2, dtype=np.float32)[:, None]
        # float32 arithmetic matches torch's default dtype at integer boundaries
        cols = (np.float32(T1 / T2) * rows
                + np.arange(-sparse_attn_window, sparse_attn_window + 1, dtype=np.float32))
        cols = np.clip(cols.astype(np.int64), 0, T1 - 1)
        np.put_along_axis(mask, cols, True, axis=1)
        return mask

    if mask_type == "jmask":
        mask = np.zeros((T2 + 2, T1 + 2), dtype=bool)
        rows = np.arange(T2 + 2, dtype=np.float32)[:, None]
        t = np.arange(0, int((2 * T1) ** 0.5 + 1))
        t = (t * (t + 1) / 2).astype(np.int64)
        t = np.concatenate([-t[::-1][:-1], t]).astype(np.float32)
        cols = np.clip((np.float32(T1 / T2) * rows + t).astype(np.int64), 0, T1 + 1)
        np.put_along_axis(mask, cols, True, axis=1)
        return mask[1:-1, 1:-1]

    # "random": seeded Bernoulli. The reference uses torch's generator; we use
    # numpy's — the *distribution* (iid keep-prob 1-sparsity) is identical,
    # the realization differs (acceptable: no released weights depend on it).
    rng = np.random.default_rng(mask_random_seed)
    return rng.random((T2, T1)) > sparsity


@functools.lru_cache(maxsize=32)
def get_mask(T1: int, T2: int, mask_type: str, sparse_attn_window: int,
             global_window: int, mask_random_seed: int, sparsity: float) -> np.ndarray:
    """Union of '_'-separated elementary masks (transformer.py:178-212),
    returned as a dense bool keep-mask (T2, T1)."""
    masks = [
        get_elementary_mask(T1, T2, kind, sparse_attn_window, global_window,
                            mask_random_seed, sparsity)
        for kind in mask_type.split("_")
    ]
    return np.stack(masks).sum(axis=0) > 0
