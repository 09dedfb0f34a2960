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

__all__ = ["get_elementary_mask", "get_mask", "compute_buckets",
           "dynamic_sparse_keep_mask"]


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


# ---------------------------------------------------------------------------
# LSH dynamic sparse attention (t_auto_sparsity)
# Behavioral reference: ``demucs/transformer.py:818-839`` —
# ``dynamic_sparse_attention`` hashes q/k tokens into buckets via random
# projections (n_hashes=32 rounds, proj_size=4 buckets per round: 2 gaussian
# projections, argmax over [p, -p]), then attends only where buckets collide
# often enough to hit the target sparsity. The reference routes the selected
# locations through unreleased xformers CUDA kernels; on TPU we count
# collisions with one MXU matmul over one-hot bucket codes and keep, per
# query, the keys with the top (1-sparsity) collision counts — the scores
# then flow through the ordinary dense-masked attention (at these sequence
# lengths the dense path beats block-sparse bookkeeping; see the
# flash-attention verdict in BENCHMARKS.md).
# ---------------------------------------------------------------------------


def compute_buckets(x, R):
    """LSH bucket ids for per-head tokens (transformer.py:818-824 semantics).

    Args:
        x: ``(N, T, d)`` tokens (N = batch*heads folded).
        R: ``(d, n_hashes, proj_size // 2)`` gaussian projections, shared
           across N like the reference's broadcast leading dim.
    Returns:
        int32 ``(N, n_hashes, T)`` bucket ids in ``[0, proj_size)``.
    """
    import jax.numpy as jnp

    qq = jnp.einsum("ntf,fhi->nhti", x, R)
    qq = jnp.concatenate([qq, -qq], axis=-1)
    return jnp.argmax(qq, axis=-1).astype(jnp.int32)


def dynamic_sparse_keep_mask(q, k, num_heads: int, sparsity: float, rng,
                             n_hashes: int = 32, proj_size: int = 4):
    """Boolean keep-mask ``(B, H, Tq, Tk)`` from LSH bucket collisions.

    Per query row, keeps the ``max(1, round((1-sparsity)*Tk))`` keys with the
    highest collision counts over the hash rounds (ties at the threshold are
    all kept, so realized density is >= the target, never below — the
    reference's exact tie policy lives in the unreleased
    ``xformers.ops.find_locations`` and is unspecified). A key identical to
    its query collides in every round, so self-attention always keeps the
    diagonal.
    """
    import jax
    import jax.numpy as jnp

    B, Tq, C = q.shape
    Tk = k.shape[1]
    d = C // num_heads
    R = jax.random.normal(rng, (d, n_hashes, proj_size // 2), dtype=jnp.float32)

    def fold(x, T):
        xh = x.reshape(B, T, num_heads, d).transpose(0, 2, 1, 3)
        return xh.reshape(B * num_heads, T, d).astype(jnp.float32)

    bq = compute_buckets(fold(q, Tq), R)  # (N, n_hashes, Tq)
    bk = compute_buckets(fold(k, Tk), R)
    # Collision counts via one MXU matmul over one-hot codes flattened to a
    # (n_hashes * proj_size) contraction dim; counts <= n_hashes are exact in
    # bf16 up to 256.
    oq = jax.nn.one_hot(bq, proj_size, dtype=jnp.bfloat16)  # (N, h, Tq, p)
    ok = jax.nn.one_hot(bk, proj_size, dtype=jnp.bfloat16)
    # counts stay in bf16: integers <= n_hashes (32) are exact, and the
    # (N, Tq, Tk) tensor is the dominant memory term at released widths.
    counts = jnp.einsum("nhqp,nhkp->nqk", oq, ok,
                        preferred_element_type=jnp.bfloat16)
    k_keep = max(1, int(round((1.0 - sparsity) * Tk)))
    thresh = jax.lax.top_k(counts, k_keep)[0][..., -1:]
    keep = counts >= thresh
    return keep.reshape(B, num_heads, Tq, Tk)
