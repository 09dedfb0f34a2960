"""Sparse-attention mask builders: parity vs the reference mask construction
(diag/jmask/global exactly; random distributionally), and the masked-attention
HTDemucs variant runs."""

import numpy as np
import torch

import jax.numpy as jnp

from common import SOURCES, random_mix
from torchref import import_reference

from demucs_tpu.ops.sparse import get_elementary_mask, get_mask


def _ref_mask(kind, T1, T2, **kw):
    import_reference()
    from demucs.transformer import get_elementary_mask as ref_mask

    return ref_mask(
        T1, T2, kind,
        sparse_attn_window=kw.get("sparse_attn_window", 10),
        global_window=kw.get("global_window", 5),
        mask_random_seed=42,
        sparsity=kw.get("sparsity", 0.9),
        device="cpu",
    ).numpy()


def test_diag_jmask_global_match_reference():
    T1, T2 = 57, 43
    for kind in ("diag", "jmask", "global"):
        want = _ref_mask(kind, T1, T2)
        got = get_elementary_mask(T1, T2, kind, 10, 5, 42, 0.9)
        np.testing.assert_array_equal(got, want), kind


def test_random_mask_density():
    mask = get_elementary_mask(200, 100, "random", 10, 5, 42, 0.9)
    density = mask.mean()
    assert 0.05 < density < 0.15  # keep-prob = 1 - sparsity


def test_combined_mask_is_union():
    m = get_mask(64, 64, "diag_global", 3, 4, 42, 0.9)
    md = get_elementary_mask(64, 64, "diag", 3, 4, 42, 0.9)
    mg = get_elementary_mask(64, 64, "global", 3, 4, 42, 0.9)
    np.testing.assert_array_equal(m, md | mg)


def test_dynamic_buckets_match_reference():
    """Our LSH bucket ids equal the reference's _compute_buckets given the
    same tokens and projections (demucs/transformer.py:818-824)."""
    import_reference()
    from demucs.transformer import _compute_buckets as ref_buckets

    import jax.numpy as jnp
    from demucs_tpu.ops.sparse import compute_buckets

    rng = np.random.default_rng(7)
    x = rng.standard_normal((3, 50, 16)).astype(np.float32)
    R = rng.standard_normal((1, 16, 32, 2)).astype(np.float32)

    want = ref_buckets(torch.from_numpy(x), torch.from_numpy(R)).numpy()  # (B, T, h)
    got = np.asarray(compute_buckets(jnp.asarray(x), jnp.asarray(R[0])))  # (B, h, T)
    np.testing.assert_array_equal(got.transpose(0, 2, 1), want)


def test_dynamic_keep_mask_density_and_diag():
    """Keep density >= the target (ties kept) and close to it; identical
    q/k tokens collide in every hash round so the diagonal is always kept."""
    import jax
    import jax.numpy as jnp
    from demucs_tpu.ops.sparse import dynamic_sparse_keep_mask

    rng = np.random.default_rng(3)
    B, T, C, H = 2, 128, 32, 4
    q = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    sparsity = 0.9
    keep = np.asarray(dynamic_sparse_keep_mask(
        q, q, H, sparsity, jax.random.PRNGKey(0)))
    assert keep.shape == (B, H, T, T)
    # Self tokens hash identically -> diagonal kept in every head.
    assert keep[:, :, np.arange(T), np.arange(T)].all()
    density = keep.mean()
    assert (1 - sparsity) - 1e-6 <= density < 3.5 * (1 - sparsity)


def test_auto_sparsity_htdemucs_runs():
    from demucs_tpu.models import htdemucs as jht

    cfg = jht.HTDemucsConfig(
        sources=tuple(SOURCES), channels=16, depth=4, nfft=2048,
        t_layers=2, t_heads=4, segment=0.5, samplerate=8000,
        t_sparse_self_attn=True, t_sparse_cross_attn=True,
        t_auto_sparsity=True, t_sparsity=0.9,
    )
    params = jht.init_htdemucs(cfg)
    mix = random_mix((1, 2, cfg.training_length), seed=51)
    out = np.asarray(jht.forward(params, jnp.asarray(mix), cfg))
    assert out.shape == (1, 4, 2, cfg.training_length)
    assert np.isfinite(out).all()
    # Deterministic at eval (fixed-seed projections).
    out2 = np.asarray(jht.forward(params, jnp.asarray(mix), cfg))
    np.testing.assert_array_equal(out, out2)


def test_sparse_htdemucs_runs():
    from demucs_tpu.models import htdemucs as jht

    cfg = jht.HTDemucsConfig(
        sources=tuple(SOURCES), channels=16, depth=4, nfft=2048,
        t_layers=2, t_heads=4, segment=0.5, samplerate=8000,
        t_sparse_self_attn=True, t_mask_type="diag_global",
        t_sparse_attn_window=20, t_global_window=8,
    )
    params = jht.init_htdemucs(cfg)
    mix = random_mix((1, 2, cfg.training_length), seed=50)
    out = np.asarray(jht.forward(params, jnp.asarray(mix), cfg))
    assert out.shape == (1, 4, 2, cfg.training_length)
    assert np.isfinite(out).all()
