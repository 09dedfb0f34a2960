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
