"""Pallas flash-attention parity vs the reference einsum attention
(interpret mode on CPU; the same kernel compiles for TPU via Mosaic)."""

import numpy as np
import pytest

import jax.numpy as jnp

from demucs_tpu.ops.attention import multihead_attention
from demucs_tpu.ops.pallas.attention import flash_mha


@pytest.mark.parametrize(
    "B,Tq,Tk,C,H",
    [
        (2, 256, 256, 64, 4),     # aligned self
        (1, 300, 300, 64, 4),     # ragged self
        (2, 260, 130, 128, 8),    # ragged cross (Tq != Tk)
    ],
)
def test_flash_matches_reference(B, Tq, Tk, C, H):
    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, Tq, C)).astype(np.float32)
    k = rng.standard_normal((B, Tk, C)).astype(np.float32)
    v = rng.standard_normal((B, Tk, C)).astype(np.float32)

    want = np.asarray(multihead_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), H))
    got = np.asarray(flash_mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), H,
                               block_q=128, block_k=128, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("mask_type", ["diag", "jmask", "random", "global"])
def test_flash_mask_matches_reference(mask_type):
    """Boolean keep-masks (the static sparse-attention variants) through the
    kernel == the dense -inf path, incl. blocks that are fully masked."""
    from demucs_tpu.ops.sparse import get_mask

    B, T, C, H = 1, 300, 64, 4
    rng = np.random.default_rng(1)
    q = rng.standard_normal((B, T, C)).astype(np.float32)
    k = rng.standard_normal((B, T, C)).astype(np.float32)
    v = rng.standard_normal((B, T, C)).astype(np.float32)
    mask = get_mask(T, T, mask_type, sparse_attn_window=50, global_window=20,
                    mask_random_seed=42, sparsity=0.9)

    want = np.asarray(multihead_attention(jnp.asarray(q), jnp.asarray(k),
                                          jnp.asarray(v), H, mask=mask))
    got = np.asarray(flash_mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                               H, mask=jnp.asarray(mask),
                               block_q=128, block_k=128, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_flash_mask_fully_masked_first_block():
    """A row whose first key block is entirely masked must not poison the
    online softmax (-inf-safe rescaling)."""
    B, T, C, H = 1, 256, 64, 4
    rng = np.random.default_rng(2)
    q = rng.standard_normal((B, T, C)).astype(np.float32)
    k = rng.standard_normal((B, T, C)).astype(np.float32)
    v = rng.standard_normal((B, T, C)).astype(np.float32)
    mask = np.ones((T, T), bool)
    mask[:, :128] = False  # first 128-key block fully masked for every row

    want = np.asarray(multihead_attention(jnp.asarray(q), jnp.asarray(k),
                                          jnp.asarray(v), H, mask=jnp.asarray(mask)))
    got = np.asarray(flash_mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                               H, mask=jnp.asarray(mask),
                               block_q=128, block_k=128, interpret=True))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_flash_dropout_statistics():
    """In-kernel dropout: eval==no-drop; train drops ~rate of attention mass
    and rescales so the output is an unbiased estimate of the eval output."""
    import jax

    B, T, C, H = 2, 256, 64, 4
    rate = 0.3
    rng = np.random.default_rng(3)
    q = rng.standard_normal((B, T, C)).astype(np.float32)
    k = rng.standard_normal((B, T, C)).astype(np.float32)
    # v == 1 everywhere: eval output is exactly 1 (probs sum to 1); with
    # dropout the output per position is sum(dropped probs)/(1-rate), whose
    # mean over positions must stay ~1 and variance must be > 0.
    v = np.ones((B, T, C), np.float32)

    base = np.asarray(flash_mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                H, block_q=128, block_k=128, interpret=True))
    np.testing.assert_allclose(base, 1.0, atol=1e-5)

    seed = jnp.asarray(1234, jnp.int32)
    drop = np.asarray(flash_mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                H, dropout=rate, dropout_seed=seed,
                                block_q=128, block_k=128, interpret=True))
    assert not np.allclose(drop, 1.0)
    assert abs(drop.mean() - 1.0) < 0.02       # unbiased
    assert drop.std() > 0.01                   # actually dropping

    # deterministic per seed, decorrelated across seeds
    drop2 = np.asarray(flash_mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                 H, dropout=rate, dropout_seed=seed,
                                 block_q=128, block_k=128, interpret=True))
    np.testing.assert_array_equal(drop, drop2)
    drop3 = np.asarray(flash_mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                 H, dropout=rate,
                                 dropout_seed=jnp.asarray(99, jnp.int32),
                                 block_q=128, block_k=128, interpret=True))
    assert not np.array_equal(drop, drop3)


def test_flash_layer_routing_with_dropout_and_mask():
    """transformer._attn routes mask+rng through the kernel (no silent dense
    fallback): flash train-mode output differs from eval but stays finite."""
    import jax

    from demucs_tpu.models.transformer import _attn

    C, H = 64, 4
    rng = np.random.default_rng(4)
    p = {
        "in_proj_weight": jnp.asarray(rng.standard_normal((3 * C, C)) * 0.1,
                                      jnp.float32),
        "in_proj_bias": jnp.zeros((3 * C,), jnp.float32),
        "out_proj": {
            "weight": jnp.asarray(rng.standard_normal((C, C)) * 0.1, jnp.float32),
            "bias": jnp.zeros((C,), jnp.float32),
        },
    }
    x = jnp.asarray(rng.standard_normal((1, 256, C)), jnp.float32)
    mask = jnp.asarray(np.triu(np.ones((256, 256), bool)))

    import demucs_tpu.ops.pallas.attention as pa

    old = pa._INTERPRET
    pa._INTERPRET = True
    try:
        ev_flash = np.asarray(_attn(p, x, x, x, H, flash=True, mask=mask))
        ev_dense = np.asarray(_attn(p, x, x, x, H, flash=False, mask=mask))
        np.testing.assert_allclose(ev_flash, ev_dense, atol=2e-5, rtol=1e-4)

        key = jax.random.PRNGKey(0)
        tr = np.asarray(_attn(p, x, x, x, H, flash=True, mask=mask, rng=key,
                              dropout=0.2))
        assert np.isfinite(tr).all()
        assert not np.allclose(tr, ev_flash)
    finally:
        pa._INTERPRET = old
