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
