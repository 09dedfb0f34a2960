"""bf16 compute-dtype policy: runs, right shapes, and close to the fp32 path.

The quality gate for production bf16 use is SDR (bench-side); here we check
the numeric drift on random weights stays in the expected bf16 regime.
"""

import dataclasses

import numpy as np

import jax

from common import make_htdemucs_pair, random_mix

from demucs_tpu.models import htdemucs as jht


def test_bf16_close_to_fp32():
    _, cfg, params = make_htdemucs_pair()
    L = cfg.training_length
    mix = random_mix((1, 2, L), seed=20)

    f32 = np.asarray(jax.jit(jht.forward, static_argnames=("cfg",))(params, mix, cfg))
    cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    bf16 = np.asarray(jax.jit(jht.forward, static_argnames=("cfg",))(params, mix, cfg16))

    assert bf16.shape == f32.shape
    assert bf16.dtype == np.float32  # outputs stay fp32
    # Signal-to-error ratio of the bf16 path vs fp32 (nsdr-style)
    num = np.sum(f32**2) + 1e-7
    den = np.sum((f32 - bf16) ** 2) + 1e-7
    ser_db = 10 * np.log10(num / den)
    assert ser_db > 20, ser_db
