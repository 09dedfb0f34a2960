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


def test_mixed_policy_cpu_equals_fp32():
    """compute_dtype='mixed' keeps fp32 storage and only changes the MXU
    matmul algorithm — on CPU (which executes true fp32 regardless of the
    precision hint) the output is bit-identical to the fp32 path."""
    _, cfg, params = make_htdemucs_pair()
    L = cfg.training_length
    mix = random_mix((1, 2, L), seed=21)
    f32 = np.asarray(jax.jit(jht.forward, static_argnames=("cfg",))(
        params, mix, cfg))
    cfgm = dataclasses.replace(cfg, compute_dtype="mixed")
    mixed = np.asarray(jax.jit(jht.forward, static_argnames=("cfg",))(
        params, mix, cfgm))
    np.testing.assert_array_equal(mixed, f32)


def test_bf16_stage_set_equivalence_and_validation():
    """bf16_stages=(all stages) is bit-identical to compute_dtype='bfloat16';
    unknown stage names and dtypes raise."""
    import pytest

    _, cfg, params = make_htdemucs_pair()
    L = cfg.training_length
    mix = random_mix((1, 2, L), seed=22)
    cfg_all = dataclasses.replace(cfg, compute_dtype="bfloat16")
    cfg_stages = dataclasses.replace(cfg, bf16_stages=jht._STAGES)
    a = np.asarray(jax.jit(jht.forward, static_argnames=("cfg",))(
        params, mix, cfg_all))
    b = np.asarray(jax.jit(jht.forward, static_argnames=("cfg",))(
        params, mix, cfg_stages))
    np.testing.assert_array_equal(a, b)

    with pytest.raises(ValueError, match="bf16_stages"):
        jht.forward(params, mix,
                    dataclasses.replace(cfg, bf16_stages=("bogus",)))
    with pytest.raises(ValueError, match="compute_dtype"):
        jht.forward(params, mix,
                    dataclasses.replace(cfg, compute_dtype="float8"))
    with pytest.raises(ValueError, match="precision_stages"):
        jht.forward(params, mix, dataclasses.replace(
            cfg, precision_stages=(("bogus", "highest"),)))


def test_partial_bf16_stage_runs():
    """A single-stage bf16 policy (transformer only) runs end-to-end, stays
    fp32 at the output, and drifts less than the all-bf16 path."""
    _, cfg, params = make_htdemucs_pair()
    L = cfg.training_length
    mix = random_mix((1, 2, L), seed=23)
    f32 = np.asarray(jax.jit(jht.forward, static_argnames=("cfg",))(
        params, mix, cfg))
    cfg_t = dataclasses.replace(cfg, bf16_stages=("transformer",))
    out_t = np.asarray(jax.jit(jht.forward, static_argnames=("cfg",))(
        params, mix, cfg_t))
    cfg_all = dataclasses.replace(cfg, compute_dtype="bfloat16")
    out_all = np.asarray(jax.jit(jht.forward, static_argnames=("cfg",))(
        params, mix, cfg_all))
    assert out_t.dtype == np.float32

    def ser(ref, out):
        return 10 * np.log10(np.sum(ref**2) / (np.sum((ref - out) ** 2) + 1e-12))

    assert ser(f32, out_t) > ser(f32, out_all) + 3  # strictly better
