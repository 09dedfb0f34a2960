"""Property/fuzz tests for the diffq entry codec (docs/diffq_format.md
assumptions A2-A5): encoder->decoder round-trips over the full group-size and
bit-depth ranges, every scale layout the decoder claims to understand
(packed (G,2) affine, (min,max)-tuple affine, signed symmetric max-abs),
per-group learned bit arrays, float bits, and the degenerate groups
(constant values, group_size=0 whole-tensor groups)."""

import numpy as np
import pytest

from demucs_tpu.zoo.diffq import dequantize_entry, quantize_entry


def _roundtrip_bound(arr, group_size, bits):
    """Max |error| of uniform [min,max]-range quantization: half a step per
    group."""
    flat = arr.reshape(-1, group_size) if group_size else arr.reshape(1, -1)
    span = flat.max(-1) - flat.min(-1)
    nlev = 2.0 ** np.broadcast_to(np.asarray(bits, np.float64),
                                  (flat.shape[0],)) - 1.0
    return (span / nlev / 2.0 + 1e-7).max()


@pytest.mark.parametrize("group_size", [0, 3, 4, 8, 16, 64])
@pytest.mark.parametrize("bits", [1, 2, 4, 8, 9, 15])
def test_affine_roundtrip_group_bits_grid(group_size, bits):
    rng = np.random.default_rng(group_size * 100 + bits)
    n = 192  # divisible by every group size above
    arr = (rng.standard_normal(n) * rng.uniform(0.01, 10)).astype(np.float32)
    entry = quantize_entry(arr, group_size, bits)
    out = dequantize_entry(entry, arr.shape, {})
    assert out.dtype == np.float32 and out.shape == arr.shape
    bound = _roundtrip_bound(arr.astype(np.float64), group_size, bits)
    assert np.abs(out - arr).max() <= bound, (group_size, bits)
    # level storage dtype per A3
    assert entry[0].dtype == (np.uint8 if bits <= 8 else np.int16)


def test_per_group_learned_bits():
    """DiffQuantizer stores one learned bit depth per group (A2)."""
    rng = np.random.default_rng(0)
    arr = rng.standard_normal((8, 16)).astype(np.float32)
    bits = rng.integers(1, 16, size=arr.size // 8)
    entry = quantize_entry(arr, 8, bits)
    out = dequantize_entry(entry, arr.shape, {})
    flat = arr.reshape(-1, 8).astype(np.float64)
    span = flat.max(-1) - flat.min(-1)
    bound = span / (2.0 ** bits - 1.0) / 2.0 + 1e-7
    err = np.abs(out.reshape(-1, 8) - flat).max(-1)
    assert (err <= bound).all()


def test_float_bits_decode():
    """diffq's learned bits are floats before rounding; the decoder must
    accept non-integer bits arrays."""
    rng = np.random.default_rng(1)
    arr = rng.standard_normal(32).astype(np.float32)
    levels, scales, bits = quantize_entry(arr, 8, 6)
    out_int = dequantize_entry((levels, scales, bits), arr.shape, {})
    out_float = dequantize_entry((levels, scales, bits.astype(np.float32)),
                                 arr.shape, {})
    np.testing.assert_allclose(out_float, out_int, rtol=1e-6)


def test_uniform_quantizer_two_entry_layout():
    """UniformQuantizer entries are (levels, scales) with bits taken from
    meta.init_kwargs (A2)."""
    rng = np.random.default_rng(2)
    arr = rng.standard_normal(64).astype(np.float32)
    levels, scales, bits = quantize_entry(arr, 8, 5)
    out3 = dequantize_entry((levels, scales, bits), arr.shape, {})
    out2 = dequantize_entry((levels, scales), arr.shape, {"bits": 5})
    np.testing.assert_array_equal(out2, out3)
    # default bits when init_kwargs omits it is 8 — decodes without error
    out_d = dequantize_entry((levels, scales), arr.shape, {})
    assert out_d.shape == arr.shape


def test_min_max_tuple_scales_layout():
    """scales as a (min, max) TUPLE (A4 first branch) decodes identically to
    the packed (G, 2) array layout."""
    rng = np.random.default_rng(3)
    arr = rng.standard_normal(48).astype(np.float32)
    levels, scales, bits = quantize_entry(arr, 8, 7)
    mn, mx = scales[:, :1], scales[:, 1:]
    out_packed = dequantize_entry((levels, scales, bits), arr.shape, {})
    out_tuple = dequantize_entry((levels, (mn, mx), bits), arr.shape, {})
    np.testing.assert_array_equal(out_tuple, out_packed)


def test_symmetric_signed_layout():
    """Signed levels + one scale per group decode as symmetric max-abs
    (A4 second branch): w = levels * scale / (2**(bits-1) - 1)."""
    rng = np.random.default_rng(4)
    g, gs, bits = 6, 8, 8
    w = rng.standard_normal((g, gs))
    scale = np.abs(w).max(axis=-1, keepdims=True)
    q = np.round(w / scale * (2 ** (bits - 1) - 1)).astype(np.int16)
    out = dequantize_entry((q, scale.astype(np.float32),
                            np.full(g, bits, np.uint8)),
                           (g * gs,), {})
    want = (q * scale / (2 ** (bits - 1) - 1)).reshape(-1)
    np.testing.assert_allclose(out, want.astype(np.float32), rtol=1e-6)
    assert np.abs(out.reshape(g, gs) - w).max() <= (
        scale / (2 ** (bits - 1) - 1)).max()


def test_constant_groups_and_extremes():
    """Constant groups (span 0) must decode exactly; +/- extremes of each
    group land on the range endpoints."""
    arr = np.concatenate([
        np.full(8, 3.25, np.float32),          # constant group
        np.full(8, -1e-30, np.float32),        # tiny constant
        np.linspace(-5, 5, 8).astype(np.float32),
    ])
    entry = quantize_entry(arr, 8, 8)
    out = dequantize_entry(entry, arr.shape, {})
    np.testing.assert_array_equal(out[:8], arr[:8])
    np.testing.assert_array_equal(out[8:16], arr[8:16])
    assert out[16] == arr[16] and out[23] == arr[23]  # range endpoints exact


def test_fuzz_random_layouts():
    """Randomized sweep: random group sizes / bit depths / value scales,
    including per-group bits, for 200 draws — the error bound must hold for
    every one (silent mis-decodes are the failure mode that bit round 2)."""
    rng = np.random.default_rng(99)
    for trial in range(200):
        gs = int(rng.choice([0, 3, 4, 5, 8, 12, 16]))
        n = (gs or 4) * int(rng.integers(1, 9))
        arr = (rng.standard_normal(n) *
               10.0 ** rng.uniform(-6, 4)).astype(np.float32)
        if rng.random() < 0.5 or gs == 0:
            bits = int(rng.integers(1, 16))
        else:
            bits = rng.integers(1, 16, size=n // gs)
        entry = quantize_entry(arr, gs, bits)
        out = dequantize_entry(entry, arr.shape, {})
        bound = _roundtrip_bound(arr.astype(np.float64), gs, bits)
        assert np.abs(out - arr).max() <= bound, (trial, gs, bits)


def test_rejects_ambiguous_and_overflow():
    arr = np.zeros(16, np.float32)
    with pytest.raises(ValueError, match="ambiguous"):
        quantize_entry(arr, 2, 8)
    with pytest.raises(ValueError, match="bits"):
        quantize_entry(arr, 8, 16)
    with pytest.raises(ValueError, match="bits"):
        quantize_entry(arr, 8, 0)
