"""Stacked single-chip bag pass vs the sequential engine / host engine.

The stacked pass folds every (member, shift pass) of a homogeneous bag into
ONE device program with merged member-axis forward batches
(engine._build_stacked_bag_fn). Measured round 5: XLA's conv lowering is
program-context-dependent — the SAME forward in a restructured program
deviates ~1.5e-8 (XLA:CPU fp32) / ~4.8e-5 (TPU default 1-pass-bf16 class) —
so no fused program can be bitwise-equal to the sequential per-pass
executables; these tests pin the stacked pass to the sequential engine at
the measured CPU bound and to the host engine at the standard device-engine
tolerance."""

import numpy as np
import pytest

from common import SOURCES, make_htdemucs_pair, random_mix

from demucs_tpu.inference.apply import apply_model
from demucs_tpu.inference.engine import device_apply_model
from demucs_tpu.models import htdemucs as ht
from demucs_tpu.models.registry import BagOfModels, Model


class _FixedOffsets:
    def __init__(self, values):
        self.values = list(values)

    def randint(self, a, b):
        v = self.values.pop(0)
        assert a <= v <= b
        return v


@pytest.fixture(scope="module")
def bag():
    _, cfg, params = make_htdemucs_pair()
    members = [Model("htdemucs", cfg, params),
               Model("htdemucs", cfg, ht.init_htdemucs(cfg, seed=11)),
               Model("htdemucs", cfg, ht.init_htdemucs(cfg, seed=12))]
    weights = [[1.0, 0.5, 1.0, 2.0],
               [0.0, 1.0, 1.0, 1.0],
               [1.0, 1.0, 0.0, 0.5]]
    return BagOfModels(members, weights)


def _snr(a, b):
    sig = float(np.mean(a ** 2))
    err = float(np.mean((a - b) ** 2))
    return 10 * np.log10(sig / max(err, 1e-30))


def test_stacked_matches_sequential_engine(bag):
    """One-program stacked bag vs the sequential member loop, same offsets:
    agreement at the measured CPU cross-program bound (~1.5e-8 abs — assert
    an order of magnitude of slack), and the per-member per-source weights
    are applied identically."""
    L = int(1.7 * bag.models[0].segment * bag.models[0].samplerate)
    mix = random_mix((1, 2, L), seed=21)
    offs = [1500, 300, 2200]
    seq = device_apply_model(bag, mix, shifts=1, transfer_dtype=None,
                             input_transfer_dtype=None,
                             rng=_FixedOffsets(list(offs)),
                             bag_mode="sequential")
    stk = device_apply_model(bag, mix, shifts=1, transfer_dtype=None,
                             input_transfer_dtype=None,
                             rng=_FixedOffsets(list(offs)),
                             bag_mode="stacked")
    assert stk.shape == seq.shape == (1, len(SOURCES), 2, L)
    np.testing.assert_allclose(stk, seq, atol=2e-7, rtol=1e-5)
    assert _snr(seq, stk) > 110, _snr(seq, stk)


def test_stacked_matches_host_engine_multi_shift(bag):
    """shifts=2 (member-major draw order) vs the host engine at the standard
    device-engine tolerance."""
    L = int(1.3 * bag.models[0].segment * bag.models[0].samplerate)
    mix = random_mix((1, 2, L), seed=22)
    offs = [900, 2500, 100, 1800, 2000, 700]  # member-major (m0s0 m0s1 m1s0…)
    want = apply_model(bag, mix, shifts=2, engine="host",
                       rng=_FixedOffsets(list(offs)))
    got = device_apply_model(bag, mix, shifts=2, transfer_dtype=None,
                             input_transfer_dtype=None,
                             rng=_FixedOffsets(list(offs)),
                             bag_mode="stacked")
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_auto_routes_homogeneous_bag_to_stacked(bag, monkeypatch):
    """bag_mode='auto' takes the stacked path for eligible bags (observed via
    the builder's lru cache) and produces the same stems."""
    from demucs_tpu.inference import engine as E

    L = int(1.2 * bag.models[0].segment * bag.models[0].samplerate)
    mix = random_mix((1, 2, L), seed=23)
    hits_and_misses = E._build_stacked_bag_fn.cache_info()
    auto = device_apply_model(bag, mix, shifts=0, transfer_dtype=None,
                              input_transfer_dtype=None)
    after = E._build_stacked_bag_fn.cache_info()
    assert (after.misses + after.hits
            > hits_and_misses.misses + hits_and_misses.hits)
    stk = device_apply_model(bag, mix, shifts=0, transfer_dtype=None,
                             input_transfer_dtype=None, bag_mode="stacked")
    np.testing.assert_array_equal(auto, stk)


def test_stacked_raises_on_ineligible_bag():
    from demucs_tpu.zoo.pretrained import demucs_unittest

    m = demucs_unittest()
    inhomog = BagOfModels([m, m])  # hdemucs: length-dependent leaf targets
    mix = random_mix((1, 2, 44100), seed=2)
    with pytest.raises(ValueError, match="bag_mode='stacked'"):
        device_apply_model(inhomog, mix, shifts=0, segment=0.5,
                           transfer_dtype=None, input_transfer_dtype=None,
                           bag_mode="stacked")
    # but auto quietly keeps the sequential exact-tails path
    out = device_apply_model(inhomog, mix, shifts=0, segment=0.5,
                             transfer_dtype=None, input_transfer_dtype=None)
    want = apply_model(inhomog, mix, shifts=0, segment=0.5, engine="host")
    np.testing.assert_allclose(out, want, atol=2e-5, rtol=1e-4)


def test_stacked_uniform_tail_mode_hdemucs_bag():
    """tail_mode='uniform' makes non-htdemucs homogeneous bags eligible; the
    stacked pass matches the sequential engine's uniform-target pass."""
    from demucs_tpu.zoo.pretrained import demucs_unittest

    m = demucs_unittest()
    m2 = demucs_unittest()
    bag2 = BagOfModels([m, m2], [[1.0, 1.0, 1.0, 1.0], [0.5, 1.0, 0.0, 1.0]])
    mix = random_mix((1, 2, 60000), seed=3)
    seq = device_apply_model(bag2, mix, shifts=0, segment=0.5,
                             transfer_dtype=None, input_transfer_dtype=None,
                             tail_mode="uniform", bag_mode="sequential")
    stk = device_apply_model(bag2, mix, shifts=0, segment=0.5,
                             transfer_dtype=None, input_transfer_dtype=None,
                             tail_mode="uniform", bag_mode="stacked")
    np.testing.assert_allclose(stk, seq, atol=2e-7, rtol=1e-5)
