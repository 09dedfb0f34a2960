"""Serving warm path: pinned shift offsets + Separator.prewarm.

Exact-tail kinds compile a tail executable per (track length, shift offset)
— ~75 s first load each on this deployment's relay — so serving with random
shifts stalls on unseen offsets (BENCHMARKS.md zoo notes). The pinned-offset
set must (a) reproduce the exact random-draw numerics for the same offsets,
(b) reset per track so every track consumes the same sequence, and (c) make
prewarm() compile every executable a later request needs."""

import numpy as np
import pytest

from common import make_htdemucs_pair, random_mix

from demucs_tpu.inference.apply import apply_model, apply_model_tracks
from demucs_tpu.inference.prewarm import PinnedShifts, prewarm
from demucs_tpu.models.registry import Model
from demucs_tpu.zoo.pretrained import demucs_unittest


def test_pinned_shifts_cycle_reset_and_range():
    rng = PinnedShifts([5, 11])
    assert [rng.randint(0, 100) for _ in range(5)] == [5, 11, 5, 11, 5]
    rng.reset()
    assert rng.randint(0, 100) == 5
    with pytest.raises(ValueError):
        rng.randint(0, 3)  # 5 > max_shift: wrong samplerate/offset pairing
    with pytest.raises(ValueError):
        PinnedShifts([])
    with pytest.raises(ValueError):
        PinnedShifts([-1])


@pytest.fixture(scope="module")
def ht_model():
    _, cfg, params = make_htdemucs_pair()
    return Model("htdemucs", cfg, params)


def test_shift_offsets_match_random_draws(ht_model):
    """apply_model(shift_offsets=...) is bit-identical to the random path
    seeded to draw those exact offsets (a pinned offset IS a specific draw)."""
    import random

    L = int(1.6 * ht_model.segment * ht_model.samplerate)
    mix = random_mix((1, 2, L), seed=5)
    seeded = random.Random(123)
    offsets = [seeded.randint(0, int(0.5 * ht_model.samplerate))
               for _ in range(2)]
    want = apply_model(ht_model, mix, shifts=2, engine="host",
                       rng=random.Random(123))
    got = apply_model(ht_model, mix, shifts=2, engine="host",
                      shift_offsets=offsets)
    np.testing.assert_array_equal(got, want)
    with pytest.raises(ValueError, match="not both"):
        apply_model(ht_model, mix, shifts=1, engine="host",
                    rng=random.Random(0), shift_offsets=offsets)


def test_shift_offsets_reset_per_track(ht_model):
    """Every track of a pipelined batch consumes the pinned set from the
    start — track 2 equals a solo run with the same offsets."""
    L = int(1.3 * ht_model.segment * ht_model.samplerate)
    mixes = [random_mix((1, 2, L), seed=s) for s in (7, 8)]
    offsets = (1000, int(0.4 * ht_model.samplerate))
    outs = list(apply_model_tracks(ht_model, mixes, shifts=2, engine="host",
                                   shift_offsets=offsets))
    solo = apply_model(ht_model, mixes[1], shifts=2, engine="host",
                       shift_offsets=offsets)
    np.testing.assert_array_equal(outs[1], solo)


def test_prewarm_compiles_tail_programs_for_pinned_offsets():
    """After prewarm, a real request at a warmed length + pinned offsets
    builds NO new executables (lru caches of the engine's builders hold)."""
    from demucs_tpu.inference import engine as E

    model = demucs_unittest()  # hdemucs: length-dependent leaf targets
    dur = 1.5
    offsets = (3000, 12000)
    segment = 1.0  # force multi-chunk + ragged tail at this short length
    report = prewarm(model, dur, shifts=1, shift_offsets=offsets,
                     segment=segment, engine="device", batch_size=4)
    assert report[0]["tails_warmed"] is True
    assert report[0]["samples"] == int(dur * 44100)

    before = (E._build_tail_fn.cache_info().misses,
              E._build_full_fn.cache_info().misses,
              E._build_norm_fn.cache_info().misses)
    mix = random_mix((1, 2, int(dur * 44100)), seed=3)
    out = apply_model(model, mix, shifts=1, segment=segment, engine="device",
                      batch_size=4, shift_offsets=offsets)
    after = (E._build_tail_fn.cache_info().misses,
             E._build_full_fn.cache_info().misses,
             E._build_norm_fn.cache_info().misses)
    assert after == before, (before, after)
    assert out.shape == (1, 4, 2, int(dur * 44100))

    # and the warm-path output still matches the host engine bit-for-bit
    want = apply_model(model, mix, shifts=1, segment=segment, engine="host",
                       shift_offsets=offsets)
    np.testing.assert_allclose(out, want, atol=2e-5, rtol=1e-4)


def test_prewarm_flags_unwarmable_random_tails():
    model = demucs_unittest()
    report = prewarm(model, 0.6, shifts=1, shift_offsets=None,
                     segment=0.5, engine="host", batch_size=4)
    assert report[0]["tails_warmed"] is False
    report0 = prewarm(model, 0.6, shifts=0, shift_offsets=None,
                      segment=0.5, engine="host", batch_size=4)
    assert report0[0]["tails_warmed"] is True  # shifts=0: tails are static


def test_separator_prewarm_and_pinned_separation(monkeypatch):
    from demucs_tpu import api

    model = demucs_unittest()
    monkeypatch.setattr(api, "get_model", lambda name, repo=None: model)
    sep = api.Separator(model="tiny", device="cpu", shifts=1,
                        segment=1.0, batch_size=4, engine="device",
                        shift_offsets=(2500, 8000))
    report = sep.prewarm(1.2)
    assert report[0]["tails_warmed"] is True
    wav = random_mix((2, int(1.2 * 44100)), seed=9)
    _, stems = sep.separate_tensor(wav)
    assert set(stems) == {"drums", "bass", "other", "vocals"}
    # deterministic under pinning: a second run is bit-identical
    _, stems2 = sep.separate_tensor(wav)
    for k in stems:
        np.testing.assert_array_equal(stems[k], stems2[k])


def test_prewarm_covers_stacked_bag_program():
    """The flagship serving case: prewarming a homogeneous htdemucs bag
    compiles the stacked-member program (bag_mode auto), so the first real
    request builds nothing new."""
    from common import make_htdemucs_pair

    from demucs_tpu.inference import engine as E
    from demucs_tpu.models import htdemucs as ht
    from demucs_tpu.models.registry import BagOfModels, Model

    _, cfg, params = make_htdemucs_pair()
    bag = BagOfModels([Model("htdemucs", cfg, params),
                       Model("htdemucs", cfg, ht.init_htdemucs(cfg, seed=21))])
    dur = 1.5 * float(cfg.segment)
    offsets = (500, 2500)
    prewarm(bag, dur, shifts=1, shift_offsets=offsets, engine="device",
            batch_size=4)

    before = E._build_stacked_bag_fn.cache_info().misses
    mix = random_mix((1, 2, int(dur * cfg.samplerate)), seed=6)
    out = apply_model(bag, mix, shifts=1, engine="device", batch_size=4,
                      shift_offsets=offsets)
    after = E._build_stacked_bag_fn.cache_info().misses
    assert after == before  # the stacked program was prewarmed
    assert out.shape[-1] == mix.shape[-1]
