"""Device-resident engine vs host engine: identical numerics.

The device engine re-expresses segment extraction / overlap-add / shift &
bag averaging as one jitted program; outputs must match the host engine
(which is itself reference-parity-tested) to float32 tolerance.
"""


import numpy as np
import pytest

from common import make_htdemucs_pair, random_mix

from demucs_tpu.inference.apply import apply_model
from demucs_tpu.inference.engine import device_apply_model
from demucs_tpu.models.registry import BagOfModels, Model


class _FixedOffsets:
    def __init__(self, values):
        self.values = list(values)

    def randint(self, a, b):
        v = self.values.pop(0)
        assert a <= v <= b
        return v


@pytest.fixture(scope="module")
def model():
    _, cfg, params = make_htdemucs_pair()
    return Model("htdemucs", cfg, params)


def test_high_transition_power_edge_samples(model):
    """transition_power=3 drives the track-edge weight sums below any naive
    epsilon floor (regression: a 1e-12 clamp made the first/last samples
    thousands of times too small); the engine must divide by the true sum
    like the host engine does."""
    L = int(2.1 * model.segment * model.samplerate)
    mix = random_mix((1, 2, L), seed=34)
    want = apply_model(model, mix, shifts=0, split=True, overlap=0.25,
                       transition_power=3.0, engine="host")
    got = device_apply_model(model, mix, shifts=0, overlap=0.25,
                             transition_power=3.0, transfer_dtype=None,
                             input_transfer_dtype=None)
    edge = np.abs(want[..., 0]).max()
    assert edge > 0
    np.testing.assert_allclose(got[..., 0], want[..., 0],
                               atol=2e-5 * max(edge, 1.0), rtol=1e-3)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_auto_engine_exact_tails_no_train_segment(model, monkeypatch):
    """HTDemucs with use_train_segment=False pads leaf chunks to their
    natural length (host semantics); since the exact-tails mode, engine=
    'auto' routes it to the device engine on accelerators and matches the
    host engine on every chunk, including the ragged tail."""
    import dataclasses

    from demucs_tpu.inference import apply as apply_mod

    cfg2 = dataclasses.replace(model.cfg, use_train_segment=False)
    m2 = Model("htdemucs", cfg2, model.params)
    L = int(1.7 * model.segment * model.samplerate)
    mix = random_mix((1, 2, L), seed=35)

    monkeypatch.setattr(apply_mod, "_accelerator_backend", lambda: True)
    want = apply_model(m2, mix, shifts=0, split=True, engine="host")
    got = apply_model(m2, mix, shifts=0, split=True, engine="auto",
                      transfer_dtype=None)
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)
    # a train-segment model under the same monkeypatch routes to the
    # uniform-target pass and still matches
    got_ts = apply_model(model, mix, shifts=0, split=True, engine="auto",
                         transfer_dtype=None)
    want_ts = apply_model(model, mix, shifts=0, split=True, engine="host")
    np.testing.assert_allclose(got_ts, want_ts, atol=2e-5, rtol=1e-4)


def test_device_engine_rejects_sub_one_transition_power(model):
    mix = random_mix((1, 2, int(1.2 * model.segment * model.samplerate)), seed=36)
    with pytest.raises(AssertionError, match="transition_power"):
        apply_model(model, mix, shifts=0, split=True, engine="device",
                    transition_power=0.5)


@pytest.mark.parametrize("track_secs", [3.3, 1.2])
def test_device_engine_matches_host_split(model, track_secs):
    L = int(track_secs * model.segment * model.samplerate)
    mix = random_mix((1, 2, L), seed=30)
    want = apply_model(model, mix, shifts=0, split=True, overlap=0.25, engine="host")
    got = device_apply_model(model, mix, shifts=0, overlap=0.25,
                             transfer_dtype=None, input_transfer_dtype=None, batch_size=3)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_device_engine_matches_host_shifts(model):
    L = int(1.7 * model.segment * model.samplerate)
    mix = random_mix((1, 2, L), seed=31)
    offsets = [777, 2025]
    want = apply_model(model, mix, shifts=2, split=True, overlap=0.25,
                       engine="host", rng=_FixedOffsets(offsets))
    got = device_apply_model(model, mix, shifts=2, overlap=0.25,
                             transfer_dtype=None, input_transfer_dtype=None,
                             rng=_FixedOffsets(offsets))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_device_engine_matches_host_three_shifts(model):
    """shifts=3 (non-power-of-two divisor): the engine folds the shift
    divisor into the final normalization, so a single unit-weight model
    reproduces the host's sum-then-divide rounding (the old w/3-per-pass
    scaling rounded differently)."""
    L = int(1.4 * model.segment * model.samplerate)
    mix = random_mix((1, 2, L), seed=37)
    offsets = [777, 2025, 31]
    want = apply_model(model, mix, shifts=3, split=True, overlap=0.25,
                       engine="host", rng=_FixedOffsets(offsets))
    got = device_apply_model(model, mix, shifts=3, overlap=0.25,
                             transfer_dtype=None, input_transfer_dtype=None,
                             rng=_FixedOffsets(offsets))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_device_engine_bag(model):
    _, cfg2, params2 = make_htdemucs_pair(seed=7)
    model2 = Model("htdemucs", cfg2, params2)
    weights = [[1.0, 2.0, 1.0, 0.5], [0.5, 1.0, 1.0, 1.0]]
    bag = BagOfModels([model, model2], weights=weights)

    L = int(1.4 * model.segment * model.samplerate)
    mix = random_mix((1, 2, L), seed=32)
    want = apply_model(bag, mix, shifts=0, split=True, overlap=0.25, engine="host")
    got = device_apply_model(bag, mix, shifts=0, overlap=0.25,
                             transfer_dtype=None, input_transfer_dtype=None)
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_float16_transfer_close(model):
    L = int(1.1 * model.segment * model.samplerate)
    mix = random_mix((1, 2, L), seed=33)
    exact = device_apply_model(model, mix, shifts=0, transfer_dtype=None, input_transfer_dtype=None)
    f16 = device_apply_model(model, mix, shifts=0, transfer_dtype="float16")
    scale = np.abs(exact).max()
    assert np.abs(exact - f16).max() < 2e-3 * max(scale, 1e-3)


def test_int16_transfer_close(model):
    L = int(1.1 * model.segment * model.samplerate)
    mix = random_mix((1, 2, L), seed=34)
    exact = device_apply_model(model, mix, shifts=0, transfer_dtype=None,
                               input_transfer_dtype=None)
    i16 = device_apply_model(model, mix, shifts=0, transfer_dtype="int16",
                             input_transfer_dtype="float16")
    scale = np.abs(exact).max()
    # int16 wire format ~ -90 dB vs stem scale; f16 input ~ -60 dB
    assert np.abs(exact - i16).max() < 5e-3 * max(scale, 1e-3)


def test_length_bucketing(model):
    """Bucketed track length reuses one executable; interior samples match the
    exact path, deviation confined to the final chunk region."""
    sr = model.samplerate
    L = int(1.9 * model.segment * sr)
    mix = random_mix((1, 2, L), seed=35)
    exact = device_apply_model(model, mix, shifts=0, transfer_dtype=None,
                               input_transfer_dtype=None)
    bucketed = device_apply_model(model, mix, shifts=0, transfer_dtype=None,
                                  input_transfer_dtype=None,
                                  length_bucket_seconds=model.segment)
    assert bucketed.shape == exact.shape
    # away from the tail chunk, results identical
    seg = int(model.segment * sr)
    np.testing.assert_allclose(bucketed[..., : L - seg], exact[..., : L - seg],
                               atol=2e-5, rtol=1e-4)


def test_short_track_single_segment(model):
    """Track shorter than one segment: single centered chunk, exact parity."""
    L = int(0.4 * model.segment * model.samplerate)
    mix = random_mix((1, 2, L), seed=36)
    want = apply_model(model, mix, shifts=0, split=True, overlap=0.25, engine="host")
    got = device_apply_model(model, mix, shifts=0, overlap=0.25,
                             transfer_dtype=None, input_transfer_dtype=None)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def _non_ht_model(kind):
    from common import SOURCES

    if kind == "hdemucs":
        from demucs_tpu.models import hdemucs as m

        cfg = m.HDemucsConfig(sources=tuple(SOURCES), channels=4, samplerate=8000)
        params = m.init_hdemucs(cfg, seed=11)
    else:
        from demucs_tpu.models import demucs as m

        cfg = m.DemucsConfig(sources=tuple(SOURCES), channels=4, depth=3,
                             samplerate=8000)
        params = m.init_demucs(cfg, seed=11)
    return Model(kind, cfg, params)


@pytest.mark.parametrize("kind", ["hdemucs", "demucs"])
def test_device_engine_non_ht_exact_tails(kind):
    """hdemucs/demucs on the device engine: bit-exact vs the host engine on
    EVERY chunk. The ragged tail chunks run at their exact per-length leaf
    targets (valid_length for v2, natural length for hdemucs —
    reference apply.py:302-309) via the exact-tails programs."""
    mdl = _non_ht_model(kind)
    cfg = mdl.cfg

    segment = 0.4
    segment_length = int(segment * cfg.samplerate)
    stride = int(0.75 * segment_length)
    L = int(1.8 * segment_length)
    partials = [o for o in range(0, L, stride) if L - o < segment_length]
    assert partials, "test must exercise the ragged-tail path"

    mix = random_mix((1, 2, L), seed=40)
    want = apply_model(mdl, mix, shifts=0, split=True, overlap=0.25,
                       segment=segment, engine="host")
    got = device_apply_model(mdl, mix, shifts=0, overlap=0.25, segment=segment,
                             transfer_dtype=None, input_transfer_dtype=None)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)

    # And through the public apply_model opt-in (fp16 wire defaults).
    scale = max(np.abs(want).max(), 1e-3)
    via_apply = apply_model(mdl, mix, shifts=0, split=True, overlap=0.25,
                            segment=segment, engine="device")
    assert np.abs(via_apply - got).max() < 3e-3 * scale


@pytest.mark.parametrize("kind", ["hdemucs", "demucs"])
def test_device_engine_non_ht_exact_tails_shifts(kind):
    """Shift trick + ragged tails: the tail chunk lengths depend on the
    runtime shift offset; each still runs at its exact reference target
    (pinned offsets, host vs device bit-level parity)."""
    mdl = _non_ht_model(kind)
    segment = 0.4
    L = int(1.8 * segment * mdl.samplerate)
    mix = random_mix((1, 2, L), seed=41)
    offsets = [777, 2025]
    want = apply_model(mdl, mix, shifts=2, split=True, overlap=0.25,
                       segment=segment, engine="host", rng=_FixedOffsets(offsets))
    got = device_apply_model(mdl, mix, shifts=2, overlap=0.25, segment=segment,
                             transfer_dtype=None, input_transfer_dtype=None,
                             rng=_FixedOffsets(offsets))
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)


def test_pipelined_tracks_match_single(model):
    """device_separate_tracks (fetch of track i overlapped with compute of
    track i+1) is bit-identical to per-track device_apply_model."""
    from demucs_tpu.inference.engine import device_separate_tracks

    L = int(1.3 * model.segment * model.samplerate)
    tracks = [random_mix((1, 2, L), seed=s) for s in (60, 61, 62)]
    singles = [device_apply_model(model, t, shifts=0, transfer_dtype=None,
                                  input_transfer_dtype=None) for t in tracks]
    piped = list(device_separate_tracks(model, tracks, shifts=0,
                                        transfer_dtype=None,
                                        input_transfer_dtype=None))
    assert len(piped) == len(singles)
    for got, want in zip(piped, singles):
        np.testing.assert_array_equal(got, want)


def test_int8_transfer_close(model):
    """Block-adaptive int8 wire: half the fetch bytes at ~44 dB SNR (noise
    tracks the local signal envelope) — the opt-in preview/streaming format."""
    L = int(1.1 * model.segment * model.samplerate)
    mix = random_mix((1, 2, L), seed=37)
    exact = device_apply_model(model, mix, shifts=0, transfer_dtype=None,
                               input_transfer_dtype=None)
    i8 = device_apply_model(model, mix, shifts=0, transfer_dtype="int8",
                            input_transfer_dtype=None)
    assert i8.shape == exact.shape
    err = exact - i8
    snr = 10 * np.log10(float((exact**2).mean()) / float((err**2).mean() + 1e-30))
    assert snr > 40, snr


def test_prestaged_track_parity(model):
    """stage_track + prestaged (device-resident input, no upload on the
    dispatch path) is bit-identical to the normal engine call, including a
    high-overlap case (the grouped parallel overlap-add with >2 covering
    segments per sample)."""
    from demucs_tpu.inference.engine import stage_track

    L = int(1.7 * model.segment * model.samplerate)
    mix = random_mix((1, 2, L), seed=55)
    for overlap in (0.25, 0.6):
        want = device_apply_model(model, mix, shifts=0, overlap=overlap,
                                  transfer_dtype=None, input_transfer_dtype=None)
        staged = stage_track(model, mix, shifts=0)
        got = device_apply_model(model, mix, shifts=0, overlap=overlap,
                                 transfer_dtype=None, input_transfer_dtype=None,
                                 prestaged=staged)
        np.testing.assert_array_equal(got, want)


def test_high_overlap_vs_host(model):
    """overlap > 0.5 (>2 covering segments/sample) against the host engine:
    the grouped overlap-add changes float association group-wise, so parity
    is ulp-level rather than bit-exact."""
    L = int(1.9 * model.segment * model.samplerate)
    mix = random_mix((1, 2, L), seed=56)
    want = apply_model(model, mix, shifts=0, split=True, overlap=0.6,
                       engine="host")
    got = device_apply_model(model, mix, shifts=0, overlap=0.6,
                             transfer_dtype=None, input_transfer_dtype=None)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("kind", ["hdemucs"])
def test_tail_mode_uniform_optin(kind):
    """tail_mode='uniform' (the single-executable serving opt-in): full
    chunks stay bit-exact vs the host engine; tail chunks run at the
    uniform target (slightly more real context — bounded deviation)."""
    mdl = _non_ht_model(kind)
    cfg = mdl.cfg
    segment = 0.4
    segment_length = int(segment * cfg.samplerate)
    stride = int(0.75 * segment_length)
    L = int(1.8 * segment_length)
    partials = [o for o in range(0, L, stride) if L - o < segment_length]
    clean = min(partials)

    mix = random_mix((1, 2, L), seed=44)
    want = apply_model(mdl, mix, shifts=0, split=True, overlap=0.25,
                       segment=segment, engine="host")
    got = device_apply_model(mdl, mix, shifts=0, overlap=0.25, segment=segment,
                             transfer_dtype=None, input_transfer_dtype=None,
                             tail_mode="uniform")
    np.testing.assert_allclose(got[..., :clean], want[..., :clean],
                               atol=2e-6, rtol=1e-5)
    scale = max(np.abs(want).max(), 1e-3)
    assert np.abs(got - want).max() < 0.35 * scale
    with pytest.raises(ValueError, match="tail_mode"):
        device_apply_model(mdl, mix, shifts=0, segment=segment,
                           tail_mode="bogus")


def test_mdx_era_bag_segment_override_scaled():
    """Scaled analog of the mdx_extra serving geometry: a 4-member hdemucs
    bag whose BagOfModels segment override bumps every member (the zoo's
    'segment: 44' yaml key, zoo/repo.py), track shorter than 2 segments so
    the grid is one full chunk + one ragged tail — host vs device parity
    through the exact-tails path."""
    import dataclasses

    mdls = []
    for _ in range(2):
        m = _non_ht_model("hdemucs")
        # members train at 0.4; the bag yaml bumps them to 0.5 (the zoo's
        # 40 -> 44 pattern; BagOfModels only raises, never lowers)
        m.cfg = dataclasses.replace(m.cfg, segment=0.4)
        mdls.append(m)
    bag = BagOfModels(mdls, segment=0.5)
    assert all(abs(m.segment - 0.5) < 1e-9 for m in bag.models)

    sr = mdls[0].samplerate
    L = int(60 / 44 * 0.5 * sr)  # the 60-s-track : 44-s-segment ratio
    mix = random_mix((1, 2, L), seed=45)
    want = apply_model(bag, mix, shifts=0, split=True, overlap=0.25,
                       engine="host")
    got = device_apply_model(bag, mix, shifts=0, overlap=0.25,
                             transfer_dtype=None, input_transfer_dtype=None)
    np.testing.assert_allclose(got, want, atol=3e-6, rtol=1e-5)
