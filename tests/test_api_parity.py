"""End-to-end API parity vs the live reference: ``Separator.separate_tensor``
(normalization -> apply -> de-normalization, /root/reference/demucs/api.py:241-291)
and the two-stems / clip-mode stem arithmetic of separate.py
(/root/reference/demucs/separate.py:164-218), output-to-output on the same
tiny bridged model.

This closes the last untested seam between ``apply_model`` (covered by
tests/test_apply.py) and the file writer.
"""

import numpy as np
import pytest
import torch

from common import make_htdemucs_pair, SOURCES

from demucs_tpu.models.registry import Model

import torchref  # installs the reference's dependency stubs

torchref.import_reference()


def _ref_separator(tmodel, **overrides):
    """Construct the reference ``api.Separator`` around an in-memory model
    (its __init__ downloads by name, api.py:107-118 — bypassed here)."""
    from demucs import api as ref_api

    sep = object.__new__(ref_api.Separator)
    sep._name = "test"
    sep._repo = None
    sep._model = tmodel
    sep._audio_channels = tmodel.audio_channels
    sep._samplerate = tmodel.samplerate
    kw = dict(
        device="cpu", shifts=0, overlap=0.25, split=True, segment=None,
        jobs=0, progress=False, callback=None, callback_arg=None,
    )
    kw.update(overrides)
    sep.update_parameter(**kw)
    return sep


def _our_separator(model, **overrides):
    from demucs_tpu import api as our_api

    sep = object.__new__(our_api.Separator)
    sep._name = "test"
    sep._repo = None
    sep._model = model
    sep._audio_channels = model.audio_channels
    sep._samplerate = model.samplerate
    kw = dict(
        device="cpu", shifts=0, overlap=0.25, split=True, segment=None,
        jobs=0, progress=False, callback=None, callback_arg=None,
        batch_size=4, engine="auto", transfer_dtype=None,
        length_bucket_seconds=None,
    )
    kw.update(overrides)
    sep.update_parameter(**kw)
    return sep


@pytest.fixture(scope="module")
def pair():
    tmodel, cfg, params = make_htdemucs_pair()
    return tmodel, Model("htdemucs", cfg, params)


def _loud_wav(sr, seconds=1.3, seed=21):
    """A waveform with decidedly nonzero mean and non-unit std so the
    normalize/de-normalize path (api.py:268-291) actually does work."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    wav = np.stack([
        0.5 * np.sin(2 * np.pi * 330 * t) + 0.25,
        0.4 * np.sin(2 * np.pi * 110 * t) - 0.15,
    ]).astype(np.float32)
    wav += (rng.standard_normal(wav.shape) * 0.05).astype(np.float32)
    return wav


def test_separate_tensor_parity(pair):
    tmodel, model = pair
    wav = _loud_wav(model.samplerate)

    ref_sep = _ref_separator(tmodel)
    with torch.no_grad():
        ref_origin, ref_stems = ref_sep.separate_tensor(
            torch.from_numpy(wav.copy()))

    our_sep = _our_separator(model)
    our_origin, our_stems = our_sep.separate_tensor(wav.copy())

    np.testing.assert_allclose(our_origin, ref_origin.numpy(), atol=1e-6)
    assert list(our_stems) == list(ref_stems) == SOURCES
    scale = max(float(max(s.abs().max() for s in ref_stems.values())), 1.0)
    for name in SOURCES:
        err = np.abs(our_stems[name] - ref_stems[name].numpy()).max()
        assert err < 2e-3 * scale, (name, err)


def test_separate_tensor_resample_path(pair):
    """sr != model.samplerate triggers convert_audio on both sides
    (api.py:267-268)."""
    tmodel, model = pair
    src_sr = model.samplerate // 2
    wav = _loud_wav(src_sr)

    ref_sep = _ref_separator(tmodel)
    with torch.no_grad():
        ref_origin, ref_stems = ref_sep.separate_tensor(
            torch.from_numpy(wav.copy()), sr=src_sr)

    our_sep = _our_separator(model)
    our_origin, our_stems = our_sep.separate_tensor(wav.copy(), sr=src_sr)

    assert our_origin.shape == tuple(ref_origin.shape)
    np.testing.assert_allclose(our_origin, ref_origin.numpy(),
                               atol=1e-4, rtol=1e-4)
    scale = max(float(max(s.abs().max() for s in ref_stems.values())), 1.0)
    for name in SOURCES:
        err = np.abs(our_stems[name] - ref_stems[name].numpy()).max()
        assert err < 3e-3 * scale, (name, err)


def _ref_two_stems(tmodel, wav, stem, other_method, clip_mode):
    """The reference pipeline output-to-output: Separator.separate_tensor ->
    the exact stem arithmetic of separate.py:188-218 -> prevent_clip
    (audio.py:218-233). Returns {filename_stem: float wav} as the reference
    would have passed to the PCM writer."""
    from demucs.audio import prevent_clip as ref_prevent_clip

    ref_sep = _ref_separator(tmodel)
    with torch.no_grad():
        origin, res = ref_sep.separate_tensor(torch.from_numpy(wav.copy()))
    out = {}
    if other_method == "minus":
        out["minus_" + stem] = origin - res[stem]
    out[stem] = res.pop(stem)
    if other_method == "add":
        other = torch.zeros_like(next(iter(res.values())))
        for i in res.values():
            other += i
        out["no_" + stem] = other
    return {k: ref_prevent_clip(v, mode=clip_mode).numpy()
            for k, v in out.items()}


@pytest.mark.parametrize("other_method,clip_mode", [
    ("add", "rescale"),
    ("minus", "clamp"),
    ("add", "none"),
])
def test_cli_two_stems_parity(pair, tmp_path, monkeypatch, other_method,
                              clip_mode):
    """Our CLI's written stems == the reference pipeline's float stems (same
    model, same input file) within PCM16 quantization + model tolerance.
    Covers separate.py's two-stems branches and clip modes end-to-end through
    the file writer."""
    from demucs_tpu import audio as dta
    from demucs_tpu import api as our_api
    from demucs_tpu.separate import main as our_main

    tmodel, model = pair
    wav = _loud_wav(model.samplerate)
    track = tmp_path / "song.wav"
    dta.write_wav(track, wav, model.samplerate)

    monkeypatch.setattr(our_api, "get_model", lambda name, repo=None: model)
    out_dir = tmp_path / "sep"
    our_main([str(track), "-n", "tiny", "-o", str(out_dir), "--shifts", "0",
              "--overlap", "0.25", "--device", "cpu",
              "--two-stems", "vocals", "--other-method", other_method,
              "--clip-mode", clip_mode])

    want = _ref_two_stems(tmodel, wav, "vocals", other_method, clip_mode)
    stems_dir = out_dir / "tiny" / "song"
    got_names = sorted(p.stem for p in stems_dir.iterdir())
    assert got_names == sorted(want), got_names

    scale = max(max(np.abs(v).max() for v in want.values()), 1.0)
    for name, expect in want.items():
        got, got_sr = dta.read_wav(stems_dir / f"{name}.wav")
        assert got_sr == model.samplerate
        # PCM16 write/read quantization (~2/32768) + forward parity tolerance
        err = np.abs(got - np.clip(expect, -1, 1)).max()
        assert err < 2e-3 * scale + 2 / 32768, (name, err)


def _compare_stems(our_stems, ref_stems, tol=2e-3):
    assert list(our_stems) == list(ref_stems) == SOURCES
    scale = max(float(max(s.abs().max() for s in ref_stems.values())), 1.0)
    for name in SOURCES:
        err = np.abs(our_stems[name] - ref_stems[name].numpy()).max()
        assert err < tol * scale, (name, err)


def test_separator_shifts_parity(pair, monkeypatch):
    """shifts=2 through the api seam with PINNED offsets: both sides draw
    from the module-level ``random`` (reference apply.py:245), so seeding it
    identically pins the exact shift sequence. The reference's sin-embedding
    consumes a no-op ``random.randrange(sin_random_shift + 1)`` per forward
    even in eval (transformer.py:680; always 0 at the default
    sin_random_shift=0) which would desynchronize the stream — neutralized
    here without changing its result."""
    import random as _rnd

    monkeypatch.setattr(_rnd, "randrange", lambda *a, **k: 0)
    tmodel, model = pair
    wav = _loud_wav(model.samplerate)

    ref_sep = _ref_separator(tmodel, shifts=2)
    _rnd.seed(1234)
    with torch.no_grad():
        _, ref_stems = ref_sep.separate_tensor(torch.from_numpy(wav.copy()))

    our_sep = _our_separator(model, shifts=2)
    _rnd.seed(1234)
    _, our_stems = our_sep.separate_tensor(wav.copy())
    _compare_stems(our_stems, ref_stems)


def test_separator_segment_override_parity(pair):
    """Explicit segment override (reference apply.py:303-309: HTDemucs leaf
    target becomes int(segment*sr)) through the api seam."""
    tmodel, model = pair
    wav = _loud_wav(model.samplerate, seconds=1.1, seed=23)

    ref_sep = _ref_separator(tmodel, segment=0.3)
    with torch.no_grad():
        _, ref_stems = ref_sep.separate_tensor(torch.from_numpy(wav.copy()))

    our_sep = _our_separator(model, segment=0.3)
    _, our_stems = our_sep.separate_tensor(wav.copy())
    _compare_stems(our_stems, ref_stems)


def test_separator_jobs_parity(pair):
    """jobs=2: the reference runs segments through a ThreadPoolExecutor
    (apply.py:176-182); ours accepts the flag for API compatibility (device
    batching supplies the parallelism). Results must agree either way."""
    tmodel, model = pair
    wav = _loud_wav(model.samplerate, seconds=1.6, seed=24)

    ref_sep = _ref_separator(tmodel, jobs=2)
    with torch.no_grad():
        _, ref_stems = ref_sep.separate_tensor(torch.from_numpy(wav.copy()))

    our_sep = _our_separator(model, jobs=2)
    _, our_stems = our_sep.separate_tensor(wav.copy())
    _compare_stems(our_stems, ref_stems)


def test_callback_event_stream_parity(pair, monkeypatch):
    """Callback protocol equality on a 2-model bag with shifts=2: the
    (state, model_idx_in_bag, shift_idx, segment_offset, models) event
    sequence must match the reference's exactly — keys, order and counts
    (reference apply.py:185-320). batch_size=1 pins our batched dispatch to
    the reference's per-chunk start/end cadence; the reference's no-op
    eval-time ``randrange`` draw is neutralized as in the shifts test so
    both sides see identical shift offsets (and hence chunk grids)."""
    import random as _rnd

    monkeypatch.setattr(_rnd, "randrange", lambda *a, **k: 0)

    from demucs.apply import apply_model as ref_apply, BagOfModels as RefBag

    from demucs_tpu.inference.apply import apply_model as our_apply
    from demucs_tpu.models.registry import BagOfModels

    tmodel, model = pair
    tmodel2, cfg2, params2 = make_htdemucs_pair(seed=7)
    ref_bag = RefBag([tmodel, tmodel2])
    our_bag = BagOfModels([model, Model("htdemucs", cfg2, params2)])

    wav = _loud_wav(model.samplerate, seconds=1.2, seed=25)[None]
    KEYS = ("state", "model_idx_in_bag", "shift_idx", "segment_offset",
            "models")

    ref_events = []
    _rnd.seed(99)
    with torch.no_grad():
        ref_apply(ref_bag, torch.from_numpy(wav.copy()), shifts=2, split=True,
                  overlap=0.25, device="cpu",
                  callback=lambda d: ref_events.append(
                      tuple(d.get(k) for k in KEYS)))

    our_events = []
    _rnd.seed(99)
    our_apply(our_bag, wav.copy(), shifts=2, split=True, overlap=0.25,
              batch_size=1, engine="host",
              callback=lambda d: our_events.append(
                  tuple(d.get(k) for k in KEYS)))

    assert len(our_events) == len(ref_events)
    assert our_events == ref_events


def test_cli_file_level_diff(pair, tmp_path, monkeypatch):
    """Reference `demucs` CLI vs ours, same WAV + flags, PCM16 file diff.

    The reference CLI runs LIVE (arg parsing, Separator construction,
    max-segment validation, separation, filename templating, clip handling)
    with only its environment-blocked edges shimmed to the same codecs ours
    uses: model loading (no network), audio input (no ffmpeg/torchaudio)
    and the final torchaudio PCM16 encoder (demucs/audio.py:260-263), so
    both sides share one int16 rounding law. Payloads must agree to <=1 LSB
    with the vast majority of samples byte-identical (cross-framework
    forward parity ~1e-6 leaves knife-edge samples at rounding boundaries).
    """
    import random as _rnd
    from pathlib import Path

    import demucs.separate as ref_sep_mod
    from demucs import api as ref_api
    from demucs.audio import prevent_clip as ref_prevent_clip

    from demucs_tpu import audio as dta
    from demucs_tpu import api as our_api
    from demucs_tpu.separate import main as our_main

    tmodel, model = pair
    wav = _loud_wav(model.samplerate, seconds=1.4, seed=26)
    track = tmp_path / "song.wav"
    dta.write_wav(track, wav, model.samplerate)

    class _RefCLISep(ref_api.Separator):
        def __init__(self, model=None, repo=None, **kw):
            self._name = model
            self._repo = repo
            self._model = tmodel
            self._audio_channels = tmodel.audio_channels
            self._samplerate = tmodel.samplerate
            defaults = dict(device="cpu", shifts=0, overlap=0.25, split=True,
                            segment=None, jobs=0, progress=False,
                            callback=None, callback_arg=None)
            defaults.update({k: v for k, v in kw.items() if k in defaults})
            self.update_parameter(**defaults)

        def _load_audio(self, track):
            got, sr = dta.read_wav(track)
            assert sr == self._samplerate
            return torch.from_numpy(got)

    def _ref_save(wav_t, path, samplerate, bitrate=320, clip="rescale",
                  preset=None, bits_per_sample=16, as_float=False):
        assert not as_float and bits_per_sample == 16
        out = ref_prevent_clip(wav_t, mode=clip)
        dta.write_wav(Path(path), out.numpy(), samplerate)

    monkeypatch.setattr(ref_sep_mod, "Separator", _RefCLISep)
    monkeypatch.setattr(ref_sep_mod, "save_audio", _ref_save)

    # (--segment is int-typed in the reference parser — smaller than this
    # tiny model's 0.5 s segment is unreachable there; the explicit override
    # is covered at the api seam by test_separator_segment_override_parity)
    flags = ["--shifts", "1", "--overlap", "0.25", "--device", "cpu"]
    ref_out = tmp_path / "ref_out"
    _rnd.seed(4321)
    ref_sep_mod.main([str(track), "-n", "tiny", "-o", str(ref_out)] + flags)

    monkeypatch.setattr(our_api, "get_model", lambda name, repo=None: model)
    our_out = tmp_path / "our_out"
    _rnd.seed(4321)
    our_main([str(track), "-n", "tiny", "-o", str(our_out)] + flags)

    ref_dir = ref_out / "tiny" / "song"
    our_dir = our_out / "tiny" / "song"
    names = sorted(p.name for p in ref_dir.iterdir())
    assert names == sorted(p.name for p in our_dir.iterdir())
    assert names == [f"{s}.wav" for s in sorted(SOURCES)]
    for name in names:
        a, sr_a = dta.read_wav(ref_dir / name)
        b, sr_b = dta.read_wav(our_dir / name)
        assert sr_a == sr_b and a.shape == b.shape
        qa = np.round(a * 32767).astype(np.int64)
        qb = np.round(b * 32767).astype(np.int64)
        diff = np.abs(qa - qb)
        assert diff.max() <= 1, (name, diff.max())
        assert (diff == 0).mean() > 0.99, (name, (diff == 0).mean())
