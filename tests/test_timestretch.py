"""Native WSOLA time-stretch / sinc resample / repitch and the native beat
tracker + chroma (fallbacks for the reference's soundstretch binary and
librosa dependency — demucs/repitch.py, tools/automix.py)."""

import numpy as np
import pytest

from demucs_tpu.ops.timestretch import repitch_native, resample, time_stretch
from demucs_tpu.ops.beats import beat_track, chroma_stft

SR = 22050


def _tone(freq, seconds=2.0, sr=SR, channels=2):
    t = np.arange(int(seconds * sr)) / sr
    return np.stack([np.sin(2 * np.pi * freq * t)] * channels).astype(np.float32)


def _domfreq(x, sr=SR):
    w = x[0].astype(np.float64) * np.hanning(x.shape[-1])
    return np.argmax(np.abs(np.fft.rfft(w))) * sr / x.shape[-1]


def _rms(x):
    core = np.asarray(x, np.float64)[:, x.shape[-1] // 4 : -x.shape[-1] // 4]
    return float(np.sqrt((core ** 2).mean()))


@pytest.mark.parametrize("rate", [0.8, 0.99, 1.01, 1.25])
def test_time_stretch_tone(rate):
    tone = _tone(440.0)
    y = time_stretch(tone, rate)
    assert y.shape == (2, round(tone.shape[-1] / rate))
    # pitch unchanged, energy preserved (PV-style smearing would fail this)
    assert abs(_domfreq(y) - 440.0) < 2.0
    assert abs(_rms(y) - _rms(tone)) < 0.02


@pytest.mark.parametrize("ratio", [0.5, 0.891, 1.122, 2.0])
def test_resample_tone(ratio):
    tone = _tone(440.0)
    y = resample(tone, ratio)
    assert y.shape == (2, round(tone.shape[-1] * ratio))
    # frequency in the new sample grid: f' = f / ratio (same waveform,
    # different rate) — measured against the ORIGINAL sr
    assert abs(_domfreq(y) - 440.0 / ratio) < 3.0
    assert abs(_rms(y) - _rms(tone)) < 0.02


@pytest.mark.parametrize("pitch,tempo", [(2.0, 5.0), (-3.0, -8.0), (0.0, 12.0)])
def test_repitch_native_semantics(pitch, tempo):
    """soundstretch parameterization: duration / (1+tempo/100), pitch in
    semitones (repitch.py:59-86)."""
    tone = _tone(440.0)
    y = repitch_native(tone, pitch, tempo)
    assert y.shape == (2, round(tone.shape[-1] / (1 + tempo / 100)))
    want_f = 440.0 * 2 ** (pitch / 12)
    assert abs(_domfreq(y) - want_f) < 0.01 * want_f
    assert abs(_rms(y) - _rms(tone)) < 0.03


def test_repitch_wrapper_native_backend():
    """RepitchedWrapper produces static shapes with the native backend (no
    soundstretch in this environment)."""
    from demucs_tpu.train.repitch import RepitchedWrapper, soundstretch_available

    assert not soundstretch_available()  # this env: native path is exercised

    class DS:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            return (rng.standard_normal((4, 2, SR)) * 0.1).astype(np.float32)

    import random as _r

    _r.seed(0)
    wrapped = RepitchedWrapper(DS(), proba=1.0, samplerate=SR)
    out = wrapped[0]
    assert out.shape == (4, 2, int(0.88 * SR))
    assert np.isfinite(out).all() and np.abs(out).max() > 0


def test_beat_track_click_train():
    """120 BPM click track: tempo within 3%, beats within 50 ms of clicks."""
    T = 10 * SR
    y = np.zeros(T)
    for k in range(0, T, SR // 2):
        y[k : k + 64] += np.hanning(64) * np.sin(2 * np.pi * 1000 * np.arange(64) / SR)
    tempo, beats = beat_track(y, SR)
    assert abs(tempo - 120) < 3.6, tempo
    assert 16 <= len(beats) <= 22
    clicks = np.arange(0, T, SR // 2) / SR
    errs = [np.abs(b - clicks).min() for b in beats[2:-2]]
    assert max(errs) < 0.05, max(errs)


@pytest.mark.parametrize("freq,cls", [(440.0, 9), (261.63, 0), (329.63, 4)])
def test_chroma_classes(freq, cls):
    tone = _tone(freq, channels=1)[0]
    ch = chroma_stft(tone, SR).mean(axis=1)
    assert int(np.argmax(ch)) == cls


def test_chroma_rotation_matching():
    """automix best_pitch_shift contract: shifting a tone by k semitones is
    recovered as a circular chroma rotation."""
    base = chroma_stft(_tone(261.63, channels=1)[0], SR).mean(axis=1, keepdims=True)
    up3 = chroma_stft(_tone(261.63 * 2 ** (3 / 12), channels=1)[0], SR).mean(
        axis=1, keepdims=True)
    deltas = [float(np.abs(base - np.roll(up3, r, axis=0)).mean()) for r in range(12)]
    # rolling the shifted histogram back down by 3 aligns it
    assert int(np.argmin(deltas)) == 12 - 3
