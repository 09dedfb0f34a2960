"""First-party mp3 codec (demucs_tpu/mp3io.py): libmp3lame encode +
libmpg123 decode.

This is the hermetic counterpart of the reference's lameenc path
(``demucs/audio.py:199-215``) — and, unlike the ffmpeg activation matrix
(tests/test_external_binaries.py), it EXECUTES in this environment: the
LAME/mpg123 shared libraries ship in the image. Encoder and decoder are two
independent codebases (LAME vs mpg123), so the round trip is a genuine
cross-implementation check, not a self-roundtrip.
"""

import numpy as np
import pytest

from demucs_tpu import audio as dta
from demucs_tpu import mp3io

pytestmark = pytest.mark.skipif(
    not (mp3io.lame_available() and mp3io.mpg123_available()),
    reason="libmp3lame/libmpg123 not available")


def _signal(seconds=2.0, sr=44100, channels=2, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    rows = []
    for c in range(channels):
        f0 = 220.0 * (c + 1)
        rows.append(0.45 * np.sin(2 * np.pi * f0 * t)
                    + 0.12 * np.sin(2 * np.pi * 7.3 * f0 * t)
                    + 0.02 * rng.standard_normal(t.shape))
    return np.stack(rows).astype(np.float32), sr


def _snr(ref, got):
    n = min(ref.shape[-1], got.shape[-1])
    err = got[..., :n] - ref[..., :n]
    return 10 * np.log10(np.mean(ref[..., :n] ** 2) / np.mean(err ** 2))


def test_roundtrip_exact_length_and_snr(tmp_path):
    """320 kb/s stereo: gapless decode restores the EXACT original length
    (the patched LAME Info frame carries delay+padding) at high SNR."""
    wav, sr = _signal()
    path = tmp_path / "x.mp3"
    mp3io.write_mp3(path, wav, sr, bitrate=320, quality=2)
    got, got_sr = mp3io.read_mp3(path)
    assert got_sr == sr
    assert got.shape == wav.shape  # exact-length gapless decode
    assert _snr(wav, got) > 28.0


def test_roundtrip_mono(tmp_path):
    wav, sr = _signal(channels=1)
    path = tmp_path / "m.mp3"
    mp3io.write_mp3(path, wav, sr, bitrate=192)
    got, got_sr = mp3io.read_mp3(path)
    assert got_sr == sr
    assert got.shape[0] == 1
    assert got.shape == wav.shape
    assert _snr(wav, got) > 24.0


def test_float_input_matches_reference_i16_scaling(tmp_path):
    """Float encode must equal encoding the reference's i16_pcm conversion
    (clamp, * (2**15 - 1), truncate — demucs/audio.py:176-180) byte for
    byte."""
    wav, sr = _signal(seconds=0.5)
    wav[0, :10] = 1.5  # exercise the clamp
    pcm = (np.clip(wav, -1, 1) * (2**15 - 1)).astype(np.int16)
    a = mp3io.encode_mp3(wav, sr, 128, 5)
    b = mp3io.encode_mp3(pcm, sr, 128, 5)
    assert a == b


def test_bitrate_controls_size(tmp_path):
    wav, sr = _signal(seconds=3.0)
    small = mp3io.encode_mp3(wav, sr, bitrate=64)
    big = mp3io.encode_mp3(wav, sr, bitrate=320)
    # CBR: stream size ~ bitrate * duration / 8 (tag frame amortized)
    assert abs(len(big) - 320e3 * 3 / 8) / (320e3 * 3 / 8) < 0.1
    assert abs(len(small) - 64e3 * 3 / 8) / (64e3 * 3 / 8) < 0.1


@pytest.mark.parametrize("quality", [2, 7])
def test_quality_presets_decode(tmp_path, quality):
    """Both ends of the reference's preset range (2 best .. 7 fastest,
    demucs/separate.py --mp3-preset) produce decodable, accurate streams."""
    wav, sr = _signal(seconds=1.0)
    path = tmp_path / f"q{quality}.mp3"
    mp3io.write_mp3(path, wav, sr, bitrate=320, quality=quality)
    got, _ = mp3io.read_mp3(path)
    assert got.shape == wav.shape
    assert _snr(wav, got) > 24.0


def test_invalid_inputs():
    wav, sr = _signal(seconds=0.1)
    with pytest.raises(ValueError):
        mp3io.encode_mp3(wav, sr, quality=1)
    with pytest.raises(ValueError):
        mp3io.encode_mp3(wav, sr, quality=8)
    with pytest.raises(ValueError):
        mp3io.encode_mp3(np.zeros((3, 100), np.float32), sr)
    with pytest.raises(ValueError):
        mp3io.encode_mp3(wav.astype(np.float64).astype(np.int32), sr)


def test_save_audio_read_audio_mp3(tmp_path):
    """audio.save_audio routes .mp3 through LAME (honoring the preset knob)
    and read_audio decodes it via mpg123 when ffmpeg is absent."""
    wav, sr = _signal(seconds=1.0)
    path = tmp_path / "s.mp3"
    dta.save_audio(wav, path, sr, bitrate=256, preset=3)
    assert path.stat().st_size > 0
    if dta.ffmpeg_available():
        pytest.skip("read_audio prefers the ffmpeg reader when installed")
    got, got_sr = dta.read_audio(path, samplerate=sr, channels=2)
    assert got_sr == sr
    assert got.shape[0] == 2
    # save_audio applies clip prevention (rescale); compare up to that gain
    scale = 1.01 * np.abs(wav).max() if np.abs(wav).max() > 1 / 1.01 else 1.0
    assert _snr(wav / scale, got) > 26.0


def test_mpg123_rejects_garbage(tmp_path):
    path = tmp_path / "bad.mp3"
    path.write_bytes(b"\x00" * 64)
    with pytest.raises(RuntimeError):
        mp3io.read_mp3(path)


def test_pure_tone_high_snr(tmp_path):
    """Tonal content at 320 kb/s should round-trip near-transparently —
    catches gross scaling/channel/offset bugs the noisy-signal thresholds
    would mask (measured ~74 dB on this library pair)."""
    sr = 44100
    t = np.arange(sr * 2) / sr
    wav = np.stack([0.5 * np.sin(2 * np.pi * 440 * t),
                    0.5 * np.sin(2 * np.pi * 330 * t)]).astype(np.float32)
    path = tmp_path / "tone.mp3"
    mp3io.write_mp3(path, wav, sr, bitrate=320, quality=2)
    got, _ = mp3io.read_mp3(path)
    assert got.shape == wav.shape
    assert _snr(wav, got) > 55.0
