"""Skip-gated tests for every external-binary/optional-package seam.

This environment ships none of the ffmpeg / museval / soundstretch
BINARIES, so these tests are the ACTIVATION matrix for the subprocess-gated
paths: on a machine with the binaries installed they run the
reference-parity checks that need them (reference Makefile `test_eval`
--mp3 case; museval cross-check of ops/bsseval; soundstretch cross-check of
the native WSOLA repitch).

Note (round 5): the codec halves of this matrix DO execute in this
environment through the ffmpeg *libraries* — see tests/test_flac_crossval.py
(flacio <-> libavcodec bit-exact both directions, LAME mp3 under two
independent decoders, WAV layouts) and tests/test_mp3.py. What remains
binary/package-gated here is museval (not installed) and soundstretch."""

import importlib.util
import shutil

import numpy as np
import pytest

from demucs_tpu import audio as dta

_FFMPEG = dta.ffmpeg_available()
_MUSEVAL = importlib.util.find_spec("museval") is not None
_SOUNDSTRETCH = shutil.which("soundstretch") is not None


def _tone(seconds=1.0, sr=44100):
    t = np.arange(int(seconds * sr)) / sr
    return np.stack([0.4 * np.sin(2 * np.pi * 440 * t),
                     0.3 * np.sin(2 * np.pi * 220 * t)]).astype(np.float32), sr


@pytest.mark.skipif(not _FFMPEG, reason="ffmpeg not installed in this env")
def test_mp3_save_and_read_roundtrip(tmp_path):
    """save_audio .mp3 (ffmpeg encode) + AudioFile decode — the reference's
    `--mp3` test_eval case (audio.py:175-265)."""
    wav, sr = _tone()
    path = tmp_path / "x.mp3"
    dta.save_audio(wav, path, sr, bitrate=320)
    assert path.stat().st_size > 0
    got, got_sr = dta.read_audio(path, samplerate=sr, channels=2)
    assert got.shape[0] == 2
    # lossy codec: generous correlation check, not sample parity
    n = min(got.shape[1], wav.shape[1])
    corr = np.corrcoef(got[0, :n], wav[0, :n])[0, 1]
    assert corr > 0.9, corr


@pytest.mark.skipif(not _FFMPEG, reason="ffmpeg not installed in this env")
def test_cli_mp3_case(tmp_path):
    """The reference Makefile's `--mp3` CLI case end-to-end."""
    from demucs_tpu.separate import main

    wav, sr = _tone(1.5)
    track = tmp_path / "t.wav"
    dta.write_wav(track, wav, sr)
    out = tmp_path / "sep"
    main([str(track), "-n", "demucs_unittest", "-o", str(out),
          "--shifts", "0", "--mp3"])
    stems = sorted(p.name for p in (out / "demucs_unittest" / "t").iterdir())
    assert stems == ["bass.mp3", "drums.mp3", "other.mp3", "vocals.mp3"]


@pytest.mark.skipif(not _FFMPEG, reason="ffmpeg not installed in this env")
def test_audiofile_ffmpeg_reader_matches_native_wav(tmp_path):
    """AudioFile (ffmpeg subprocess decode) == the native WAV codec on the
    same file (audio.py::AudioFile vs read_wav)."""
    wav, sr = _tone()
    path = tmp_path / "x.wav"
    dta.write_wav(path, wav, sr)
    af = dta.AudioFile(path)
    got = af.read(streams=0)
    native, _ = dta.read_wav(path)
    n = min(got.shape[-1], native.shape[-1])
    np.testing.assert_allclose(got[..., :n], native[..., :n], atol=2e-4)


@pytest.mark.skipif(not _FFMPEG, reason="ffmpeg not installed in this env")
@pytest.mark.parametrize("bps", [16, 24])
def test_flac_our_encode_ffmpeg_decode(tmp_path, bps):
    """Our FLAC encoder -> ffmpeg decode: byte-exact PCM round trip.

    Both halves of the first-party codec (flacio.py) are self-authored, so
    in-repo round trips can't catch a shared spec misreading; this is the
    external oracle for the ENCODER (reference consumer:
    demucs/audio.py:236-265 shells out to ffmpeg for non-wav formats)."""
    import subprocess

    from demucs_tpu.flacio import write_flac

    wav, sr = _tone(0.7)
    path = tmp_path / "x.flac"
    write_flac(path, wav, sr, bits_per_sample=bps)
    fmt = "s16le" if bps == 16 else "s32le"
    raw = subprocess.run(
        ["ffmpeg", "-v", "error", "-i", str(path), "-f", fmt, "-"],
        stdout=subprocess.PIPE, check=True).stdout
    got = np.frombuffer(raw, np.int16 if bps == 16 else np.int32)
    got = got.reshape(-1, 2).T.astype(np.int64)
    if bps == 24:
        got >>= 8  # ffmpeg s32le carries 24-bit samples in the high bytes
    lim = (1 << (bps - 1)) - 1
    want = np.clip(np.round(wav.astype(np.float64) * lim), -lim - 1, lim)
    np.testing.assert_array_equal(got, want.astype(np.int64))


@pytest.mark.skipif(not _FFMPEG, reason="ffmpeg not installed in this env")
@pytest.mark.parametrize("level", ["0", "8", "12"])
def test_flac_ffmpeg_encode_our_decode(tmp_path, level):
    """ffmpeg FLAC encode (compression levels spanning plain FIXED up to
    LPC order 12 + mid-side + high partition orders) -> our decoder:
    byte-exact PCM. The external oracle for the DECODER's LPC/stereo
    paths beyond what our encoder emits."""
    import subprocess

    from demucs_tpu.flacio import decode_flac

    wav, sr = _tone(0.7)
    lim = 32767
    pcm = np.clip(np.round(wav.astype(np.float64) * lim), -lim - 1, lim)
    raw = pcm.T.astype("<i2").tobytes()
    path = tmp_path / f"lvl{level}.flac"
    subprocess.run(
        ["ffmpeg", "-v", "error", "-f", "s16le", "-ar", str(sr), "-ac", "2",
         "-i", "-", "-compression_level", level, str(path)],
        input=raw, check=True)
    got, got_sr, got_bps = decode_flac(path.read_bytes())
    assert (got_sr, got_bps) == (sr, 16)
    np.testing.assert_array_equal(got, pcm.astype(np.int32))


@pytest.mark.skipif(not _MUSEVAL, reason="museval not installed in this env")
def test_native_bsseval_matches_museval():
    """ops/bsseval (native BSS-eval images) vs museval.metrics.bss_eval on
    random sources — the cross-check the suite runs natively-only here."""
    import museval

    from demucs_tpu.ops.bsseval import bss_eval_images

    rng = np.random.default_rng(0)
    refs = rng.standard_normal((3, 2000, 2))
    ests = refs + 0.1 * rng.standard_normal(refs.shape)
    win = hop = 1000
    ours = bss_eval_images(refs, ests, window=win, hop=hop, flen=512)
    theirs = museval.metrics.bss_eval(
        refs, ests, compute_permutation=False, window=win, hop=hop,
        framewise_filters=False, bsseval_sources_version=False)[:-1]
    for a, b in zip(ours, theirs):
        np.testing.assert_allclose(a, b, atol=1e-3, rtol=1e-3)


@pytest.mark.skipif(not _SOUNDSTRETCH, reason="soundstretch not installed")
def test_soundstretch_vs_native_wsola():
    """The reference's repitch subprocess (repitch.py:59-86) vs our native
    WSOLA backend: same output duration law on the same call."""
    from demucs_tpu.train.repitch import repitch

    wav, sr = _tone(2.0)
    tempo, pitch = 5.0, 1
    got_ss = repitch(wav, pitch, tempo, samplerate=sr, backend="soundstretch")
    got_nat = repitch(wav, pitch, tempo, samplerate=sr, backend="native")
    # duration law: len / (1 + tempo/100)
    want_len = int(round(wav.shape[-1] / (1 + tempo / 100)))
    assert abs(got_ss.shape[-1] - want_len) < 0.02 * want_len
    assert abs(got_nat.shape[-1] - want_len) < 0.02 * want_len
