"""First-party FLAC codec tests (demucs_tpu/flacio.py).

The reference's ``--flac`` / ``--flac --int24`` CLI cases (its Makefile
``test_eval`` matrix) run through ffmpeg; ours are hermetic — encoded by
flacio and verified by decoding (bit-exact round-trip + STREAMINFO MD5 +
frame CRCs)."""

import numpy as np
import pytest

from demucs_tpu.flacio import (
    _crc8_py, _crc16_py, decode_flac, encode_flac, read_flac, write_flac,
)


def _noise(c, t, seed=0, scale=0.3):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((c, t)) * scale).clip(-0.99, 0.99)


def _quant(wav, bps):
    lim = (1 << (bps - 1)) - 1
    return np.clip(np.round(wav * lim), -lim - 1, lim).astype(np.int32)


@pytest.mark.parametrize("channels", [1, 2])
@pytest.mark.parametrize("bps", [16, 24])
@pytest.mark.parametrize("t", [1, 100, 4096, 4097, 3 * 4096 + 17])
def test_roundtrip_noise(channels, bps, t):
    x = _quant(_noise(channels, t, seed=t + bps), bps)
    data = encode_flac(x, 44100, bps)
    got, sr, got_bps = decode_flac(data)
    assert (sr, got_bps) == (44100, bps)
    np.testing.assert_array_equal(got, x)


def test_roundtrip_tonal_compresses():
    """Smooth signals pick FIXED+Rice subframes and beat raw PCM size."""
    t = np.arange(6 * 4096)
    wav = np.stack([0.5 * np.sin(2 * np.pi * 220 * t / 44100),
                    0.4 * np.sin(2 * np.pi * 330 * t / 44100 + 0.3)])
    x = _quant(wav, 16)
    data = encode_flac(x, 44100, 16)
    got, _, _ = decode_flac(data)
    np.testing.assert_array_equal(got, x)
    assert len(data) < x.size * 2 * 0.7, (len(data), x.size * 2)


def test_constant_and_silence_subframes():
    x = np.zeros((2, 9000), np.int32)
    x[1] = 1234
    data = encode_flac(x, 8000, 16)
    got, sr, _ = decode_flac(data)
    assert sr == 8000
    np.testing.assert_array_equal(got, x)
    assert len(data) < 200  # constant subframes only


def test_md5_and_crc_detect_corruption():
    x = _quant(_noise(2, 5000, seed=3), 16)
    data = bytearray(encode_flac(x, 44100, 16))
    decode_flac(bytes(data))  # sanity

    flipped = bytearray(data)
    flipped[len(flipped) // 2] ^= 0xFF  # inside a frame payload
    with pytest.raises(ValueError):
        decode_flac(bytes(flipped))


def test_streaminfo_fields():
    x = _quant(_noise(2, 10000, seed=5), 24)
    data = encode_flac(x, 48000, 24)
    assert data[:4] == b"fLaC"
    got, sr, bps = decode_flac(data)
    assert (sr, bps) == (48000, 24)
    np.testing.assert_array_equal(got, x)


def test_write_read_float_roundtrip(tmp_path):
    wav = _noise(2, 22050, seed=7).astype(np.float32)
    path = tmp_path / "x.flac"
    write_flac(path, wav, 22050, bits_per_sample=16)
    got, sr = read_flac(path)
    assert sr == 22050 and got.shape == wav.shape
    # write scales by 2**15-1, read by 1/2**15 (the torchaudio/read_wav
    # convention): quantization half-step + the 32767/32768 gain
    assert np.abs(got - wav).max() < 1.6 / (1 << 15)


def test_save_audio_read_audio_flac(tmp_path):
    """save_audio's .flac path (the CLI writer) is decoded by read_audio."""
    from demucs_tpu.audio import read_audio, save_audio

    wav = _noise(2, 30000, seed=9).astype(np.float32)
    for bps in (16, 24):
        path = tmp_path / f"stem{bps}.flac"
        save_audio(wav, path, 44100, bits_per_sample=bps, clip="rescale")
        got, sr = read_audio(path)
        assert sr == 44100
        # rescale clip mode divides by max(1.01*peak, 1) <= 1 here
        scale = max(1.01 * np.abs(wav).max(), 1)
        assert np.abs(got - wav / scale).max() < 1.6 / (1 << (bps - 1))


def test_stereo_decorrelation_roundtrips_and_compresses():
    """Per-frame L/R vs left-side vs mid-side selection: correlated stereo
    picks a side-channel assignment (smaller file), decode is bit-exact."""
    rng = np.random.default_rng(41)
    t = np.arange(3 * 4096)
    base = 0.5 * np.sin(2 * np.pi * 180 * t / 44100)
    # near-identical channels: side channel is tiny
    wav = np.stack([base + 2e-5 * rng.standard_normal(len(t)),
                    base + 2e-5 * rng.standard_normal(len(t))])
    x = _quant(wav, 16)
    data = encode_flac(x, 44100, 16)
    got, _, _ = decode_flac(data)
    np.testing.assert_array_equal(got, x)

    # vs channels forced independent (mono-encode each channel separately)
    indep = sum(len(encode_flac(x[c:c + 1], 44100, 16)) for c in range(2))
    assert len(data) < 0.75 * indep, (len(data), indep)

    # anti-correlated channels exercise a different assignment; still exact
    wav2 = np.stack([base, -base])
    x2 = _quant(wav2, 16)
    got2, _, _ = decode_flac(encode_flac(x2, 44100, 16))
    np.testing.assert_array_equal(got2, x2)


def test_unknown_length_stream_decodes():
    """STREAMINFO total_samples == 0 ("unknown", legal for streamed encodes)
    must decode every frame present, not return empty audio."""
    x = _quant(_noise(2, 9000, seed=21), 16)
    data = bytearray(encode_flac(x, 44100, 16))
    # zero the 36-bit total inside the 8-byte packed STREAMINFO field and
    # the MD5 (it covers a now-unknown sample count)
    off = 8 + 10  # fLaC + block header + min/max blocksize + frame sizes
    packed = int.from_bytes(data[off:off + 8], "big")
    packed &= ~((1 << 36) - 1)
    data[off:off + 8] = packed.to_bytes(8, "big")
    data[off + 8:off + 24] = b"\0" * 16
    got, sr, bps = decode_flac(bytes(data))
    np.testing.assert_array_equal(got, x)


def test_truncated_stream_raises():
    x = _quant(_noise(2, 9000, seed=22), 16)
    data = encode_flac(x, 44100, 16)
    # mid-frame cut: fails loudly (bit reader exhaustion or the final
    # sample-count check), never returns short audio silently
    with pytest.raises((ValueError, IndexError)):
        decode_flac(data[: len(data) * 2 // 3])


def test_empty_input_encodes():
    data = encode_flac(np.zeros((2, 0), np.int32), 44100, 16)
    got, sr, bps = decode_flac(data)
    assert got.shape == (2, 0) and sr == 44100 and bps == 16


def test_wav_flac_decode_convention_matches(tmp_path):
    """Identical PCM16 content reads to identical floats from .wav and .flac
    (both divide by 2**15, the torchaudio convention)."""
    from demucs_tpu.audio import read_wav, write_wav

    wav = _noise(2, 4096, seed=23).astype(np.float32)
    write_wav(tmp_path / "a.wav", wav, 44100, bits_per_sample=16)
    w16, _ = read_wav(tmp_path / "a.wav")
    q = np.round(np.clip(wav, -1, 1) * (2 ** 15 - 1)).astype(np.int32)
    (tmp_path / "a.flac").write_bytes(encode_flac(q, 44100, 16))
    f16, _ = read_flac(tmp_path / "a.flac")
    # write_wav truncates toward zero while write_flac rounds; compare on the
    # decode side with identical int content instead
    np.testing.assert_allclose(f16, q.astype(np.float32) / 32768.0, rtol=0,
                               atol=0)


def test_python_fallback_decode_matches_native(monkeypatch):
    """With the native library unavailable, the pure-Python Rice/LPC paths
    must decode identically (they are the portability fallback)."""
    from demucs_tpu import flacio, native

    x = _quant(_noise(2, 3 * 4096 + 100, seed=31), 16)
    data = encode_flac(x, 44100, 16)
    want, _, _ = decode_flac(data)

    monkeypatch.setattr(native, "get_lib", lambda: None)
    got, _, _ = flacio.decode_flac(data)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got, x)


def test_crc_native_matches_python():
    from demucs_tpu import native

    lib = native.get_lib()
    data = bytes(np.random.default_rng(0).integers(0, 256, 5000, np.uint8))
    if lib is not None and hasattr(lib, "flac_crc8"):
        assert lib.flac_crc8(data, len(data)) == _crc8_py(data)
        assert lib.flac_crc16(data, len(data)) == _crc16_py(data)
    # known-answer: CRC-16/BUYPASS ("123456789" -> 0xFEE8), CRC-8 -> 0xF4
    assert _crc16_py(b"123456789") == 0xFEE8
    assert _crc8_py(b"123456789") == 0xF4
