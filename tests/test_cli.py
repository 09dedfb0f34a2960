"""End-to-end CLI matrix on a synthesized track with the tiny demucs_unittest
model — our version of the reference's ``make test_eval`` (SURVEY.md §4):
plain, --two-stems, --int24, --clip-mode clamp, --float32, --segment,
--list-models; plus audio I/O roundtrips."""


import numpy as np
import pytest

from demucs_tpu import audio as dta
from demucs_tpu import mp3io

_MP3 = mp3io.lame_available() and mp3io.mpg123_available()


@pytest.fixture(scope="module")
def track(tmp_path_factory):
    sr = 44100
    t = np.arange(int(1.5 * sr)) / sr
    left = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.1 * np.sin(2 * np.pi * 1320 * t)
    right = 0.4 * np.sin(2 * np.pi * 220 * t)
    wav = np.stack([left, right]).astype(np.float32)
    path = tmp_path_factory.mktemp("audio") / "test.wav"
    dta.write_wav(path, wav, sr)
    return path, wav, sr


def _run_cli(args):
    from demucs_tpu.separate import main

    main([str(a) for a in args])


@pytest.mark.parametrize(
    "extra",
    [
        [],
        ["--two-stems", "vocals"],
        ["--two-stems", "vocals", "--other-method", "minus"],
        ["--int24", "--clip-mode", "clamp"],
        ["--float32"],
        ["--segment", "8"],
        ["--no-split", "--shifts", "0"],
        ["--flac"],
        ["--flac", "--int24"],
        pytest.param(["--mp3"], marks=pytest.mark.skipif(
            not _MP3, reason="libmp3lame/libmpg123 unavailable")),
        pytest.param(["--mp3", "--mp3-bitrate", "128", "--mp3-preset", "7"],
                     marks=pytest.mark.skipif(
                         not _MP3, reason="libmp3lame/libmpg123 unavailable")),
    ],
    ids=["plain", "two_stems", "two_stems_minus", "int24_clamp", "float32", "segment", "no_split",
         "flac", "flac_int24", "mp3", "mp3_128_q7"],
)
def test_cli_matrix(track, tmp_path, extra):
    path, wav, sr = track
    out = tmp_path / "sep"
    _run_cli([path, "-n", "demucs_unittest", "-o", out, "--shifts", "0", *extra])
    stems_dir = out / "demucs_unittest" / "test"
    files = sorted(p.name for p in stems_dir.iterdir())
    ext = ".mp3" if "--mp3" in extra else (".flac" if "--flac" in extra else ".wav")
    if "--two-stems" in [str(e) for e in extra]:
        assert f"vocals{ext}" in files
        assert (f"no_vocals{ext}" in files) or (f"minus_vocals{ext}" in files)
    else:
        assert files == [f"bass{ext}", f"drums{ext}", f"other{ext}", f"vocals{ext}"]
    got, got_sr = dta.read_audio(stems_dir / files[0])
    assert got_sr == sr
    assert got.shape[0] == 2 and abs(got.shape[1] - wav.shape[1]) == 0
    if ext == ".flac":
        # hermetic decode-verify of the first-party FLAC stems: frame CRCs +
        # stream MD5 checked, bit depth per --int24
        from demucs_tpu.flacio import decode_flac

        _, _, bps = decode_flac((stems_dir / files[0]).read_bytes())
        assert bps == (24 if "--int24" in extra else 16)


def test_cli_list_models_content(capsys):
    with pytest.raises(SystemExit):
        from demucs_tpu.separate import main

        main(["--list-models"])
    out = capsys.readouterr().out
    for name in ("htdemucs", "htdemucs_ft", "htdemucs_6s", "hdemucs_mmi", "mdx_extra_q"):
        assert name in out
    assert "955717e8" in out


def test_stem_sum_consistency(track, tmp_path):
    """two-stems 'add' output equals the sum of the other stems."""
    path, wav, sr = track
    out = tmp_path / "sep"
    _run_cli([path, "-n", "demucs_unittest", "-o", out, "--shifts", "0", "--float32"])
    stems_dir = out / "demucs_unittest" / "test"
    stems = {p.stem: dta.read_wav(p)[0] for p in stems_dir.iterdir()}
    total = sum(stems.values())
    # HDemucs output stems sum approximately to the input (CaC mask + time branch
    # is not exactly conservative, just check shapes/finite here)
    assert total.shape == wav.shape
    assert np.isfinite(total).all()


def test_wav_roundtrip_bit_depths(tmp_path):
    rng = np.random.default_rng(0)
    wav = np.clip(rng.standard_normal((2, 1000)) * 0.3, -1, 1).astype(np.float32)
    for bits, tol in [(16, 1e-4), (24, 1e-6), (32, 1e-7)]:
        p = tmp_path / f"x{bits}.wav"
        dta.write_wav(p, wav, 44100, bits_per_sample=bits)
        got, sr = dta.read_wav(p)
        assert sr == 44100
        np.testing.assert_allclose(got, wav, atol=tol)
    p = tmp_path / "xf.wav"
    dta.write_wav(p, wav, 44100, as_float=True)
    got, _ = dta.read_wav(p)
    np.testing.assert_array_equal(got, wav)


def test_wave_format_extensible_decodes_by_subformat(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE declares the real codec in the SubFormat GUID:
    a 32-bit int PCM extensible file must NOT be decoded as IEEE float
    (which turns every sample into denormal garbage)."""
    import struct

    rng = np.random.default_rng(1)
    wav = np.clip(rng.standard_normal((2, 500)) * 0.3, -1, 1).astype(np.float32)
    ints = (wav.T.astype(np.float64) * (2**31 - 1)).astype("<i4")
    payload = ints.tobytes()
    C, bits = 2, 32
    block = C * bits // 8
    # fmt chunk: WAVE_FORMAT_EXTENSIBLE (0xFFFE) + 22-byte extension:
    # validBits(2) + channelMask(4) + SubFormat GUID (16, PCM = KSDATAFORMAT
    # _SUBTYPE_PCM whose first two bytes are the format code 1)
    pcm_guid = (b"\x01\x00\x00\x00\x00\x00\x10\x00"
                b"\x80\x00\x00\xaa\x00\x38\x9b\x71")
    ext = struct.pack("<HI", bits, 0b11) + pcm_guid
    fmt = struct.pack("<HHIIHH", 0xFFFE, C, 44100, 44100 * block, block, bits)
    fmt += struct.pack("<H", len(ext)) + ext
    p = tmp_path / "ext.wav"
    with open(p, "wb") as f:
        body = (b"WAVE"
                + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
                + struct.pack("<4sI", b"data", len(payload)) + payload)
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)
    got, sr = dta.read_wav(p)
    assert sr == 44100
    np.testing.assert_allclose(got, wav, atol=2e-5)


def test_separator_api_surface(track):
    from demucs_tpu.api import Separator

    path, wav, sr = track
    sep = Separator(model="demucs_unittest", shifts=0, progress=False)
    sep.update_parameter(shifts=1, overlap=0.1)
    assert sep._shifts == 1 and sep._overlap == 0.1
    sep.update_parameter(shifts=0)
    origin, stems = sep.separate_audio_file(path)
    assert set(stems) == {"drums", "bass", "other", "vocals"}
    assert origin.shape == wav.shape
    for v in stems.values():
        assert v.shape == wav.shape


def test_cli_fast_preset(track, tmp_path, capsys):
    """--preset fast runs end-to-end, prints its quality contract, and still
    writes all stems (on CPU the host engine keeps bit-exact wires; the
    preset's int8 wire + bf16 compute apply on accelerator backends)."""
    path, wav, sr = track
    out = tmp_path / "sep"
    _run_cli([path, "-n", "demucs_unittest", "-o", out, "--shifts", "0",
              "--preset", "fast"])
    assert "preset fast" in capsys.readouterr().out
    stems_dir = out / "demucs_unittest" / "test"
    assert sorted(p.name for p in stems_dir.iterdir()) == [
        "bass.wav", "drums.wav", "other.wav", "vocals.wav"]


def test_fast_preset_casts_htdemucs_compute(monkeypatch):
    """Separator(compute_dtype=...) re-configs the loaded model's forward
    dtype; the bf16 output stays within the documented preview-grade band of
    the fp32 path."""
    import numpy as np

    from common import make_htdemucs_pair
    from demucs_tpu import api
    from demucs_tpu.models.registry import Model

    _, cfg, params = make_htdemucs_pair()
    model = Model("htdemucs", cfg, params)
    monkeypatch.setattr(api, "get_model", lambda name, repo=None: model)

    sep32 = api.Separator(model="tiny", device="cpu", shifts=0)
    sep16 = api.Separator(model="tiny", device="cpu", shifts=0,
                          compute_dtype="bfloat16")
    assert sep16._model.cfg.compute_dtype == "bfloat16"
    assert sep32._model.cfg.compute_dtype == "float32"

    rng = np.random.default_rng(3)
    wav = (rng.standard_normal((2, int(1.1 * cfg.samplerate * cfg.segment)))
           * 0.1).astype(np.float32)
    _, stems32 = sep32.separate_tensor(wav.copy())
    _, stems16 = sep16.separate_tensor(wav.copy())
    for name in stems32:
        sig = float(np.mean(stems32[name] ** 2))
        err = float(np.mean((stems16[name] - stems32[name]) ** 2))
        snr = 10 * np.log10(sig / max(err, 1e-20))
        assert snr > 25, (name, snr)


def test_precision_presets_reach_all_families():
    """balanced/quality's matmul_precision knob exists on every model family
    (hdemucs/demucs gained the config field in round 5 — previously
    _apply_precision silently no-op'd while the banner promised ~82 dB), and
    the htdemucs-only compute_dtype knob warns instead of silently no-op'ing."""
    import warnings

    import numpy as np
    import pytest

    from demucs_tpu.api import _apply_precision
    from demucs_tpu.models.demucs import DemucsConfig
    from demucs_tpu.zoo.pretrained import demucs_unittest

    model = demucs_unittest()
    out = _apply_precision(model, None, "tensorfloat32")
    assert out.cfg.matmul_precision == "tensorfloat32"
    assert DemucsConfig().matmul_precision is None  # field exists

    with pytest.warns(UserWarning, match="compute_dtype.*no effect"):
        _apply_precision(model, "bfloat16", None)

    # The scoped forward still runs (precision strings are harmless on CPU)
    # and matches the unscoped f32 forward on this backend.
    mix = np.random.default_rng(0).standard_normal((1, 2, 4096)).astype(
        np.float32) * 0.1
    ref = model.forward_fn()(model.params, mix)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no stray warnings from the hot path
        got = out.forward_fn()(out.params, mix)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_resolve_preset_contract():
    """Single source of truth for the preset ladder: explicit wire wins and
    the banner states the wire actually in effect."""
    import pytest

    from demucs_tpu.presets import resolve_fast_preset, resolve_preset

    assert resolve_fast_preset("default", "auto") == (None, "auto", None)
    dt, wire, banner = resolve_fast_preset("fast", "auto")
    assert (dt, wire) == ("bfloat16", "int8") and "int8" in banner
    dt, wire, banner = resolve_fast_preset("fast", "float32")
    assert (dt, wire) == ("bfloat16", "float32")
    assert "stems wire: float32" in banner and "override" in banner

    dt, prec, wire, banner = resolve_preset("balanced", "auto")
    assert (dt, prec, wire) == (None, "tensorfloat32", "auto")
    assert "82 dB" in banner
    dt, prec, wire, banner = resolve_preset("quality", None)
    assert (dt, prec, wire) == (None, "highest", "float32")
    dt, prec, wire, banner = resolve_preset("quality", "int16")
    assert wire == "int16" and "override" in banner
    with pytest.raises(ValueError, match="preset"):
        resolve_preset("turbo", None)
