"""Native C++ wavio library: builds with g++, decodes identically to the
Python codec, and the prefetcher assembles stem-group examples correctly."""

import numpy as np
import pytest

from demucs_tpu import audio as dta
from demucs_tpu import native


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("g++ toolchain unavailable")
    return native.get_lib()


@pytest.fixture(scope="module")
def wav_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    files = {}
    for name, bits, as_float in [("i16", 16, False), ("i24", 24, False),
                                 ("i32", 32, False), ("f32", None, True)]:
        wav = np.clip(rng.standard_normal((2, 5000)) * 0.3, -0.99, 0.99).astype(np.float32)
        p = root / f"{name}.wav"
        dta.write_wav(p, wav, 44100, bits_per_sample=bits or 32, as_float=as_float)
        files[name] = p
    return files


def test_info_matches_python(lib, wav_files):
    for p in wav_files.values():
        py = dta.wav_info(p)
        nat = native.wav_info(p)
        assert nat is not None
        for key in ("samplerate", "channels", "frames", "bits"):
            assert nat[key] == py[key], (p, key)


def test_window_read_matches_python(lib, wav_files):
    for p in wav_files.values():
        want, _ = dta.read_wav(p, frame_offset=1000, num_frames=2000)
        got = native.read_wav_window(p, 1000, 2000, channels=2)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_window_read_zero_pads_past_eof(lib, wav_files):
    p = wav_files["f32"]
    got = native.read_wav_window(p, 4000, 2000, channels=2)
    want, _ = dta.read_wav(p, frame_offset=4000, num_frames=1000)
    np.testing.assert_allclose(got[:, :1000], want, atol=1e-6)
    assert (got[:, 1000:] == 0).all()


def test_mono_downmix(lib, wav_files):
    p = wav_files["f32"]
    stereo, _ = dta.read_wav(p)
    got = native.read_wav_window(p, 0, 5000, channels=1)
    np.testing.assert_allclose(got[0], stereo.mean(0), atol=1e-6)


def test_prefetcher_examples(lib, wav_files):
    files = [wav_files["i16"], wav_files["f32"], wav_files["i24"], wav_files["i32"]]
    pf = native.NativePrefetcher(channels=2, frames=3000, sources=4, num_threads=3)
    for offset in (0, 500, 2500):
        pf.add_job(files, offset, mean=0.1, std=2.0)
    pf.start()
    for i, offset in enumerate((0, 500, 2500)):
        example = pf.get(i)
        assert example.shape == (4, 2, 3000)
        for s, f in enumerate(files):
            want, _ = dta.read_wav(f, frame_offset=offset, num_frames=3000)
            pad = 3000 - want.shape[-1]
            if pad:
                want = np.pad(want, [(0, 0), (0, pad)])
            np.testing.assert_allclose(example[s], (want - 0.1) / 2.0, atol=1e-6)
    pf.close()


def test_wavset_tail_window_native_matches_python(lib, tmp_path, monkeypatch):
    """Tail segments through the native loader match the Python fallback:
    zero padding must land AFTER normalization (true zeros, reference
    demucs/wav.py:163-184), not be normalized raw zeros."""
    from demucs_tpu.train.wav import Wavset, build_metadata

    sources = ("drums", "bass", "other", "vocals")
    rng = np.random.default_rng(3)
    tdir = tmp_path / "train" / "Track"
    tdir.mkdir(parents=True)
    sr, T = 8000, 3 * 8000
    stems = []
    for s in sources:
        wav = (rng.standard_normal((2, T)) * 0.2 + 0.05).astype(np.float32)
        dta.write_wav(tdir / f"{s}.wav", wav, sr, as_float=True)
        stems.append(wav)
    dta.write_wav(tdir / "mixture.wav", sum(stems), sr, as_float=True)

    meta = build_metadata(tmp_path / "train", list(sources))

    def make():
        return Wavset(tmp_path / "train", meta, list(sources), segment=2.0,
                      shift=1.5, samplerate=sr, channels=2, normalize=True)

    ds = make()
    tail_idx = len(ds) - 1  # window extends past EOF
    with_native = ds[tail_idx]
    monkeypatch.setattr(native, "available", lambda: False)
    without = make()[tail_idx]
    assert with_native.shape == without.shape
    np.testing.assert_allclose(with_native, without, atol=1e-6)
    # padded region is true zeros (post-normalization padding)
    assert np.abs(with_native[..., -1000:]).max() == 0.0
