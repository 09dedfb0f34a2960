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


def _ref_separator(tmodel):
    """Construct the reference ``api.Separator`` around an in-memory model
    (its __init__ downloads by name, api.py:107-118 — bypassed here)."""
    from demucs import api as ref_api

    sep = object.__new__(ref_api.Separator)
    sep._name = "test"
    sep._repo = None
    sep._model = tmodel
    sep._audio_channels = tmodel.audio_channels
    sep._samplerate = tmodel.samplerate
    sep.update_parameter(
        device="cpu", shifts=0, overlap=0.25, split=True, segment=None,
        jobs=0, progress=False, callback=None, callback_arg=None,
    )
    return sep


def _our_separator(model):
    from demucs_tpu import api as our_api

    sep = object.__new__(our_api.Separator)
    sep._name = "test"
    sep._repo = None
    sep._model = model
    sep._audio_channels = model.audio_channels
    sep._samplerate = model.samplerate
    sep.update_parameter(
        device="cpu", shifts=0, overlap=0.25, split=True, segment=None,
        jobs=0, progress=False, callback=None, callback_arg=None,
        batch_size=4, engine="auto", transfer_dtype=None,
        length_bucket_seconds=None,
    )
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
