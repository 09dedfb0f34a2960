"""Deployment round-trip: the serialized StableHLO core artifact + native
.dmx weights reproduce apply_model end-to-end through tools/run_stablehlo.py
(the consumer the reference ships as tools/simple_separate_onnx.py)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from common import SOURCES, random_mix, small_htdemucs_kwargs


@pytest.fixture(scope="module")
def small_model():
    from demucs_tpu.models import htdemucs as jht
    from demucs_tpu.models.registry import Model

    cfg = jht.HTDemucsConfig(sources=tuple(SOURCES), **small_htdemucs_kwargs())
    params = jht.init_htdemucs(cfg, seed=0)
    return Model("htdemucs", cfg, params)


@pytest.fixture(scope="module")
def artifact(small_model, tmp_path_factory):
    from export_stablehlo import export_core

    out = tmp_path_factory.mktemp("hlo") / "core.stablehlo"
    mag_shape, mix_shape = export_core(small_model.params, small_model.cfg, out)
    assert out.stat().st_size > 0
    assert mix_shape == (1, 2, small_model.cfg.training_length)
    return out


def test_artifact_separation_matches_apply_model(small_model, artifact):
    from run_stablehlo import load_core, separate_with_core

    from demucs_tpu.inference.apply import apply_model

    # >2 training segments so the overlap-add path (incl. a short tail chunk)
    # is exercised, not just the single-leaf case.
    T = int(2.6 * small_model.cfg.training_length)
    mix = random_mix((1, 2, T), seed=3)

    exported = load_core(artifact)
    got = separate_with_core(exported, small_model.params, small_model.cfg, mix)
    want = apply_model(small_model, mix, shifts=0, split=True, overlap=0.25,
                       engine="host")
    assert got.shape == want.shape == (1, 4, 2, T)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=0)


def test_cli_end_to_end(small_model, artifact, tmp_path):
    """wav in -> stems wavs out, consuming only the .stablehlo + .dmx files."""
    import run_stablehlo

    from demucs_tpu.audio import read_audio, save_audio
    from demucs_tpu.inference.apply import apply_model
    from demucs_tpu.zoo.native import serialize_model

    dmx = tmp_path / "model.dmx"
    # half=False: the CLI comparison below is against the fp32 weights.
    dmx.write_bytes(serialize_model(small_model, half=False))

    sr = small_model.samplerate
    wav = random_mix((2, int(1.4 * sr)), seed=7, scale=0.05)
    track = tmp_path / "track.wav"
    save_audio(wav, track, sr, bits_per_sample=32, as_float=True, clip="none")

    out_dir = tmp_path / "sep"
    run_stablehlo.main(["--core", str(artifact), "--dmx", str(dmx),
                        "-o", str(out_dir), "--float32", "--clip", "none",
                        str(track)])

    # Reference pipeline on the decoded wav (PCM round-trip included).
    decoded, _ = read_audio(track, samplerate=sr, channels=2)
    ref = decoded.mean(axis=0)
    mean, std = ref.mean(), ref.std() + 1e-8
    want = apply_model(small_model, ((decoded - mean) / std)[None],
                       shifts=0, split=True, overlap=0.25,
                       engine="host") * std + mean

    for k, name in enumerate(small_model.sources):
        dest = out_dir / f"track_{name}.wav"
        assert dest.exists(), dest
        stem, _ = read_audio(dest, samplerate=sr, channels=2)
        np.testing.assert_allclose(stem, want[0, k], atol=5e-4, rtol=0)
