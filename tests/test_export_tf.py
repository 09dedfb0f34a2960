"""jax2tf deployment bridge: the TF SavedModel produced by tools/export_tf.py
reproduces the JAX ``forward_core`` (the fork's ONNX export boundary,
htdemucs.py:662-759) through a reload from disk — the artifact TF Serving
loads directly and tensorflowjs/TFLite converters consume offline."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from common import SOURCES, random_mix, small_htdemucs_kwargs

tf = pytest.importorskip("tensorflow")


@pytest.fixture(scope="module")
def small_model():
    from demucs_tpu.models import htdemucs as jht
    from demucs_tpu.models.registry import Model

    cfg = jht.HTDemucsConfig(sources=tuple(SOURCES), **small_htdemucs_kwargs())
    params = jht.init_htdemucs(cfg, seed=0)
    return Model("htdemucs", cfg, params)


def test_saved_model_matches_jax_core(small_model, tmp_path):
    import jax

    from export_tf import export_tf_core

    from demucs_tpu.models import htdemucs as ht
    from demucs_tpu.ops.spec import cac_pack, demucs_spec

    cfg, params = small_model.cfg, small_model.params
    mix = random_mix((1, 2, cfg.training_length), seed=4)
    mag = np.asarray(cac_pack(demucs_spec(mix, cfg.nfft)))

    out = tmp_path / "tf_native"
    spec_tf, time_tf = export_tf_core(params, cfg, out,
                                      sample_inputs=(mag, mix))

    spec_j, time_j = jax.jit(
        ht.forward_core, static_argnames=("cfg",))(params, mag, mix, cfg)
    np.testing.assert_allclose(spec_tf, np.asarray(spec_j), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(time_tf, np.asarray(time_j), atol=2e-4, rtol=1e-3)

    meta = json.loads((out / "meta.json").read_text())
    assert meta["samplerate"] == cfg.samplerate
    assert meta["nfft"] == cfg.nfft and meta["cac"] is True
    assert meta["sources"] == list(SOURCES)
    assert (out / "saved_model.pb").exists()
    # weights live as standard checkpoint shards (what tfjs/TFLite read)
    assert any((out / "variables").glob("variables.data-*"))
