"""TFLite export: convert the htdemucs core and run it in the TFLite
interpreter (the browser/edge last mile — tfjs-tflite executes the same
flatbuffer in-browser against the fork's meta.json contract,
/root/reference/web/src/index.ts:18-433)."""

import json
import sys
from pathlib import Path

import pytest

# import the tool as a top-level module (the established pattern,
# test_export_tf.py) — the 'tools' package name would be shadowed by the
# reference checkout's tools/ once torchref puts it on sys.path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

tf = pytest.importorskip("tensorflow")


def test_tflite_roundtrip(tmp_path):
    from demucs_tpu.models import htdemucs as ht
    from export_tflite import export_tflite_core

    cfg = ht.HTDemucsConfig(channels=16, depth=4, nfft=2048, t_layers=3,
                            t_heads=4, segment=0.5, samplerate=8000)
    params = ht.init_htdemucs(cfg, seed=0)
    out = tmp_path / "core.tflite"
    _, errs = export_tflite_core(params, cfg, out)
    assert out.stat().st_size > 1_000_000
    # XNNPACK delegate may run reduced-precision kernels; edge-grade bound
    assert all(e < 0.02 for e in errs.values()), errs

    meta = json.loads(out.with_suffix(".meta.json").read_text())
    assert meta["samplerate"] == 8000
    assert meta["nfft"] == 2048 and meta["cac"] is True
    assert meta["sources"] == list(cfg.sources)
    mag_shape, mix_shape = meta["inputs"]["mag"], meta["inputs"]["mix"]
    assert mix_shape == [1, 2, cfg.training_length]
    assert mag_shape[1] == 2 * cfg.audio_channels  # CaC packs re/im
