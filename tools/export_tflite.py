"""Convert the htdemucs core to a TFLite flatbuffer — the browser last mile.

The fork runs separation in a browser via an ONNX-exported core plus a TS
chunk loop (/root/reference/web/src/index.ts:18-433, web/src/dsp.ts:188-275).
Our deployment chain exports the identical core boundary (precomputed CaC
magnitudes + mixture in, pre-masking spectral/time estimates out,
htdemucs.py:662-759) as StableHLO and a TF SavedModel; this tool produces
the third artifact: a ``.tflite`` flatbuffer that tfjs-tflite executes
in-browser (WASM/WebGL delegates) against the same ``meta.json`` contract
the fork's runtime uses.

Converter strategy (first that works wins):
  1. ``TFLiteConverter.experimental_from_jax`` — converts the jitted JAX
     core directly (no SavedModel detour).
  2. ``TFLiteConverter.from_saved_model`` on the jax2tf SavedModel
     (tools/export_tf.py) — needs a converter recent enough to ingest
     XlaCallModule/StableHLO.

The produced flatbuffer is verified in-process with ``tf.lite.Interpreter``
against the JAX core (parity printed; the smoke test asserts it).

Usage:
    python tools/export_tflite.py -n htdemucs --out core.tflite
    python tools/export_tflite.py --random --out /tmp/core.tflite  # offline
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
# the tools dir itself too: importing sibling tools as top-level modules
# stays correct even when /root/reference (whose tools/ is a regular
# package) sits on sys.path (tests/torchref.py inserts it)
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent))

import argparse
import json
from pathlib import Path

import numpy as np


def export_tflite_core(params, cfg, out: Path, sample_inputs=None):
    """Convert ``forward_core`` for ``cfg`` to a .tflite flatbuffer at
    ``out`` (+ meta.json beside it). Returns the interpreter's
    (spec_out, time_out) on the sample inputs for parity checking."""
    import jax
    import tensorflow as tf

    from demucs_tpu.models import htdemucs as ht
    from demucs_tpu.ops.spec import cac_pack, demucs_spec
    from demucs_tpu.train.quantize import _nest
    from demucs_tpu.zoo.torch_load import flatten_state

    L = cfg.training_length
    if sample_inputs is None:
        rng = np.random.default_rng(0)
        mix = (rng.standard_normal((1, cfg.audio_channels, L)) * 0.1
               ).astype(np.float32)
        mag = np.asarray(cac_pack(demucs_spec(mix, cfg.nfft)))
    else:
        mag, mix = sample_inputs

    flat = flatten_state(params)
    names = sorted(flat)
    flat_vals = [np.asarray(flat[n]) for n in names]

    def core(flat_params, mag, mix):
        p = _nest(dict(zip(names, flat_params)))
        return ht.forward_core(p, mag, mix, cfg)

    def core_fixed(mag, mix):
        return core([np.asarray(v) for v in flat_vals], mag, mix)

    errors = {}
    tfl = None
    try:
        conv = tf.lite.TFLiteConverter.experimental_from_jax(
            [jax.jit(core_fixed)], [[("mag", mag), ("mix", mix)]])
        tfl = conv.convert()
    except Exception as exc:  # converter coverage varies per TF build
        errors["experimental_from_jax"] = repr(exc)

    if tfl is None:
        import tempfile

        from export_tf import export_tf_core

        with tempfile.TemporaryDirectory() as td:
            export_tf_core(params, cfg, Path(td), sample_inputs=(mag, mix))
            try:
                conv = tf.lite.TFLiteConverter.from_saved_model(td)
                conv.target_spec.supported_ops = [
                    tf.lite.OpsSet.TFLITE_BUILTINS,
                    tf.lite.OpsSet.SELECT_TF_OPS,
                ]
                tfl = conv.convert()
            except Exception as exc:
                errors["from_saved_model"] = repr(exc)

    if tfl is None:
        raise RuntimeError(f"no TFLite conversion path succeeded: {errors}")

    out = Path(out)
    out.write_bytes(tfl)
    meta = {
        "samplerate": cfg.samplerate,
        "audio_channels": cfg.audio_channels,
        "sources": list(cfg.sources),
        "nfft": cfg.nfft,
        "hop_length": cfg.hop_length,
        "cac": cfg.cac,
        "segment": cfg.segment,
        "training_length": L,
        "inputs": {"mag": list(mag.shape), "mix": list(mix.shape)},
        "artifact": out.name,
    }
    out.with_suffix(".meta.json").write_text(json.dumps(meta, indent=1))

    # verify with the TFLite interpreter
    interp = tf.lite.Interpreter(model_content=tfl)
    interp.allocate_tensors()
    inputs = {d["name"]: d for d in interp.get_input_details()}

    def _feed(detail_list, values):
        # match by shape (converter naming varies across paths)
        used = set()
        for v in values:
            for d in detail_list:
                if id(d) not in used and tuple(d["shape"]) == v.shape:
                    interp.set_tensor(d["index"], v)
                    used.add(id(d))
                    break
            else:
                raise RuntimeError(f"no input slot for shape {v.shape}")

    _feed(interp.get_input_details(), [mag, mix])
    interp.invoke()
    outs = [interp.get_tensor(d["index"])
            for d in interp.get_output_details()]
    want_spec, want_time = ht.forward_core(params, mag, mix, cfg)
    want = {np.asarray(want_spec).shape: np.asarray(want_spec),
            np.asarray(want_time).shape: np.asarray(want_time)}
    got = {o.shape: o for o in outs}
    assert set(got) == set(want), (set(got), set(want))
    errs = {}
    for shape in want:
        scale = max(np.abs(want[shape]).max(), 1e-6)
        errs[str(shape)] = float(np.abs(got[shape] - want[shape]).max() / scale)
    return got, errs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--name", default="htdemucs")
    ap.add_argument("--random", action="store_true",
                    help="random tiny model (offline smoke)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from demucs_tpu.models import htdemucs as ht

    if args.random:
        # the known-good reduced topology (tests/common.py small kwargs)
        cfg = ht.HTDemucsConfig(channels=16, depth=4, nfft=2048, t_layers=3,
                                t_heads=4, segment=0.5, samplerate=8000)
        params = ht.init_htdemucs(cfg, seed=0)
    else:
        from demucs_tpu.zoo.pretrained import get_model

        model = get_model(args.name)
        leaf = model.models[0] if hasattr(model, "models") else model
        if leaf.kind != "htdemucs":
            raise SystemExit("TFLite export covers the htdemucs core")
        cfg, params = leaf.cfg, leaf.params

    _, errs = export_tflite_core(params, cfg, Path(args.out))
    size = Path(args.out).stat().st_size
    print(f"exported TFLite flatbuffer: {args.out} ({size/2**20:.1f} MB), "
          f"interpreter-vs-jax max rel err per output: {errs}")


if __name__ == "__main__":
    main()
