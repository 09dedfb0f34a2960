#!/usr/bin/env python
"""Replay a browser debug pack against the local TFLite core (and optionally
the JAX core) — the fork's ``tools/inspect_debug_pack.py`` analog
(/root/reference/tools/inspect_debug_pack.py replays against local ONNX).

The browser shell (web/index.html, open with ``?debug=1``) captures the
first chunk's {mag, mix, spec_out, time_out} as base64 float32 tensors in
``debug_pack.json``. This tool:

  - parses the pack,
  - runs the captured (mag, mix) through the local ``core.tflite`` with
    ``tf.lite.Interpreter`` (the exact flatbuffer the browser executed via
    tfjs-tflite),
  - compares the browser's spec_out/time_out against the local outputs and
    reports L2 / MAE / MaxAbs per output (compare_onnx.py statistics),
  - with ``--jax -n NAME`` additionally compares against the JAX
    ``forward_core`` (float32 reference — quantifies the browser delegate's
    own error separately from any DSP/packing bug).

NOTE on scaling: the shell's DSP omits the 1/sqrt(nfft) normalization (see
web/index.html header; tests/test_web_contract.py pins the cancellation),
so the captured mag is sqrt(nfft) x ops/spec.py's convention. That is the
CORRECT input convention for replay — both runtimes see identical bytes, no
rescaling is needed here.

Usage:
  python tools/inspect_debug_pack.py --pack debug_pack.json --tflite core.tflite
  python tools/inspect_debug_pack.py --pack p.json --tflite core.tflite \
      --jax -n htdemucs --tol 1e-4
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent))

import argparse
import base64
import json
from pathlib import Path

import numpy as np


def b64_to_f32(data: str) -> np.ndarray:
    return np.frombuffer(base64.b64decode(data), dtype=np.float32).copy()


def load_pack(path) -> dict:
    obj = json.loads(Path(path).read_text())
    m = obj["meta"]
    C, S, F, T, seg = m["C"], m["S"], m["F"], m["T"], m["seg"]
    return {
        "meta": m,
        "mag": b64_to_f32(obj["mag"]).reshape(1, 2 * C, F, T),
        "mix": b64_to_f32(obj["mix"]).reshape(1, C, seg),
        "spec_out": b64_to_f32(obj["spec_out"]).reshape(1, S, 2 * C, F, T),
        "time_out": b64_to_f32(obj["time_out"]).reshape(1, S, C, seg),
    }


def stats(name: str, got: np.ndarray, want: np.ndarray) -> dict:
    diff = got.astype(np.float64) - want.astype(np.float64)
    out = {
        "l2": float(np.linalg.norm(diff)),
        "mae": float(np.abs(diff).mean()),
        "maxabs": float(np.abs(diff).max()),
        "scale": float(np.abs(want).max()),
    }
    print(f"{name}: L2 {out['l2']:.6g}  MAE {out['mae']:.6g}  "
          f"MaxAbs {out['maxabs']:.6g}  (output scale {out['scale']:.4g})")
    return out


def run_tflite(tflite_path, mag: np.ndarray, mix: np.ndarray):
    import tensorflow as tf

    interp = tf.lite.Interpreter(model_path=str(tflite_path))
    details = interp.get_input_details()
    by_shape = {}
    for d in details:
        by_shape[len(d["shape"])] = d
    # mag is rank 4, mix rank 3 (meta.json contract, tools/export_tflite.py)
    interp.resize_tensor_input(by_shape[4]["index"], mag.shape)
    interp.resize_tensor_input(by_shape[3]["index"], mix.shape)
    interp.allocate_tensors()
    interp.set_tensor(by_shape[4]["index"], mag.astype(np.float32))
    interp.set_tensor(by_shape[3]["index"], mix.astype(np.float32))
    interp.invoke()
    outs = [interp.get_tensor(d["index"]) for d in interp.get_output_details()]
    spec = next(o for o in outs if o.ndim == 5)
    time = next(o for o in outs if o.ndim == 4)
    return spec, time


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Replay a browser debug pack against the local core")
    parser.add_argument("--pack", required=True)
    parser.add_argument("--tflite", default="core.tflite")
    parser.add_argument("--tol", type=float, default=1e-4,
                        help="absolute tolerance for the PASS/FAIL verdict "
                        "(XNNPACK/WASM delegates run reduced-precision "
                        "kernels; 1e-4 is edge-grade)")
    parser.add_argument("--jax", action="store_true",
                        help="also compare against the JAX forward_core")
    parser.add_argument("-n", "--name", default="htdemucs",
                        help="model for --jax (zoo name or 'random')")
    args = parser.parse_args(argv)

    pack = load_pack(args.pack)
    print(f"pack: chunk off={pack['meta'].get('off')} "
          f"chunkLen={pack['meta'].get('chunkLen')} "
          f"mag {pack['mag'].shape} mix {pack['mix'].shape}")

    spec_l, time_l = run_tflite(args.tflite, pack["mag"], pack["mix"])
    s1 = stats("spec_out (browser vs local tflite)", pack["spec_out"], spec_l)
    s2 = stats("time_out (browser vs local tflite)", pack["time_out"], time_l)

    if args.jax:
        import jax

        jax.config.update("jax_default_device", jax.devices("cpu")[0])
        from demucs_tpu.models import htdemucs as ht

        if args.name == "random":
            cfg = ht.HTDemucsConfig()
            params = ht.init_htdemucs(cfg, seed=0)
        else:
            from demucs_tpu.zoo.pretrained import get_model

            model = get_model(args.name)
            model = model.models[0] if hasattr(model, "models") else model
            cfg, params = model.cfg, model.params
        spec_j, time_j = ht.forward_core(params, pack["mag"], pack["mix"], cfg)
        stats("spec_out (browser vs jax fp32)", pack["spec_out"],
              np.asarray(spec_j))
        stats("time_out (browser vs jax fp32)", pack["time_out"],
              np.asarray(time_j))

    ok = s1["maxabs"] <= args.tol and s2["maxabs"] <= args.tol
    print("PASS" if ok else f"FAIL (tol {args.tol})")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
