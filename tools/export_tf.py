"""Export the htdemucs core as a TensorFlow SavedModel via jax2tf.

The deployment bridge that replaces the fork's browser/ONNX runtime
(/root/reference/web/src/index.ts:18-433 + tools/export_onnx.py): the same
export boundary as the ONNX core — precomputed CaC magnitudes + mixture in,
pre-masking spectral + time estimates out (htdemucs.py:662-759) — converted
to a TF graph. From the SavedModel, standard offline converters produce the
serving artifacts:

  * TF Serving / TF C++ runtime: load the SavedModel directly (the core is
    an XlaCallModule op lowered for BOTH cpu and tpu).
  * Browser: current jax2tf emits only native (XlaCallModule) graphs — the
    plain-TF-op mode tensorflowjs needs was removed upstream — so the
    browser last mile runs through the sibling StableHLO artifact
    (tools/export_stablehlo.py) and a StableHLO-consuming toolchain
    (IREE-wasm or tfjs' StableHLO ingestion) on a networked workstation.
    docs/deployment.md spells out the full contract.
  * TFLite: ``tf.lite.TFLiteConverter.from_saved_model`` (recent converters
    ingest StableHLO modules).

``meta.json`` (samplerate/channels/nfft/cac/segment) is written next to the
artifact, mirroring the fork's web/public/models/meta.json contract so a
browser runtime can drive the identical chunked STFT/overlap-add pipeline.

Usage:
    python tools/export_tf.py -n htdemucs --out htdemucs_tf
    python tools/export_tf.py --random --out /tmp/m  # offline smoke
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import argparse
import json
from pathlib import Path

import numpy as np


def export_tf_core(params, cfg, out: Path, sample_inputs=None):
    """Convert jitted ``forward_core`` to TF and save a SavedModel at ``out``.

    Returns (spec_out, time_out) computed by the reloaded SavedModel on
    ``sample_inputs`` (or zeros) for parity checking."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    from demucs_tpu.models import htdemucs as ht
    from demucs_tpu.ops.spec import cac_pack, demucs_spec
    from demucs_tpu.train.quantize import _nest
    from demucs_tpu.zoo.torch_load import flatten_state

    L = cfg.training_length
    if sample_inputs is None:
        mix = np.zeros((1, cfg.audio_channels, L), np.float32)
        mag = np.asarray(cac_pack(demucs_spec(mix, cfg.nfft)))
    else:
        mag, mix = sample_inputs

    flat = flatten_state(params)

    def core(flat_params, mag, mix):
        return ht.forward_core(_nest(flat_params), mag, mix, cfg)

    # one artifact serves CPU hosts and TPU servers regardless of the
    # exporting process's default backend
    tf_core = jax2tf.convert(
        core, native_serialization=True,
        native_serialization_platforms=("cpu", "tpu"),
        with_gradient=False)

    # Weights as tf.Variables (closure-captured): the SavedModel embeds them
    # as standard checkpoint shards, which tfjs/TFLite converters understand.
    tf_vars = {k: tf.Variable(np.asarray(v), name=k.replace(".", "/"))
               for k, v in flat.items()}

    module = tf.Module()
    module._vars = tf_vars

    @tf.function(autograph=False, input_signature=[
        tf.TensorSpec(np.shape(mag), tf.float32, name="mag"),
        tf.TensorSpec(np.shape(mix), tf.float32, name="mix"),
    ])
    def serve(mag, mix):
        spec_out, time_out = tf_core(
            {k: v for k, v in module._vars.items()}, mag, mix)
        return {"spec_out": spec_out, "time_out": time_out}

    module.serve = serve
    tf.saved_model.save(
        module, str(out),
        signatures={"serving_default": serve},
    )

    meta = {
        "samplerate": cfg.samplerate,
        "channels": cfg.audio_channels,
        "nfft": cfg.nfft,
        "cac": True,
        "segment": float(cfg.segment),
        "sources": list(cfg.sources),
        "inputs": {"mag": list(np.shape(mag)), "mix": list(np.shape(mix))},
    }
    (Path(out) / "meta.json").write_text(json.dumps(meta, indent=1))

    reloaded = tf.saved_model.load(str(out))
    got = reloaded.signatures["serving_default"](
        mag=tf.constant(np.asarray(mag, np.float32)),
        mix=tf.constant(np.asarray(mix, np.float32)))
    return np.asarray(got["spec_out"]), np.asarray(got["time_out"])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-n", "--name", default="htdemucs")
    parser.add_argument("--repo", type=Path, default=None)
    parser.add_argument("--out", type=Path, default=Path("htdemucs_tf"))
    parser.add_argument("--segment", type=float, default=None)
    parser.add_argument("--random", action="store_true",
                        help="random weights instead of the zoo (offline use)")
    args = parser.parse_args()

    from demucs_tpu.models import htdemucs as ht

    if args.random:
        cfg = ht.HTDemucsConfig(segment=args.segment or 7.8)
        params = ht.init_htdemucs(cfg, seed=0)
    else:
        from demucs_tpu.models.registry import BagOfModels
        from demucs_tpu.zoo.pretrained import get_model

        model = get_model(args.name, repo=args.repo)
        if isinstance(model, BagOfModels):
            model = model.models[0]
        assert model.kind == "htdemucs", "TF core export supports htdemucs"
        cfg, params = model.cfg, model.params

    spec_out, time_out = export_tf_core(params, cfg, args.out)
    size = sum(f.stat().st_size for f in Path(args.out).rglob("*") if f.is_file())
    print(f"exported TF SavedModel: {args.out} ({size/2**20:.1f} MB, "
          "native serialization)")
    print(f"  spec_out {spec_out.shape}, time_out {time_out.shape}")


if __name__ == "__main__":
    main()
