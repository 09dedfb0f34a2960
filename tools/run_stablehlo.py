"""Run an exported StableHLO htdemucs core end-to-end: wav in, stems out.

The consumer half of the deployment story (reference analog:
``tools/simple_separate_onnx.py:64-249``, which loads the ONNX core and does
the DSP pre/post + overlap-add around it). Here the core forward comes
EXCLUSIVELY from the serialized artifact (``jax.export.deserialize`` — no
model code is traced); the runtime around it re-does what the reference's
ONNX host loop does: STFT/CaC pre-processing, iSTFT + time-branch sum post,
segment overlap-add with triangle weights (``demucs/apply.py:257-301``), and
mixture-reference normalization (``demucs/separate.py:140-218``).

Weights ship in the native ``.dmx`` container (params + config), the graph in
the ``.stablehlo`` artifact:

    python tools/export_stablehlo.py -n htdemucs --out core.stablehlo
    python tools/export.py ... / save_with_checksum -> model.dmx
    python tools/run_stablehlo.py --core core.stablehlo --dmx model.dmx \
        track.wav -o separated/
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import argparse
from pathlib import Path

import numpy as np


def load_core(path: Path):
    """Deserialize the StableHLO artifact into a callable Exported."""
    from jax import export as jexport

    return jexport.deserialize(bytearray(Path(path).read_bytes()))


def separate_with_core(exported, params, cfg, mix: np.ndarray,
                       overlap: float = 0.25,
                       transition_power: float = 1.0) -> np.ndarray:
    """Overlap-add separation of ``mix (1, C, L)`` with the deserialized core.

    Numerics match ``apply_model(model, mix, shifts=0, split=True)`` for an
    htdemucs CaC model: every chunk is zero-padded to the artifact's fixed
    ``training_length`` (htdemucs.py:539-552 eval-mode padding), the core's
    (spec, time) outputs are post-processed (CaC unpack -> iSTFT -> + time
    branch) and triangle-weighted into the track accumulator
    (apply.py:257-301).
    """
    import jax
    import jax.numpy as jnp

    from demucs_tpu.ops.spec import (cac_pack, cac_unpack, demucs_ispec,
                                     demucs_spec)
    from demucs_tpu.zoo.torch_load import flatten_state

    assert cfg.cac, "StableHLO runtime supports the CaC (default) htdemucs"
    mix = np.asarray(mix, np.float32)
    assert mix.ndim == 3 and mix.shape[0] == 1, mix.shape
    # The artifact takes the flat dotted-name weight dict (string pytree
    # keys — see tools/export_stablehlo.py::export_core).
    flat_params = {k: jnp.asarray(v) for k, v in flatten_state(params).items()}
    batch, channels, length = mix.shape
    seg_len = cfg.training_length

    @jax.jit
    def pre(chunk):
        return cac_pack(demucs_spec(chunk, cfg.nfft))

    @jax.jit
    def post(spec_out, time_out):
        return time_out + demucs_ispec(cac_unpack(spec_out), seg_len)

    n_sources = len(cfg.sources)
    out = np.zeros((batch, n_sources, channels, length), np.float32)
    sum_weight = np.zeros(length, np.float32)
    stride = int((1 - overlap) * seg_len)
    weight = np.concatenate([
        np.arange(1, seg_len // 2 + 1, dtype=np.float32),
        np.arange(seg_len - seg_len // 2, 0, -1, dtype=np.float32),
    ])
    weight = (weight / weight.max()) ** transition_power

    from demucs_tpu.inference.apply import Chunk, center_trim

    for offset in range(0, length, stride):
        chunk = Chunk(mix, offset, seg_len)
        # Tail chunks pad CENTERED with real neighboring samples, the output
        # is center-trimmed back (TensorChunk semantics, apply.py:82-124).
        chunk_j = jnp.asarray(chunk.padded(seg_len))
        spec_out, time_out = exported.call(flat_params, pre(chunk_j), chunk_j)
        chunk_out = center_trim(np.asarray(post(spec_out, time_out)),
                                chunk.length)
        out[..., offset:offset + seg_len] += weight[:chunk.length] * chunk_out
        sum_weight[offset:offset + seg_len] += weight[:chunk.length]
    assert sum_weight.min() > 0
    out /= sum_weight
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Separate a track with an exported StableHLO core")
    parser.add_argument("tracks", nargs="+", type=Path)
    parser.add_argument("--core", type=Path, required=True,
                        help="serialized artifact from tools/export_stablehlo.py")
    parser.add_argument("--dmx", type=Path, required=True,
                        help="native .dmx container holding config + weights")
    parser.add_argument("-o", "--out", type=Path, default=Path("separated"))
    parser.add_argument("--overlap", type=float, default=0.25)
    parser.add_argument("--float32", action="store_true",
                        help="write float32 wavs (default: int16)")
    parser.add_argument("--clip", default="rescale",
                        choices=["rescale", "clamp", "tanh", "none"])
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from demucs_tpu.audio import read_audio, save_audio
    from demucs_tpu.zoo.native import load_native_model

    model = load_native_model(args.dmx)
    assert model.kind == "htdemucs", "artifact core is the htdemucs boundary"
    exported = load_core(args.core)
    import jax

    params = jax.tree.map(jnp.asarray, model.params)

    args.out.mkdir(parents=True, exist_ok=True)
    for track in args.tracks:
        wav, _sr = read_audio(track, samplerate=model.samplerate,
                              channels=model.audio_channels)
        # Mixture-reference normalization (separate.py:140-218).
        ref = wav.mean(axis=0)
        mean, std = ref.mean(), ref.std() + 1e-8
        stems = separate_with_core(exported, params, model.cfg,
                                   ((wav - mean) / std)[None],
                                   overlap=args.overlap)
        stems = stems * std + mean
        for name, stem in zip(model.sources, stems[0]):
            dest = args.out / f"{track.stem}_{name}.wav"
            save_audio(stem, dest, model.samplerate, clip=args.clip,
                       bits_per_sample=32 if args.float32 else 16,
                       as_float=args.float32)
            print(f"wrote {dest}")


if __name__ == "__main__":
    main()
