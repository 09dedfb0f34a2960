"""Export the htdemucs core to a serialized StableHLO artifact.

The TPU-native replacement for the fork's ONNX export (tools/export_onnx.py):
``jax.export`` serializes the jitted ``forward_core`` (the same export
boundary: precomputed CaC magnitudes + mixture waveform in, pre-masking
spectral + time estimates out — htdemucs.py:662-759) into a portable
StableHLO module loadable from any XLA-backed runtime (incl. back into JAX
via ``jax.export.deserialize``).

Usage:
    python tools/export_stablehlo.py -n htdemucs --out core.stablehlo [--segment 7.8]
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import argparse
from pathlib import Path

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-n", "--name", default="htdemucs")
    parser.add_argument("--repo", type=Path, default=None)
    parser.add_argument("--out", type=Path, default=Path("htdemucs_core.stablehlo"))
    parser.add_argument("--segment", type=float, default=None)
    parser.add_argument("--random", action="store_true",
                        help="use random weights instead of the zoo (offline use)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from demucs_tpu.models import htdemucs as ht
    from demucs_tpu.ops.spec import cac_pack, demucs_spec

    if args.random:
        cfg = ht.HTDemucsConfig(segment=args.segment or 7.8)
        params = ht.init_htdemucs(cfg, seed=0)
    else:
        from demucs_tpu.zoo.pretrained import get_model
        from demucs_tpu.models.registry import BagOfModels

        model = get_model(args.name, repo=args.repo)
        if isinstance(model, BagOfModels):
            model = model.models[0]
        assert model.kind == "htdemucs", "StableHLO core export supports htdemucs"
        cfg, params = model.cfg, model.params

    L = cfg.training_length
    mix = jnp.zeros((1, cfg.audio_channels, L), jnp.float32)
    mag = cac_pack(demucs_spec(mix, cfg.nfft))

    def core(params, mag, mix):
        return ht.forward_core(params, mag, mix, cfg)

    exported = jexport.export(jax.jit(core))(params, mag, mix)
    data = exported.serialize()
    args.out.write_bytes(data)
    print(f"exported StableHLO core: {args.out} ({len(data)/2**20:.1f} MB)")
    print(f"  in:  mag {mag.shape}, mix {mix.shape}")
    spec_out, time_out = jax.eval_shape(core, params, mag, mix)
    print(f"  out: spec {spec_out.shape}, time {time_out.shape}")


if __name__ == "__main__":
    main()
