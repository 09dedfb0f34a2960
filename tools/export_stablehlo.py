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



def export_core(params, cfg, out: Path) -> tuple:
    """Serialize jitted ``forward_core`` at ``cfg``'s training length into
    ``out``. Returns the (mag, mix) example input shapes."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from demucs_tpu.models import htdemucs as ht
    from demucs_tpu.ops.spec import cac_pack, demucs_spec
    from demucs_tpu.train.quantize import _nest  # trace-safe (no np coercion)
    from demucs_tpu.zoo.torch_load import flatten_state

    L = cfg.training_length
    mix = jnp.zeros((1, cfg.audio_channels, L), jnp.float32)
    mag = cac_pack(demucs_spec(mix, cfg.nfft))

    # The artifact's weight input is the FLAT dotted-name dict: jax.export
    # serialization requires string pytree keys, and a flat {name: array}
    # signature is friendlier to non-JAX runtimes anyway.
    def core(flat_params, mag, mix):
        return ht.forward_core(_nest(flat_params), mag, mix, cfg)

    # Multi-platform lowering: one artifact serves TPU pods and CPU hosts.
    exported = jexport.export(jax.jit(core), platforms=("tpu", "cpu"))(
        flatten_state(params), mag, mix)
    Path(out).write_bytes(exported.serialize())
    return mag.shape, mix.shape


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-n", "--name", default="htdemucs")
    parser.add_argument("--repo", type=Path, default=None)
    parser.add_argument("--out", type=Path, default=Path("htdemucs_core.stablehlo"))
    parser.add_argument("--segment", type=float, default=None)
    parser.add_argument("--random", action="store_true",
                        help="use random weights instead of the zoo (offline use)")
    args = parser.parse_args()

    from demucs_tpu.models import htdemucs as ht

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

    mag_shape, mix_shape = export_core(params, cfg, args.out)
    size = args.out.stat().st_size
    print(f"exported StableHLO core: {args.out} ({size/2**20:.1f} MB)")
    print(f"  in:  mag {mag_shape}, mix {mix_shape}")


if __name__ == "__main__":
    main()
