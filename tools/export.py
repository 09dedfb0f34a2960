"""Export a trained XP checkpoint to a release model file.

Behavioral reference: ``tools/export.py`` in the reference — takes XP
signatures, loads ``best_state`` (fp16 on disk), pins ``segment`` to the
actual training segment, and writes ``release_models/{SIG}.dmx`` with an
8-hex sha256 suffix.

Usage:
    python tools/export.py SIG [SIG ...] [--out release_models] [--outdir outputs]
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import argparse
import dataclasses
import pickle
from pathlib import Path

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("signatures", nargs="+")
    parser.add_argument("--out", type=Path, default=Path("release_models"))
    parser.add_argument("--outdir", type=Path, default=Path("outputs"))
    args = parser.parse_args()

    from demucs_tpu.train.config import TrainArgs
    from demucs_tpu.train.train import get_model
    from demucs_tpu.zoo.native import save_with_checksum

    args.out.mkdir(exist_ok=True, parents=True)
    for sig in args.signatures:
        folder = args.outdir / "xps" / sig
        ckpt = folder / "checkpoint.tpk"
        if not ckpt.exists():
            print(f"skipping {sig}: no checkpoint at {ckpt}")
            continue
        with open(ckpt, "rb") as f:
            package = pickle.load(f)
        targs = TrainArgs()
        saved_args = package.get("args", {})

        def apply_tree(node, data):
            for key, value in data.items():
                cur = getattr(node, key, None)
                if dataclasses.is_dataclass(cur) and isinstance(value, dict):
                    apply_tree(cur, value)
                else:
                    if isinstance(cur, tuple) and isinstance(value, list):
                        value = tuple(value)
                    setattr(node, key, value)

        apply_tree(targs, saved_args)
        model = get_model(targs)
        state = package.get("best_state") or package["state"]
        model.params = jax.tree.map(jnp.asarray, state)
        # Pin the deploy segment to the trained segment (reference
        # tools/export.py:53-56 stores it as a Fraction of the train length).
        model.cfg = dataclasses.replace(model.cfg, segment=float(targs.dset.segment))

        # diffq/qat XPs: hard-quantize with the learned bits into the compact
        # container (reference tools/export.py:41-49 saves the quantized
        # state when the XP has a quantizer).
        from demucs_tpu.train.quantize import hard_quantized_state, make_spec

        spec = make_spec(targs)
        if spec is not None:
            qlogits = package.get("qlogits")
            if qlogits is not None:
                qlogits = jax.tree.map(jnp.asarray, qlogits)
            qstate = hard_quantized_state(model.params, qlogits, spec,
                                          model.kind, model.cfg)
            from demucs_tpu.zoo.native import serialize_model
            import hashlib

            content = serialize_model(model, training_args=saved_args,
                                      quantized_state=qstate)
            qsig = hashlib.sha256(content).hexdigest()[:8]
            qpath = args.out / f"{sig}-{qsig}.dmx"
            qpath.write_bytes(content)
            print(f"exported {sig} (quantized, {len(content)/2**20:.1f} MB) "
                  f"-> {qpath}")
            continue
        path = save_with_checksum(model, args.out / f"{sig}.dmx",
                                  training_args=saved_args, half=True)
        print(f"exported {sig} -> {path}")


if __name__ == "__main__":
    main()
