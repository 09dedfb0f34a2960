"""Evaluate a released model/bag on a MusdbHQ test set.

Behavioral reference: ``tools/test_pretrained.py`` — recompute published SDR
for any model name with the standard test-time settings.

Usage:
    python tools/test_pretrained.py -n htdemucs --musdb /path/to/musdbhq [--sdr]
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import argparse
import json
from pathlib import Path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-n", "--name", default="htdemucs")
    parser.add_argument("--repo", type=Path, default=None)
    parser.add_argument("--musdb", type=Path, required=True)
    parser.add_argument("--sdr", action="store_true", help="also compute museval SDR")
    parser.add_argument("--shifts", type=int, default=1)
    parser.add_argument("--overlap", type=float, default=0.25)
    parser.add_argument("--out", type=Path, default=Path("eval_out"))
    args = parser.parse_args()

    from demucs_tpu.evaluate import evaluate
    from demucs_tpu.train.config import TrainArgs
    from demucs_tpu.zoo.pretrained import get_model

    model = get_model(args.name, repo=args.repo)

    targs = TrainArgs()
    targs.dset.musdb = str(args.musdb)
    targs.test.shifts = args.shifts
    targs.test.overlap = args.overlap
    targs.test.workers = 0

    class _Shim:
        pass

    solver = _Shim()
    solver.args = targs
    solver.model = model
    solver.folder = args.out
    args.out.mkdir(exist_ok=True, parents=True)

    result = evaluate(solver, compute_sdr=args.sdr)
    print(json.dumps(result, indent=1))
    for key in ("nsdr", "sdr_med"):
        if key in result:
            print(f"{key}: {result[key]:.3f} dB")


if __name__ == "__main__":
    main()
