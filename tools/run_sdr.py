"""One-command SDR quality-gate runbook (the BASELINE verification step).

On a NETWORKED machine with a MUSDB-HQ checkout this downloads the released
weights, evaluates the full test set, and emits a machine-readable verdict
against the published gate (reference README.md:23-24: htdemucs_ft 9.00 dB
overall SDR; BASELINE.md: match within 0.05 dB):

    python tools/run_sdr.py --musdb /path/to/musdbhq            # htdemucs_ft
    python tools/run_sdr.py --musdb ... -n htdemucs --gate 8.55 # single model
    make sdr MUSDB=/path/to/musdbhq

The build environment has no egress, so the download + full eval can't run
here; tests/test_run_sdr.py dry-runs the COMPLETE plumbing (loopback-HTTP
remote repo -> checksum install -> .th unpickle -> MusdbHQ folder eval ->
verdict JSON) against a forged released-format checkpoint, so the only
untested step on a real machine is the quality of the weights themselves.

Verdict JSON (also written to --out):
    {"model": ..., "metric": "sdr_med"|"nsdr", "value": ..., "gate_db": ...,
     "tolerance_db": ..., "pass": true|false, "scores": {...}}
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import argparse
import json
from pathlib import Path

#: Published overall SDR (mean over sources of median-across-tracks museval
#: SDR) per released name — reference README.md:23-24, 85-94.
PUBLISHED_SDR = {
    "htdemucs_ft": 9.00,
    "htdemucs": 8.55,  # v4 without fine-tuning (paper table)
    "hdemucs_mmi": 8.11,
    "mdx_extra": 7.80,
}


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("-n", "--name", default="htdemucs_ft",
                        help="released model/bag name (default htdemucs_ft, "
                        "the 9.00 dB headline)")
    parser.add_argument("--repo", type=Path, default=None,
                        help="local checkpoint dir instead of the remote zoo")
    parser.add_argument("--musdb", type=Path, required=True,
                        help="MUSDB-HQ root (train/ + test/ track folders)")
    parser.add_argument("--gate", type=float, default=None,
                        help="gate in dB (default: the published number for "
                        "--name, see PUBLISHED_SDR)")
    parser.add_argument("--tolerance", type=float, default=0.05,
                        help="pass when value >= gate - tolerance (BASELINE.md)")
    parser.add_argument("--nsdr-only", action="store_true",
                        help="skip museval BSS-eval; gate on the MDX nsdr "
                        "instead (faster; the published gate is museval SDR)")
    parser.add_argument("--shifts", type=int, default=1)
    parser.add_argument("--overlap", type=float, default=0.25)
    parser.add_argument("--workers", type=int, default=2,
                        help="museval BSS-eval worker processes")
    parser.add_argument("--out", type=Path, default=Path("sdr_verdict.json"))
    return parser


def run(args) -> dict:
    from demucs_tpu.evaluate import evaluate
    from demucs_tpu.train.config import TrainArgs
    from demucs_tpu.zoo.pretrained import get_model

    model = get_model(args.name, repo=args.repo)

    targs = TrainArgs()
    targs.dset.musdb = str(args.musdb)
    targs.test.shifts = args.shifts
    targs.test.overlap = args.overlap
    targs.test.workers = args.workers

    class _Shim:
        pass

    solver = _Shim()
    solver.args = targs
    solver.model = model
    solver.folder = args.out.parent if args.out.parent != Path("") else Path(".")

    scores = evaluate(solver, compute_sdr=not args.nsdr_only)
    metric = "nsdr" if args.nsdr_only else "sdr_med"
    value = scores[metric]
    gate = args.gate if args.gate is not None else PUBLISHED_SDR.get(args.name)
    verdict = {
        "model": args.name,
        "metric": metric,
        "value": round(float(value), 4),
        "gate_db": gate,
        "tolerance_db": args.tolerance,
        "pass": (gate is None) or (value >= gate - args.tolerance),
        "scores": {k: round(float(v), 4) for k, v in scores.items()},
    }
    return verdict


def main(argv=None):
    args = build_parser().parse_args(argv)
    verdict = run(args)
    args.out.write_text(json.dumps(verdict, indent=1))
    print(json.dumps(verdict))
    if not verdict["pass"]:
        print(f"FAIL: {verdict['metric']} {verdict['value']:.3f} dB < "
              f"gate {verdict['gate_db']} - {verdict['tolerance_db']}",
              file=_sys.stderr)
        _sys.exit(1)
    return verdict


if __name__ == "__main__":
    main()
