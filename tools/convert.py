"""Migrate legacy (pre-release dev-branch) experiment argv lists to this
framework's config system, re-sign them, and optionally re-export/verify the
checkpoints.

Behavioral reference: ``/root/reference/tools/convert.py`` — the reference
tool rewrote old Dora ``.argv.json`` override lists (dev-branch option names)
to the released names, recomputed the XP signature, re-saved the checkpoint
under the new signature, and compared old-vs-new forward outputs in dB.

This analog performs the same migration against our config tree:

  * the published dev->release rename rules (remove/replace/inject and the
    recursive ``continue_from`` remap, convert.py:23-73) are applied to the
    argv list;
  * ``<family>.<key>=v`` model tokens become ``model_args`` entries when
    ``<family>`` is the selected model (the reference reads only
    ``getattr(args, args.model)``, train.py:64-71); inactive-family tokens
    are dropped with a note;
  * the new signature is this repo's Dora-style delta hash
    (``demucs_tpu.train.config.xp_signature``);
  * ``--dump`` re-exports the old ``.th`` checkpoint (loaded through the
    hermetic bridge) as a native ``.dmx`` under the new signature;
  * ``--compare`` loads the dumped artifact back and prints the dB delta of
    the two forwards (convert.py:110-116 prints the same metric against the
    old dev repo).

Usage:
    python tools/convert.py SIG... --xps OLD_XPS_DIR [-o OUT] [--dump]
        [--compare] [-v]

``OLD_XPS_DIR`` follows the old layout: ``{xps}/{sig}/.argv.json`` with an
optional ``{xps}/{sig}/best.th`` / ``checkpoint.th`` package next to it.
"""

from __future__ import annotations

import argparse
import json
import sys
import typing as tp
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from demucs_tpu.train.config import (  # noqa: E402
    TrainArgs, apply_overrides, expand_presets, parse_cli_overrides,
    xp_signature,
)

# Dev->release option migration rules (reference tools/convert.py:23-50).
TO_REMOVE = [
    "demucs.dconv_kw.gelu=True",
    "demucs.dconv_kw.nfreqs=0",
    "demucs.dconv_kw.version=4",
    "demucs.norm=gn",
    "wdemucs.nice=True",
    "wdemucs.good=True",
    "wdemucs.freq_emb=-0.2",
    "special=True",
    "special=False",
]

TO_REPLACE = [
    ("power", "svd"),
    ("wdemucs", "hdemucs"),
    ("hdemucs.hybrid=True", "hdemucs.hybrid_old=True"),
    ("hdemucs.hybrid=2", "hdemucs.hybrid=True"),
]

TO_INJECT = [
    ("model=hdemucs", ["hdemucs.cac=False"]),
    ("model=hdemucs", ["hdemucs.norm_starts=999"]),
]

MODEL_FAMILIES = ("demucs", "hdemucs", "htdemucs")


def transform(argv: tp.List[str], verbose: bool = False) -> tp.List[str]:
    """Apply the dev->release token rewrites (convert.py:53-73), minus the
    ``continue_from`` recursion which `convert` handles with repo context."""
    argv = list(argv)
    for rm in TO_REMOVE:
        while rm in argv:
            argv.remove(rm)
    for old, new in TO_REPLACE:
        argv = [a.replace(old, new) for a in argv]
    for condition, extra in TO_INJECT:
        if condition in argv:
            argv = extra + argv
    if verbose:
        print("  transformed argv:", argv)
    return argv


def argv_to_overrides(argv: tp.Sequence[str], *, verbose: bool = False,
                      strict: bool = True) -> tp.Dict[str, tp.Any]:
    """Map released-name argv tokens onto this repo's override dict.

    ``<family>.<key>=v`` goes into ``model_args`` iff ``<family>`` is the
    selected model; other families' tokens are inert in the reference forward
    (train.py:64-71) and are dropped here (they did perturb the reference's
    Dora hash, so old and new signatures never correspond 1:1 — the point of
    the emitted mapping table).
    """
    model = "htdemucs"
    for token in argv:
        if token.startswith("model="):
            model = token.split("=", 1)[1]

    plain_tokens: tp.List[str] = []
    model_args: tp.Dict[str, tp.Any] = {}
    dropped: tp.List[str] = []
    for token in argv:
        key = token.split("=", 1)[0]
        family = key.split(".", 1)[0]
        if family in MODEL_FAMILIES:
            if family == model:
                sub = key.split(".", 1)[1]
                model_args[sub] = parse_cli_overrides([token])[token.split("=", 1)[0]]
            else:
                dropped.append(token)
            continue
        plain_tokens.append(token)
    if dropped and verbose:
        print(f"  dropped inactive-model tokens: {dropped}")

    overrides = expand_presets(parse_cli_overrides(plain_tokens))
    if model_args:
        merged = dict(overrides.get("model_args") or {})
        merged.update(model_args)
        overrides["model_args"] = merged
    if not strict:
        # best-effort: drop tokens the current tree rejects
        kept = {}
        for key, value in overrides.items():
            try:
                apply_overrides(TrainArgs(), {key: value})
            except KeyError:
                if verbose:
                    print(f"  dropped unknown override {key}={value!r}")
                continue
            kept[key] = value
        overrides = kept
    return overrides


def convert(sig: str, xps: Path, mappings: tp.Dict[str, str],
            verbose: bool = False, strict: bool = True) -> tp.Tuple[str, TrainArgs]:
    """Old sig -> (new sig, converted TrainArgs); recursively remaps
    ``continue_from`` dependencies first (convert.py:64-73)."""
    argv = json.loads((xps / sig / ".argv.json").read_text())
    if verbose:
        print(f"convert {sig}: original argv {argv}")
    argv = transform(argv, verbose)
    for idx, arg in enumerate(argv):
        if "continue_from=" in arg:
            dep_sig = arg.split("=", 1)[1].strip('"').strip("'")
            if verbose:
                print(f"  recursively converting dependency XP {dep_sig}")
            if dep_sig not in mappings:
                convert(dep_sig, xps, mappings, verbose, strict)
            # quoted like the reference (convert.py:74): an all-digit or
            # digits+e signature must stay a string through YAML parsing
            argv[idx] = f'continue_from="{mappings[dep_sig]}"'
    overrides = argv_to_overrides(argv, verbose=verbose, strict=strict)
    args = apply_overrides(TrainArgs(), overrides)
    new_sig = xp_signature(args)
    mappings[sig] = new_sig
    if verbose:
        print(f"  mapping {sig} -> {new_sig}")
    return new_sig, args


def _find_package(xps: Path, sig: str) -> tp.Optional[Path]:
    for name in ("best.th", "checkpoint.th", f"{sig}.th"):
        p = xps / sig / name
        if p.exists():
            return p
    return None


def _forward_db_delta(model, loaded) -> float:
    """20*log10(|out_a - out_b| / |out_a|) on a fixed 1 s input
    (convert.py:110-116 uses 10 s; 1 s keeps the CPU compile cheap)."""
    import numpy as np
    import jax.numpy as jnp

    from demucs_tpu.models.registry import jitted_forward

    rng = np.random.default_rng(1234)
    L = model.valid_length(min(int(model.samplerate),
                               int(model.samplerate * float(model.segment))))
    mix = rng.standard_normal((1, model.audio_channels, L)).astype(np.float32)
    a = np.asarray(jitted_forward(model.kind, model.cfg)(model.params, jnp.asarray(mix)))
    b = np.asarray(jitted_forward(loaded.kind, loaded.cfg)(loaded.params, jnp.asarray(mix)))
    denom = float(np.linalg.norm(a)) or 1.0
    num = float(np.linalg.norm(a - b))
    if num == 0.0:
        return float("-inf")
    import math

    return 20.0 * math.log10(num / denom)


def main(argv: tp.Optional[tp.Sequence[str]] = None) -> int:
    parser = argparse.ArgumentParser("convert")
    parser.add_argument("sigs", nargs="*")
    parser.add_argument("--xps", type=Path, required=True,
                        help="old experiment tree: {xps}/{sig}/.argv.json")
    parser.add_argument("-o", "--output", type=Path, default=Path("release_models"))
    parser.add_argument("-d", "--dump", action="store_true",
                        help="re-export the old checkpoint as native .dmx "
                             "under the new signature")
    parser.add_argument("-c", "--compare", action="store_true",
                        help="reload the dumped artifact and print the dB "
                             "delta vs the bridge-loaded original")
    parser.add_argument("--lenient", action="store_true",
                        help="drop overrides unknown to the current config "
                             "tree instead of failing")
    parser.add_argument("-v", "--verbose", action="store_true")
    args = parser.parse_args(argv)

    mappings: tp.Dict[str, str] = {}
    for sig in args.sigs:
        new_sig, _targs = convert(sig, args.xps, mappings, args.verbose,
                                  strict=not args.lenient)
        if args.dump or args.compare:
            pkg = _find_package(args.xps, sig)
            if pkg is None:
                print(f"no checkpoint found for {sig} under {args.xps}/{sig}")
                return 1
            from demucs_tpu.models.registry import Model
            from demucs_tpu.zoo.torch_load import load_th_model

            cfg, kind, params = load_th_model(pkg)
            model = Model(kind, cfg, params)
            args.output.mkdir(parents=True, exist_ok=True)
            from demucs_tpu.zoo.native import load_native_model, save_with_checksum

            out = save_with_checksum(model, args.output / f"{new_sig}.dmx",
                                     half=True)
            if args.dump:
                print(f"dumped {sig} -> {out}")
            if args.compare:
                delta = _forward_db_delta(model, load_native_model(out))
                print(f"Delta for {sig} {new_sig} {delta:.1f} dB")

    print("FINAL MAPPINGS")
    for old, new in mappings.items():
        print(old, " ", new)
    return 0


if __name__ == "__main__":
    sys.exit(main())
