"""CLI: separate the sources for the given tracks.

Behavioral reference: ``demucs/separate.py`` — same flag surface (model
selection, shifts/overlap/split/segment, two-stems with other-method,
wav bit depths, flac/mp3, clip modes, filename templates, --list-models).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

from demucs_tpu.api import Separator, list_models, save_audio
from demucs_tpu.models.registry import BagOfModels, Model
from demucs_tpu.zoo.pretrained import add_model_flags
from demucs_tpu.zoo.repo import ModelLoadingError


def fatal(msg: str) -> None:
    print(msg, file=sys.stderr)
    sys.exit(1)


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        "demucs_tpu.separate", description="Separate the sources for the given tracks"
    )
    parser.add_argument("tracks", nargs="*", type=Path, default=[], help="Path to tracks")
    add_model_flags(parser)
    parser.add_argument("--list-models", action="store_true",
                        help="List available models from current repo and exit")
    parser.add_argument("-v", "--verbose", action="store_true")
    parser.add_argument("-o", "--out", type=Path, default=Path("separated"),
                        help="Folder where to put extracted tracks. A subfolder with the "
                        "model name will be created.")
    parser.add_argument("--filename", default="{track}/{stem}.{ext}",
                        help='Output name template; variables: "{track}", "{trackext}", '
                        '"{stem}", "{ext}". Default "{track}/{stem}.{ext}".')
    parser.add_argument("-d", "--device", default="auto",
                        help="Execution device (JAX-managed; accepted for compatibility)")
    parser.add_argument("--shifts", default=1, type=int,
                        help="Number of random shifts for equivariant stabilization.")
    parser.add_argument("--shift-offsets", default=None,
                        help="Comma-separated pinned shift offsets (samples), "
                        "consumed in order instead of random draws: identical "
                        "exact-tails numerics, but the executable set becomes "
                        "bounded/prewarmable (docs/api.md 'Serving guidance').")
    parser.add_argument("--overlap", default=0.25, type=float,
                        help="Overlap between the splits.")
    split_group = parser.add_mutually_exclusive_group()
    split_group.add_argument("--no-split", action="store_false", dest="split", default=True,
                             help="Doesn't split audio in chunks.")
    split_group.add_argument("--segment", type=int, help="Set split size of each chunk.")
    parser.add_argument("--two-stems", dest="stem", metavar="STEM",
                        help="Only separate audio into {STEM} and no_{STEM}.")
    parser.add_argument("--other-method", dest="other_method",
                        choices=["none", "add", "minus"], default="add",
                        help='How to compute "no_{STEM}": none|add|minus.')
    depth_group = parser.add_mutually_exclusive_group()
    depth_group.add_argument("--int24", action="store_true", help="Save wav as 24 bits.")
    depth_group.add_argument("--float32", action="store_true", help="Save wav as float32.")
    parser.add_argument("--clip-mode", default="rescale",
                        choices=["rescale", "clamp", "none"],
                        help="Clipping strategy: rescale | clamp | none.")
    format_group = parser.add_mutually_exclusive_group()
    format_group.add_argument("--flac", action="store_true", help="Output flac.")
    format_group.add_argument("--mp3", action="store_true", help="Output mp3.")
    parser.add_argument("--mp3-bitrate", default=320, type=int, help="mp3 bitrate.")
    parser.add_argument("--mp3-preset", choices=range(2, 8), type=int, default=2,
                        help="mp3 encoder preset, 2 = highest quality.")
    parser.add_argument("-j", "--jobs", default=0, type=int,
                        help="Number of jobs (compatibility; see --batch-size).")
    parser.add_argument("--batch-size", default=16, type=int,
                        help="Segments per device batch (TPU throughput knob).")
    parser.add_argument("--engine", default="auto", choices=["auto", "host", "device"],
                        help="Separation engine: device = on-chip overlap-add "
                        "with one fetch per track (fastest on TPU).")
    parser.add_argument("--tail-mode", default="exact",
                        choices=["exact", "uniform"],
                        help="Ragged tail chunks on the device engine for "
                        "hdemucs/demucs-era models: 'exact' (default) "
                        "reproduces the reference's per-length tail padding "
                        "bit-exactly (a small per-new-tail-shape compile); "
                        "'uniform' runs everything at one padded target "
                        "(single executable, tails see slightly more real "
                        "context). HTDemucs models are exact either way.")
    parser.add_argument("--bag-mode", default="auto",
                        choices=["auto", "stacked", "sequential"],
                        help="Homogeneous-bag strategy on one device: "
                        "'auto'/'stacked' folds every member + shift pass "
                        "into ONE device program (htdemucs_ft's 4 members "
                        "run as merged MXU batches instead of 4 sequential "
                        "passes); 'sequential' forces the reference-style "
                        "member loop (its exact per-pass executables).")
    parser.add_argument("--length-bucket", type=float, default=None,
                        metavar="SECONDS",
                        help="Quantize track lengths to this bucket on the "
                        "device engine so variable-length tracks share one "
                        "compiled executable (deviation confined to the "
                        "final chunk; recommended for batch serving, e.g. 30).")
    parser.add_argument("--preset", default="default",
                        choices=["default", "fast", "balanced", "quality"],
                        help="Quality/speed ladder (measured SER vs the "
                        "true-fp32 forward; demucs_tpu/presets.py): "
                        "'fast' = bf16 MXU storage + int8 wire (~56 dB, "
                        "1.37x default speed); default = XLA's 1-pass bf16 "
                        "MXU lowering of f32 (~59 dB); 'balanced' = 3-pass "
                        "MXU (~82 dB, 0.73x); 'quality' = 6-pass true fp32 "
                        "(bit-parity with the CPU/torch reference path, "
                        "0.61x) + bit-exact wire. Explicit --wire wins.")
    parser.add_argument("--wire", default="auto",
                        choices=["auto", "float32", "float16", "int16", "int8"],
                        help="Wire format of the device engine's stems fetch. "
                        "auto = int16 when writing 16-bit PCM wav (same bytes "
                        "as float16 but peak-scaled: wire error stays below "
                        "the output format's own quantization, where float16 "
                        "is ~16 PCM LSBs near peak), else float16; "
                        "float32 = bit-exact; int8 = half the fetch bytes at "
                        "~44 dB SNR (block-adaptive; preview/streaming "
                        "grade).")
    return parser


def main(opts=None):
    from demucs_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    parser = get_parser()
    args = parser.parse_args(opts)
    if args.list_models:
        models = list_models(args.repo)
        print("Bag of models:", end="\n    ")
        print("\n    ".join(models["bag"]))
        print("Single models:", end="\n    ")
        print("\n    ".join(models["single"]))
        sys.exit(0)
    if len(args.tracks) == 0:
        print("error: the following arguments are required: tracks", file=sys.stderr)
        sys.exit(1)

    name = args.sig if getattr(args, "sig", None) else args.name
    from demucs_tpu.presets import resolve_preset

    compute_dtype, matmul_precision, wire, banner = resolve_preset(
        args.preset, args.wire)
    if banner:
        print(banner)
    if wire == "auto":
        # 16-bit PCM wav output: the int16 wire (per-source peak-scaled, same
        # bytes as float16) keeps wire error below the output format's own
        # quantization; float16's relative step is ~16 PCM LSBs near peak.
        pcm16_out = not (args.float32 or args.int24 or args.mp3 or args.flac)
        wire = "int16" if pcm16_out else "float16"
    try:
        separator = Separator(
            model=name,
            repo=args.repo,
            device=args.device,
            shifts=args.shifts,
            split=args.split,
            overlap=args.overlap,
            progress=True,
            jobs=args.jobs,
            segment=args.segment,
            batch_size=args.batch_size,
            engine=args.engine,
            transfer_dtype=None if wire == "float32" else wire,
            length_bucket_seconds=args.length_bucket,
            tail_mode=args.tail_mode,
            bag_mode=args.bag_mode,
            compute_dtype=compute_dtype,
            matmul_precision=matmul_precision,
            shift_offsets=(tuple(int(x) for x in args.shift_offsets.split(","))
                           if args.shift_offsets else None),
        )
    except ModelLoadingError as error:
        fatal(error.args[0])

    max_allowed_segment = float("inf")
    if isinstance(separator.model, Model) and separator.model.kind == "htdemucs":
        max_allowed_segment = float(separator.model.segment)
    elif isinstance(separator.model, BagOfModels):
        max_allowed_segment = separator.model.max_allowed_segment
    if args.segment is not None and args.segment > max_allowed_segment:
        fatal(
            "Cannot use a Transformer model with a longer segment than it was "
            f"trained for. Maximum segment is: {max_allowed_segment}"
        )

    if isinstance(separator.model, BagOfModels):
        print(
            f"Selected model is a bag of {len(separator.model.models)} models. "
            "You will see that many progress bars per track."
        )

    if args.stem is not None and args.stem not in separator.model.sources:
        fatal(
            'error: stem "{stem}" is not in selected model. '
            "STEM must be one of {sources}.".format(
                stem=args.stem, sources=", ".join(separator.model.sources)
            )
        )
    out = args.out / name
    out.mkdir(parents=True, exist_ok=True)
    print(f"Separated tracks will be stored in {out.resolve()}")
    valid_tracks = []
    for track in args.tracks:
        if not track.exists():
            print(
                f"File {track} does not exist. If the path contains spaces, "
                'please try again after surrounding the entire path with quotes "".',
                file=sys.stderr,
            )
            continue
        valid_tracks.append(track)
    # Pipelined: on the device engine, track i's stems fetch (and stem
    # writes) overlap track i+1's compute.
    def _announced(tracks):
        for t in tracks:
            # announce when the track is picked up for decoding/dispatch
            # (separate.py:141 prints before processing), not when its
            # already-finished stems come out of the pipeline
            print(f"Separating track {t}")
            yield t

    for track, origin, res in separator.separate_audio_files(
            _announced(valid_tracks)):
        ext = "mp3" if args.mp3 else ("flac" if args.flac else "wav")
        kwargs = {
            "samplerate": separator.samplerate,
            "bitrate": args.mp3_bitrate,
            "preset": args.mp3_preset,
            "clip": args.clip_mode,
            "as_float": args.float32,
            "bits_per_sample": 24 if args.int24 else 16,
        }

        def _path(stem_name):
            stem = out / args.filename.format(
                track=track.name.rsplit(".", 1)[0],
                trackext=track.name.rsplit(".", 1)[-1],
                stem=stem_name,
                ext=ext,
            )
            stem.parent.mkdir(parents=True, exist_ok=True)
            return stem

        if args.stem is None:
            for stem_name, source in res.items():
                save_audio(source, str(_path(stem_name)), **kwargs)
        else:
            if args.other_method == "minus":
                save_audio(origin - res[args.stem], str(_path("minus_" + args.stem)), **kwargs)
            save_audio(res.pop(args.stem), str(_path(args.stem)), **kwargs)
            if args.other_method == "add":
                other_stem = np.zeros_like(next(iter(res.values())))
                for i in res.values():
                    other_stem += i
                save_audio(other_stem, str(_path("no_" + args.stem)), **kwargs)


if __name__ == "__main__":
    main()
