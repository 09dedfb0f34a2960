"""Minimal standalone separation example (reference: tools/simple_separate.py).

Shows the bare API path without the CLI: load model -> read wav -> separate ->
save stems.

Usage:
    python tools/simple_separate.py track.wav -n htdemucs -o out_dir
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import argparse
import time
from pathlib import Path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("track", type=Path)
    parser.add_argument("-n", "--name", default="htdemucs")
    parser.add_argument("--repo", type=Path, default=None)
    parser.add_argument("-o", "--out", type=Path, default=Path("separated_simple"))
    parser.add_argument("--shifts", type=int, default=1)
    parser.add_argument("--json-metrics", action="store_true")
    args = parser.parse_args()

    from demucs_tpu.audio import read_audio, save_audio
    from demucs_tpu.inference.apply import apply_model
    from demucs_tpu.zoo.pretrained import get_model

    t0 = time.time()
    model = get_model(args.name, repo=args.repo)
    t_load = time.time() - t0

    t0 = time.time()
    wav, sr = read_audio(args.track, samplerate=model.samplerate,
                         channels=model.audio_channels)
    t_read = time.time() - t0

    t0 = time.time()
    stems = apply_model(model, wav[None], shifts=args.shifts)[0]
    t_sep = time.time() - t0

    args.out.mkdir(parents=True, exist_ok=True)
    t0 = time.time()
    for name, stem in zip(model.sources, stems):
        save_audio(stem, args.out / f"{name}.wav", model.samplerate)
    t_save = time.time() - t0

    duration = wav.shape[-1] / model.samplerate
    rtf = t_sep / duration
    if args.json_metrics:
        import json

        print(json.dumps({
            "duration_s": duration, "load_s": t_load, "read_s": t_read,
            "separate_s": t_sep, "save_s": t_save, "rtf": rtf,
            "audio_seconds_per_s": duration / t_sep,
        }))
    else:
        print(f"{duration:.1f}s audio: load {t_load:.1f}s, read {t_read:.2f}s, "
              f"separate {t_sep:.2f}s (RTF {rtf:.3f}), save {t_save:.2f}s")


if __name__ == "__main__":
    main()
