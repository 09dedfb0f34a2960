#!/usr/bin/env python
"""Sustained on-device training proof: a few-hundred-step overfit run through
the REAL ``Solver.train()`` loop on the TPU (not isolated step timings —
that's tools/bench_train.py).

Exercises, on the chip, everything a production run uses: dataset metadata
build + WAV loader, in-step gather-free augmentations, the jitted
fwd+bwd+Adam+EMA step, per-epoch full-track overlap-add validation with
nsdr, best-state tracking, atomic checkpointing — plus a MID-RUN STOP and
RESUME (the run is split into two ``Solver.train()`` calls sharing the XP
folder, so the second provably restarts from the checkpoint).

The dataset is synthetic but learnable: each source is a distinct
band-limited signal (tone stack / filtered noise), so the loss curve must
actually DESCEND — a flat curve fails the driver. Results (loss curve,
wall-clock, steps/s) print as JSON for BENCHMARKS.md's Training section.

Usage (on the TPU host; ~10-15 min at the defaults):
    python tools/train_overfit.py [--epochs 24] [--batch 4] [--channels 48]
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import argparse
import json
import shutil
import time
from pathlib import Path

import numpy as np

SOURCES = ("drums", "bass", "other", "vocals")


def synthesize_dataset(root: Path, sr: int, seed: int = 0):
    """MusdbHQ-layout dataset with per-source distinct, learnable content."""
    from demucs_tpu import audio as dta

    rng = np.random.default_rng(seed)

    def stem(kind: str, T: int) -> np.ndarray:
        t = np.arange(T) / sr
        if kind == "drums":  # clicky impulses + low thump
            x = np.zeros(T)
            period = int(0.5 * sr)
            for p in range(0, T - 400, period):
                x[p:p + 400] += np.hanning(400) * np.sin(
                    2 * np.pi * 70 * t[:400])
            x += 0.02 * rng.standard_normal(T)
        elif kind == "bass":
            x = 0.3 * np.sin(2 * np.pi * 55 * t) + 0.1 * np.sin(
                2 * np.pi * 110 * t + 0.5)
        elif kind == "other":  # mid-band chord
            x = sum(0.1 * np.sin(2 * np.pi * f * t + i)
                    for i, f in enumerate((262, 330, 392)))
        else:  # vocals: slow vibrato tone
            x = 0.25 * np.sin(2 * np.pi * (440 + 8 * np.sin(2 * np.pi * 5 * t))
                              * t)
        x = np.stack([x, np.roll(x, 7)])  # slight stereo decorrelation
        return (x * 0.5).astype(np.float32)

    for subset, tracks in [("train", (("A", 30.0), ("B", 30.0),
                                      ("Val", 12.0))),
                           ("test", (("Test", 8.0),))]:
        for name, dur in tracks:
            tdir = root / subset / name
            tdir.mkdir(parents=True, exist_ok=True)
            T = int(dur * sr)
            stems = []
            for source in SOURCES:
                x = stem(source, T)
                dta.write_wav(tdir / f"{source}.wav", x, sr, as_float=True)
                stems.append(x)
            dta.write_wav(tdir / "mixture.wav", sum(stems), sr, as_float=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=24,
                        help="total epochs (run as two halves w/ resume)")
    parser.add_argument("--batches-per-epoch", type=int, default=10)
    # batch 8 = the geometry bench_train measures AND the one this
    # deployment's remote AOT service compiles: batch 4 non-remat trips its
    # known [512,48] post-optimization layout bug (CLAUDE.md measured facts)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--channels", type=int, default=48,
                        help="released width by default")
    parser.add_argument("--segment", type=float, default=7.8)
    parser.add_argument("--root", default="/tmp/overfit_run")
    parser.add_argument("--keep", action="store_true",
                        help="keep the run dir (default: wiped first)")
    args = parser.parse_args()

    from demucs_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()

    from demucs_tpu.train.config import TrainArgs, apply_overrides, xp_signature
    from demucs_tpu.train.train import get_solver

    root = Path(args.root)
    if root.exists() and not args.keep:
        shutil.rmtree(root)
    sr = 44100
    synthesize_dataset(root / "musdb", sr)

    def make_args(epochs: int):
        return apply_overrides(TrainArgs(), {
            "model": "htdemucs",
            "model_args": {"channels": args.channels,
                           "segment": args.segment},
            "dset.musdb": str(root / "musdb"),
            "dset.metadata": str(root / "metadata"),
            "dset.samplerate": sr,
            "dset.segment": args.segment,
            "dset.shift": 0.5,
            "dset.valid_tracks": ("Val",),
            "epochs": epochs,
            "batch_size": args.batch,
            "max_batches": args.batches_per_epoch,
            "augment.repitch.proba": 0.0,
            "augment.remix.group_size": min(4, args.batch),
            "test.every": epochs,  # nsdr valid runs every epoch regardless
            "test.sdr": False,
            "test.workers": 0,
            "test.shifts": 0,
            "ema.batch": (0.9995,),
            "ema.epoch": (0.99,),
            "out_dir": str(root / "outputs"),
            "misc.num_workers": 0,
        })

    half = args.epochs // 2
    full_sig = xp_signature(make_args(args.epochs))
    t0 = time.time()
    solver = get_solver(make_args(args.epochs))
    # First leg: SAME XP signature/folder (computed at construction), epoch
    # cap lowered afterwards so the loop stops mid-run with a checkpoint on
    # disk — a genuine interrupted-training state, not a warm start.
    solver.args.epochs = half
    solver.train()
    t_half = time.time()
    assert len(solver.history) == half, len(solver.history)
    del solver

    # Resume: a FRESH solver on the full args finds checkpoint.tpk in the
    # same XP folder (xp_signature unchanged), replays history, restores
    # params/optimizer/EMA banks/rng and continues from epoch half+1.
    solver2 = get_solver(make_args(args.epochs))
    assert xp_signature(solver2.args) == full_sig
    resumed_at = len(solver2.history)
    solver2.train()
    t_end = time.time()

    losses = [m["train"]["loss"] for m in solver2.history]
    nsdr = [m["valid"].get("nsdr") for m in solver2.history]
    steps = args.epochs * args.batches_per_epoch
    record = {
        "metric": "overfit_train_loss_final",
        "value": float(losses[-1]),
        "loss_first": float(losses[0]),
        "loss_curve": [round(float(v), 5) for v in losses],
        "valid_nsdr_curve": [None if v is None else round(float(v), 3)
                             for v in nsdr],
        "epochs": args.epochs,
        "steps": steps,
        "resumed_at_epoch": resumed_at,
        "wall_s": round(t_end - t0, 1),
        "wall_first_half_s": round(t_half - t0, 1),
        "steps_per_s_steady": round(
            (steps / 2) / max(t_end - t_half, 1e-9), 3),
        "audio_s_per_s_trained": round(
            (steps / 2) * args.batch * args.segment / max(t_end - t_half,
                                                          1e-9), 1),
    }
    print(json.dumps(record))
    assert losses[-1] < 0.6 * losses[0], (
        f"loss did not descend: {losses[0]} -> {losses[-1]}")
    assert resumed_at >= half, (resumed_at, half)


if __name__ == "__main__":
    main()
