#!/usr/bin/env python
"""Measure the serving warm path on the real chip: prewarmed pinned offsets
vs an unseen offset on an exact-tail model (the seg-44 first-request cliff,
BENCHMARKS.md zoo notes / docs/api.md "Serving guidance").

Method (one process, hdemucs at its released seg-44 geometry, 60 s track):
  1. prewarm(track_seconds, shift_offsets=PINNED)  -> pays every one-time
     compile+load up front (prints its wall time),
  2. a "request" at the PINNED offsets             -> warm path,
  3. a "request" at an UNSEEN offset               -> the cliff prewarm
     exists to remove (1-2 new tail executables through the relay).
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import argparse
import json
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--seconds", type=float, default=60.0)
    parser.add_argument("--segment", type=float, default=44.0)
    parser.add_argument("--offsets", default="4410,13230")
    parser.add_argument("--unseen", type=int, default=17640)
    args = parser.parse_args()

    import jax

    from demucs_tpu.models import hdemucs as hd
    from demucs_tpu.models.registry import Model
    from demucs_tpu.inference.apply import apply_model
    from demucs_tpu.inference.prewarm import prewarm
    from demucs_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    cfg = hd.HDemucsConfig(segment=args.segment)
    model = Model("hdemucs", cfg, jax.device_put(hd.init_hdemucs(cfg, seed=0)))
    offsets = tuple(int(x) for x in args.offsets.split(","))
    L = int(args.seconds * cfg.samplerate)
    mix = (np.random.default_rng(0).standard_normal((1, 2, L)) * 0.1
           ).astype(np.float32)

    report = prewarm(model, args.seconds, shifts=1, shift_offsets=offsets,
                     engine="device", transfer_dtype="float16", verbose=True)

    def request(offs):
        t0 = time.perf_counter()
        out = apply_model(model, mix, shifts=1, engine="device",
                          transfer_dtype="float16", shift_offsets=offs)
        assert np.isfinite(out).all()
        return round(time.perf_counter() - t0, 2)

    warm1 = request(offsets)
    warm2 = request(offsets)
    cold = request((args.unseen,))
    cold_again = request((args.unseen,))
    print(json.dumps({
        "prewarm_s": report[0]["warm_time_s"],
        "request_pinned_s": warm1,
        "request_pinned_repeat_s": warm2,
        "request_unseen_offset_s": cold,
        "request_unseen_repeat_s": cold_again,
        "offsets": offsets,
        "unseen": args.unseen,
    }))


if __name__ == "__main__":
    main()
