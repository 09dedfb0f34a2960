#!/usr/bin/env python
"""Benchmark: htdemucs separation throughput (audio-seconds/s per chip).

Runs the flagship HTDemucs (channels=48, nfft=4096, 5 transformer layers,
7.8 s training segment — the released htdemucs topology) through the full
inference engine and reports one JSON line:

    {"metric": ..., "value": median, "unit": "audio_s/s", "vs_baseline": ...,
     "min": ..., "max": ..., "samples": [...], "single_track": ...,
     "no_fetch": ...}

``no_fetch`` is the same dispatch path blocked on-device (no stems
download): the engine's link-independent rate; headline - no_fetch gap is
pure wire time on this deployment's ~10-40 MB/s relay.

The headline is the SUSTAINED pipelined multi-track rate (default --tracks 4:
each track's device->host stems fetch overlaps the next track's compute —
the serving configuration; reference separates tracks strictly serially,
demucs/separate.py:140-218). The per-track rate of a lone track is also
measured on the same compiled executables and reported as "single_track".

vs_baseline is measured against the BASELINE.md target of 10x realtime per
chip (the reference publishes no formal GPU speed; its CPU speed is ~0.67x
realtime, README.md:300).

Sampling policy: every configuration is timed `--repeats` times (default 5)
after one compile/warmup run; the JSON carries median/min/max and ALL raw
per-run throughput samples. There is no result-conditioned re-sampling.
"""

from __future__ import annotations

import argparse
import json
import random
import statistics
import sys
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--seconds", type=float, default=60.0, help="track length")
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--shifts", type=int, default=1)
    parser.add_argument("--overlap", type=float, default=0.25)
    parser.add_argument("--dtype", default=None,
                        choices=["float32", "bfloat16"],
                        help="model compute dtype (default float32; "
                        "--preset fast implies bfloat16)")
    parser.add_argument("--transfer", default=None,
                        choices=["float32", "float16", "int16", "int8"],
                        help="wire format of the per-track stems fetch "
                        "(default float16, matching the CLI's default-quality "
                        "path; --preset fast implies int8; the API default "
                        "is bit-exact float32)")
    parser.add_argument("--repeats", type=int, default=5)
    parser.add_argument("--tracks", type=int, default=4,
                        help="N>1: sustained multi-track throughput via the "
                        "pipelined engine (fetch of track i overlaps compute "
                        "of track i+1). 1 = single-track only.")
    parser.add_argument("--no-single", action="store_true",
                        help="skip the extra single-track measurement")
    parser.add_argument("--no-fetchless", action="store_true",
                        help="skip the no-fetch (device-resident) measurement")
    parser.add_argument("--flash", action="store_true",
                        help="use the Pallas flash-attention kernel")
    parser.add_argument("--profile", metavar="DIR", default=None,
                        help="capture a jax.profiler trace of one timed run")
    parser.add_argument("--preset",
                        choices=["default", "fast", "balanced", "quality"],
                        default="default",
                        help="the CLI quality/speed ladder "
                        "(demucs_tpu/presets.py): fast = bf16 + int8 wire; "
                        "balanced = 3-pass MXU (~82 dB vs true fp32); "
                        "quality = 6-pass true fp32 + bit-exact wire")
    parser.add_argument("--model", default="htdemucs",
                        choices=["htdemucs", "htdemucs_ft", "htdemucs_6s",
                                 "hdemucs_mmi", "mdx_extra", "demucs_v2"],
                        help="released topology to bench (random-init params "
                        "at released widths/segments — zoo weights need "
                        "network; perf is weight-independent). Bags run all "
                        "members; segment-44 kinds exercise the exact-tail "
                        "path (fixed offsets keep tail executables warm "
                        "across repeats).")
    parser.add_argument("--tail-mode", default="exact",
                        choices=["exact", "uniform"])
    parser.add_argument("--bag-mode", default="auto",
                        choices=["auto", "stacked", "sequential"],
                        help="homogeneous-bag strategy on one chip: stacked "
                        "= ONE program for all members+shifts (merged MXU "
                        "batches); sequential = the reference-style member "
                        "loop")
    parser.add_argument("--length-bucket", type=float, default=None,
                        help="length_bucket_seconds: quantize track length "
                        "so one executable serves many lengths")
    args = parser.parse_args()
    # sentinel-None defaults: an explicitly passed --dtype/--transfer always
    # wins over the preset (the shared contract in demucs_tpu/presets.py)
    from demucs_tpu.presets import resolve_preset

    compute_dtype, matmul_precision, wire, _banner = resolve_preset(
        args.preset, args.transfer)
    if args.dtype is None:
        args.dtype = compute_dtype or "float32"
    args.transfer = (wire if wire not in (None, "auto")
                     else ("float16" if args.transfer is None
                           else args.transfer))

    import jax

    from demucs_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()

    from demucs_tpu.models import htdemucs as ht
    from demucs_tpu.models.registry import BagOfModels, Model
    from demucs_tpu.inference.apply import apply_model, apply_model_tracks

    def make_ht(sources=("drums", "bass", "other", "vocals"), seed=0):
        # Released htdemucs topology (segment 7.8 s, remote/files meta).
        cfg = ht.HTDemucsConfig(sources=tuple(sources), segment=7.8,
                                compute_dtype=args.dtype,
                                matmul_precision=matmul_precision,
                                t_flash_attn=args.flash)
        return Model("htdemucs", cfg,
                     jax.device_put(ht.init_htdemucs(cfg, seed=seed)))

    def make_hd(seed=0, segment=44.0):
        # MDX-era HDemucs width (conf/config.yaml defaults), bag segment 44
        # (zoo/repo.py REMOTE_BAGS / reference remote/*.yaml).
        from demucs_tpu.models import hdemucs as hd

        cfg = hd.HDemucsConfig(segment=segment)
        return Model("hdemucs", cfg,
                     jax.device_put(hd.init_hdemucs(cfg, seed=seed)))

    if args.model == "htdemucs":
        model = make_ht()
    elif args.model == "htdemucs_ft":
        model = BagOfModels([make_ht(seed=s) for s in range(4)],
                            weights=[[1.0, 0.0, 0.0, 0.0],
                                     [0.0, 1.0, 0.0, 0.0],
                                     [0.0, 0.0, 1.0, 0.0],
                                     [0.0, 0.0, 0.0, 1.0]])
    elif args.model == "htdemucs_6s":
        model = make_ht(sources=("drums", "bass", "other", "vocals",
                                 "guitar", "piano"))
    elif args.model == "hdemucs_mmi":
        model = make_hd()
    elif args.model == "mdx_extra":
        model = BagOfModels([make_hd(seed=s) for s in range(4)], segment=44.0)
    else:  # demucs_v2
        from demucs_tpu.models import demucs as d2

        cfg2 = d2.DemucsConfig()
        model = Model("demucs", cfg2,
                      jax.device_put(d2.init_demucs(cfg2, seed=0)))

    first = model.models[0] if isinstance(model, BagOfModels) else model
    cfg = first.cfg
    sr = cfg.samplerate
    L = int(args.seconds * sr)
    mixes = [
        (np.random.default_rng(i).standard_normal((1, 2, L)) * 0.1
         ).astype(np.float32)
        for i in range(max(1, args.tracks))
    ]

    kw = dict(
        shifts=args.shifts,
        split=True,
        overlap=args.overlap,
        batch_size=args.batch_size,
        transfer_dtype=None if args.transfer == "float32" else args.transfer,
        tail_mode=args.tail_mode,
        bag_mode=args.bag_mode,
        length_bucket_seconds=args.length_bucket,
    )

    def run_single():
        return apply_model(model, mixes[0], rng=random.Random(42), **kw)

    def run_pipelined():
        outs = list(apply_model_tracks(model, mixes, rng=random.Random(42), **kw))
        return outs[-1]

    run = run_pipelined if args.tracks > 1 else run_single

    # Warmup / compile on the SAME track length (one executable). The
    # compiled pass/fetch programs are shared by the single-track and
    # no-fetch runs. Phase timings are printed so a warmup regression is
    # attributable to a specific executable load (the relay's first load of
    # each new executable costs 25-300 s; the XLA compile itself is fast).
    warm_phases = {}
    t0 = time.time()
    out = run_single()  # loads prep + THE pass executable + final + fetch
    warm_phases["single_first"] = round(time.time() - t0, 1)
    if args.tracks > 1:
        t0 = time.time()
        out = run_pipelined()  # reuses every executable; no new loads
        warm_phases["pipelined_first"] = round(time.time() - t0, 1)
    warm = sum(warm_phases.values())
    print(f"# warmup phases {warm_phases}", file=sys.stderr, flush=True)

    def timed(fn, n):
        times = []
        for i in range(n):
            if args.profile and fn is run and i == n - 1:
                try:
                    jax.profiler.start_trace(args.profile)
                except Exception as exc:  # profiling may be unavailable via the tunnel
                    print(f"# profiler unavailable: {exc}", file=sys.stderr)
                    args.profile = None
            t0 = time.time()
            res = fn()
            times.append(time.time() - t0)
            if args.profile and fn is run and i == n - 1:
                jax.profiler.stop_trace()
        assert np.isfinite(res).all()
        return times

    times = timed(run, args.repeats)

    # per-chip: the device engine auto-shards over every local accelerator
    # chip (parallel/sharded.py::auto_mesh), so normalize by chip count.
    n_chips = (len(jax.local_devices())
               if jax.default_backend() != "cpu" else 1)
    audio_s = args.tracks * args.seconds
    samples = [round(audio_s / t / n_chips, 3) for t in times]

    single = None
    if args.tracks > 1 and not args.no_single:
        run_single()  # warm any residual single-track dispatch path
        stimes = timed(run_single, max(3, args.repeats - 2))
        single = round(
            statistics.median(args.seconds / t / n_chips for t in stimes), 3)

    # No-fetch rate: the same dispatch path (input upload + every device
    # pass + the wire-format program) blocked on via a scalar reduction of
    # the device-resident stems instead of downloading them. This is the
    # sustained rate when stems stay on-chip (on-device eval) and isolates
    # the engine from the relay's large-transfer weather; the gap between
    # it and the headline is pure wire time.
    no_fetch = None
    resident = None
    if not args.no_fetchless:
        from demucs_tpu.inference.engine import _dispatch_track, stage_track
        from demucs_tpu.parallel.sharded import auto_mesh
        import jax.numpy as jnp

        dkw = dict(kw)
        dkw.pop("split", None)
        # same mesh policy as apply_model so multi-chip hosts reuse the
        # headline's sharded executable (and the /n_chips normalization holds)
        dkw["mesh"] = auto_mesh()

        @jax.jit
        def _sync(*leaves):
            return sum(jnp.sum(x[..., ::4096].astype(jnp.float32))
                       for x in leaves)

        def _blocked(result):
            leaves = [x for x in jax.tree.leaves(result)
                      if isinstance(x, jax.Array)]
            return float(_sync(*leaves))

        def run_no_fetch():
            return _blocked(_dispatch_track(model, mixes[0],
                                            rng=random.Random(42), **dkw)[0])

        run_no_fetch()  # compile the tiny sync program
        ftimes = timed(run_no_fetch, max(3, args.repeats - 2))
        no_fetch = round(
            statistics.median(args.seconds / t / n_chips for t in ftimes), 3)

        # Device-resident rate: input pre-staged on device AND stems blocked
        # on-device — the pure dispatch+compute path, no host link at either
        # end. no_fetch - device_resident is the input upload; headline -
        # no_fetch is the stems download (BENCHMARKS.md breakdown).
        if dkw["mesh"] is None and args.length_bucket is None:
            staged = stage_track(
                model, mixes[0], shifts=args.shifts,
                input_transfer_dtype=(None if args.transfer == "float32"
                                      else "float16"))

            def run_resident():
                return _blocked(_dispatch_track(
                    model, mixes[0], rng=random.Random(42),
                    prestaged=staged, **dkw)[0])

            run_resident()
            rtimes = timed(run_resident, max(3, args.repeats - 2))
            resident = round(
                statistics.median(args.seconds / t / n_chips for t in rtimes), 3)

    median = statistics.median(samples)
    print(
        f"# warmup {warm:.1f}s, runs {[f'{t:.2f}' for t in times]}, "
        f"tracks={args.tracks} transfer={args.transfer} "
        f"device={jax.devices()[0].device_kind} x{n_chips}",
        file=sys.stderr,
    )
    record = {
        "metric": "audio_seconds_per_s_per_chip",
        "value": round(median, 3),
        "unit": "audio_s/s",
        "vs_baseline": round(median / 10.0, 3),
        "min": min(samples),
        "max": max(samples),
        "samples": samples,
    }
    if args.model != "htdemucs":
        record["model"] = args.model
    if args.tail_mode != "exact":
        record["tail_mode"] = args.tail_mode
    if args.preset != "default":
        record["preset"] = args.preset
    if single is not None:
        record["single_track"] = single
    if no_fetch is not None:
        record["no_fetch"] = no_fetch
    if resident is not None:
        record["device_resident"] = resident
    try:  # peak HBM of the whole bench (reference tools/bench.py:26-43 parity)
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        if peak:
            record["peak_hbm_gb"] = round(peak / 2**30, 2)
    except Exception:
        pass
    # Compile-time buffer assignment of the dominant (pass) executable —
    # the HBM number that works even where the runtime returns no
    # memory_stats() (this relay). Same flags as the timed path.
    from demucs_tpu.inference.engine import pass_memory_analysis
    from demucs_tpu.parallel.sharded import auto_mesh

    mem = pass_memory_analysis(
        model, L, shifts=args.shifts, overlap=args.overlap,
        batch_size=args.batch_size, mesh=auto_mesh())
    if mem is not None:
        record["hbm_compiletime_gb"] = mem["peak_estimate_gb"]
        record["hbm_compiletime"] = mem
    record["warmup_s"] = warm_phases
    print(json.dumps(record))


if __name__ == "__main__":
    main()
