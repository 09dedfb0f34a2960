"""Training-step throughput bench: steps/s and audio-seconds/s trained.

The counterpart of the reference's tools/bench.py fwd+bwd timing
(bench.py:46-78). Runs the jitted train step (augment + forward + grads +
optimizer + EMA math) on synthetic batches.

Usage:
    python tools/bench_train.py [--batch 8] [--segment 7.8] [--steps 5] [--remat]
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import argparse
import json
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--segment", type=float, default=7.8)
    parser.add_argument("--steps", type=int, default=5)
    parser.add_argument("--remat", action="store_true")
    parser.add_argument("--channels", type=int, default=48)
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="forward compute dtype (params/grads/optimizer "
                             "state stay fp32 — mixed-precision training)")
    args = parser.parse_args()

    import jax

    from demucs_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()

    from demucs_tpu.models import htdemucs as ht
    from demucs_tpu.models.registry import Model
    from demucs_tpu.train.config import TrainArgs, apply_overrides
    from demucs_tpu.train.solver import Solver, make_optimizer

    cfg = ht.HTDemucsConfig(channels=args.channels, segment=args.segment,
                            compute_dtype=args.dtype)
    params = ht.init_htdemucs(cfg, seed=0)
    model = Model("htdemucs", cfg, params)
    targs = apply_overrides(TrainArgs(), {
        "remat": args.remat,
        "ema.batch": (0.9995,),
        "dset.shift": 0.5,
        "augment.remix.group_size": min(4, args.batch),
    })
    optimizer = make_optimizer(targs, model)
    solver = Solver({}, model, optimizer, targs, folder="/tmp/bench_train_xp")
    step = solver._train_step

    B = args.batch
    S, C = len(cfg.sources), cfg.audio_channels
    T = cfg.training_length + int(targs.dset.samplerate * targs.dset.shift)
    rng_np = np.random.default_rng(0)
    sources = jax.device_put(
        (rng_np.standard_normal((B, S, C, T)) * 0.05).astype(np.float32))
    key = jax.random.PRNGKey(0)

    t0 = time.time()
    p, o, m = step(model.params, solver.opt_state, sources, key)
    _ = float(m["loss"])
    print(f"# compile+first step: {time.time()-t0:.1f}s", file=_sys.stderr)

    times = []
    for i in range(args.steps):
        key = jax.random.fold_in(key, i)
        t0 = time.time()
        p, o, m = step(p, o, sources, key)
        _ = float(m["loss"])
        times.append(time.time() - t0)
    dt = min(times)
    audio_s = B * args.segment
    record = {
        "metric": "train_audio_seconds_per_s",
        "value": round(audio_s / dt, 3),
        "unit": "audio_s/s",
        "step_ms": round(dt * 1000, 1),
        "remat": args.remat,
    }
    try:
        # Unlike the reference bench (which resets the CUDA peak counter
        # before the timed region, tools/bench.py:26-43), JAX exposes no
        # peak reset: this is the PROCESS-LIFETIME peak (init + compile +
        # steps). bytes_in_use after the last step is the steady-state
        # residency (params + optimizer state + live buffers).
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        if peak:
            record["peak_hbm_process_gb"] = round(peak / 2**30, 2)
        now = stats.get("bytes_in_use")
        if now:
            record["hbm_steady_gb"] = round(now / 2**30, 2)
    except Exception:
        pass
    try:
        # Compile-time buffer assignment of the train-step executable — the
        # per-step HBM figure that works even where the runtime returns no
        # memory_stats() (this relay): args + outputs + temps - aliased
        # (donated params/opt state alias their outputs).
        mem = step.lower(p, o, sources, key).compile().memory_analysis()
        if mem is not None:
            gib = float(2**30)
            record["hbm_compiletime_gb"] = round(
                (int(mem.argument_size_in_bytes)
                 + int(mem.output_size_in_bytes)
                 + int(mem.temp_size_in_bytes)
                 - int(mem.alias_size_in_bytes)) / gib, 3)
            record["hbm_compiletime"] = {
                "argument_gb": round(int(mem.argument_size_in_bytes) / gib, 3),
                "output_gb": round(int(mem.output_size_in_bytes) / gib, 3),
                "temp_gb": round(int(mem.temp_size_in_bytes) / gib, 3),
                "alias_gb": round(int(mem.alias_size_in_bytes) / gib, 3),
            }
    except Exception:
        pass
    print(json.dumps(record))


if __name__ == "__main__":
    main()
