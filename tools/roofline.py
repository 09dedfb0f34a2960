"""Speed-of-light analysis for the flagship htdemucs forward AND train step.

Pulls FLOP/byte counts from XLA's cost model for the released topology
(channels 48, nfft 4096, 7.8 s segments) and reports, for a given measured
per-batch latency (tools/probe_compute.py / BENCHMARKS.md), the implied
fraction of TPU v5e peak and the roofline position (arithmetic intensity vs
the ridge point).

``--train`` analyzes the full jitted train step instead (augment + forward
+ backward + Adam + batch-EMA — the exact executable tools/bench_train.py
times), so the measured audio-s/s-trained numbers get the same
is-it-fast-or-just-measured treatment as inference. Pass ``--ms`` from the
BENCHMARKS.md Training table (e.g. 535.2 for batch 8 x 7.8 s).

Usage:
    python tools/roofline.py [--batch 16] [--ms 330] [--small]
    python tools/roofline.py --train --batch 8 --ms 535.2 --device axon

Costs come from the compiled executable of the selected --device: 'cpu' is
fast but reports unfused HLO bytes; an accelerator platform (e.g. 'axon')
gives the real fused TPU executable's cost model (always prefer it for
bytes — TPU fusion removes ~37% of the unfused traffic). Nothing executes.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# TPU v5e (per chip): 197 bf16 TFLOP/s, 394 int8 TOP/s, 16 GB HBM @ 819 GB/s.
V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--ms", type=float, default=None,
                        help="measured per-batch forward latency (ms) to "
                             "convert into fraction-of-peak; see "
                             "BENCHMARKS.md / tools/probe_compute.py")
    parser.add_argument("--small", action="store_true",
                        help="reduced test topology (fast compile)")
    parser.add_argument("--train", action="store_true",
                        help="analyze the full train step (augment + fwd + "
                        "bwd + Adam + EMA) instead of the forward")
    parser.add_argument("--segment", type=float, default=7.8)
    parser.add_argument("--remat", action="store_true",
                        help="train-step rematerialization (the long-"
                        "segment recipes)")
    parser.add_argument("--device", default="cpu",
                        help="backend to compile for: 'cpu' (fast, but "
                             "bytes-accessed reflects unfused CPU HLO) or an "
                             "accelerator platform (e.g. 'axon') for the "
                             "real fused TPU executable's cost model")
    args = parser.parse_args()

    import jax
    import numpy as np

    jax.config.update("jax_default_device", jax.devices(args.device)[0])

    from demucs_tpu.models import htdemucs as ht
    from demucs_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()

    if args.small:
        cfg = ht.HTDemucsConfig(channels=16, nfft=2048, t_layers=2,
                                t_heads=4, segment=0.5, samplerate=8000)
    else:
        cfg = ht.HTDemucsConfig(segment=args.segment)
    params = ht.init_htdemucs(cfg, seed=0)
    L = cfg.training_length

    if args.train:
        # the exact executable tools/bench_train.py times: augment + forward
        # + backward + Adam + batch-EMA (train/solver.py)
        from demucs_tpu.models.registry import Model
        from demucs_tpu.train.config import TrainArgs, apply_overrides
        from demucs_tpu.train.solver import Solver, make_optimizer

        model = Model("htdemucs", cfg, params)
        targs = apply_overrides(TrainArgs(), {
            "remat": args.remat,
            "ema.batch": (0.9995,),
            "dset.shift": 0.5,
            "augment.remix.group_size": min(4, args.batch),
        })
        solver = Solver({}, model, make_optimizer(targs, model), targs,
                        folder="/tmp/roofline_train_xp")
        T = cfg.training_length + int(targs.dset.samplerate * targs.dset.shift)
        sources = np.zeros((args.batch, len(cfg.sources), cfg.audio_channels,
                            T), np.float32)
        key = jax.random.PRNGKey(0)
        lowered = solver._train_step.lower(params, solver.opt_state, sources,
                                           key)
    else:
        mix = np.zeros((args.batch, cfg.audio_channels, L), np.float32)
        fwd = jax.jit(ht.forward, static_argnames=("cfg",))
        lowered = fwd.lower(params, mix, cfg)
    cost = lowered.compile().cost_analysis()
    flops = float(cost.get("flops", 0.0))
    bytes_accessed = float(cost.get("bytes accessed", 0.0))

    audio_s = args.batch * L / cfg.samplerate
    what = "train step" if args.train else "forward"
    print(f"{what}: channels={cfg.channels} nfft={cfg.nfft} "
          f"t_layers={cfg.t_layers} segment={float(cfg.segment)}s "
          f"batch={args.batch} ({audio_s:.1f} audio-s/batch)"
          + (" remat" if args.train and args.remat else ""))
    print(f"XLA cost model: {flops/1e9:.1f} GFLOP, "
          f"{bytes_accessed/1e9:.2f} GB accessed, "
          f"arithmetic intensity {flops/max(bytes_accessed,1):.1f} FLOP/B")
    ridge = V5E_BF16_TFLOPS * 1e12 / (V5E_HBM_GBPS * 1e9)
    print(f"v5e ridge point: {ridge:.0f} FLOP/B "
          f"({'compute' if flops/max(bytes_accessed,1) > ridge else 'memory'}"
          f"-bound side of the roofline)")
    print(f"per audio-second: {flops/audio_s/1e9:.1f} GFLOP")

    comp_sol = flops / (V5E_BF16_TFLOPS * 1e12)
    mem_sol = bytes_accessed / (V5E_HBM_GBPS * 1e9)
    print(f"speed of light: compute {comp_sol*1e3:.1f} ms "
          f"(bf16 MXU peak), memory {mem_sol*1e3:.1f} ms (HBM peak) "
          f"-> bound {max(comp_sol, mem_sol)*1e3:.1f} ms "
          f"= {audio_s/max(comp_sol, mem_sol):.0f} audio-s/s ceiling")
    if args.ms:
        t = args.ms / 1e3
        print(f"measured {args.ms:.0f} ms/batch -> "
              f"{flops/t/1e12:.1f} TFLOP/s "
              f"({100*flops/t/(V5E_BF16_TFLOPS*1e12):.1f}% of bf16 peak), "
              f"{bytes_accessed/t/1e9:.0f} GB/s "
              f"({100*bytes_accessed/t/(V5E_HBM_GBPS*1e9):.1f}% of HBM peak), "
              f"{audio_s/t:.0f} audio-s/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
