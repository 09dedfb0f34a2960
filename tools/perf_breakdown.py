"""Decompose htdemucs TPU inference cost: H2D, compute, D2H, per dtype.

Run with nothing else on the host. Usage:
    python tools/perf_breakdown.py [--dtype float32] [--batch 8] [--skip-transfers]
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))


import argparse
import time

import numpy as np


def timed(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dtype", default="float32")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--skip-transfers", action="store_true")
    args = parser.parse_args()

    import jax

    from demucs_tpu.models import htdemucs as ht

    cfg = ht.HTDemucsConfig(segment=7.8, compute_dtype=args.dtype)
    params = jax.device_put(ht.init_htdemucs(cfg, seed=0))
    B, L = args.batch, cfg.training_length
    rng = np.random.default_rng(0)
    x_np = (rng.standard_normal((B, 2, L)) * 0.1).astype(np.float32)

    dev = jax.devices()[0]
    print(f"device={dev.device_kind} dtype={args.dtype} B={B} L={L}")

    if not args.skip_transfers:
        # H2D: 22MB for B=8 input
        h2d = timed(lambda: jax.device_put(x_np, dev).block_until_ready())
        print(f"H2D input ({x_np.nbytes/2**20:.0f} MB): {h2d*1000:.0f} ms "
              f"-> {x_np.nbytes/2**20/h2d:.0f} MB/s")
        out_np = np.zeros((B, 4, 2, L), np.float32)
        big = jax.device_put(out_np, dev)
        big.block_until_ready()
        d2h = timed(lambda: np.asarray(big))
        print(f"D2H output ({out_np.nbytes/2**20:.0f} MB): {d2h*1000:.0f} ms "
              f"-> {out_np.nbytes/2**20/d2h:.0f} MB/s")

    fwd_sum = jax.jit(lambda p, m: ht.forward(p, m, cfg).sum())
    x_dev = jax.device_put(x_np, dev)
    t0 = time.time()
    _ = float(fwd_sum(params, x_dev))
    print(f"compile+first run: {time.time()-t0:.1f} s")
    compute = timed(lambda: float(fwd_sum(params, x_dev)))
    print(f"compute-only: {compute*1000:.0f} ms/batch -> "
          f"{B*7.8/compute:.1f} audio_s/s")

    fwd = jax.jit(lambda p, m: ht.forward(p, m, cfg))
    _ = np.asarray(fwd(params, x_dev))
    e2e = timed(lambda: np.asarray(fwd(params, jax.device_put(x_np, dev))))
    print(f"e2e (H2D+compute+D2H): {e2e*1000:.0f} ms/batch -> "
          f"{B*7.8/e2e:.1f} audio_s/s")


if __name__ == "__main__":
    main()
