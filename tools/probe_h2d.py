"""Probe host->device (upload) throughput on the relay: single transfers of
increasing size, and chunked sequential/concurrent uploads of one 10.6 MB
track (the engine's per-track input). Mirrors tools/probe_d2h2.py, which
found the d2h side collapses on >40 MB single transfers and gains ~40% from
4-way concurrent 12 MB chunks."""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import time

import numpy as np
import jax
import jax.numpy as jnp


def up(buf):
    """device_put + force completion via a computed readback (host-cached
    futures make block_until_ready unreliable on this relay)."""
    d = jax.device_put(buf)
    float(jnp.sum(d[..., ::4096].astype(jnp.float32)))
    return d


def main():
    rng = np.random.default_rng(0)
    # warm the tiny sync program
    up(rng.standard_normal((4, 1024)).astype(np.float32))

    for mb in (1, 4, 8, 16, 26):
        buf = rng.standard_normal((mb * 2**20 // 4,)).astype(np.float32)
        t0 = time.time()
        up(buf)
        dt = time.time() - t0
        print(f"single {mb:3d} MB: {dt:6.2f} s  ({mb/dt:5.1f} MB/s)", flush=True)

    # chunked upload of one fp16 track (60 s stereo = 10.6 MB)
    track = rng.standard_normal((2, 60 * 44100)).astype(np.float16)
    mbt = track.nbytes / 2**20
    for n_chunks in (1, 2, 4, 8):
        step = -(-track.shape[-1] // n_chunks)
        parts = [track[:, i * step:(i + 1) * step] for i in range(n_chunks)]
        t0 = time.time()
        devs = [jax.device_put(p) for p in parts]  # dispatch all, then sync
        s = sum(float(jnp.sum(d[..., ::4096].astype(jnp.float32))) for d in devs)
        dt = time.time() - t0
        print(f"track {mbt:.1f} MB in {n_chunks} seq-dispatch chunks: "
              f"{dt:6.2f} s ({mbt/dt:5.1f} MB/s)", flush=True)

    from concurrent.futures import ThreadPoolExecutor
    for n_chunks in (2, 4, 8):
        step = -(-track.shape[-1] // n_chunks)
        parts = [track[:, i * step:(i + 1) * step] for i in range(n_chunks)]
        t0 = time.time()
        with ThreadPoolExecutor(min(4, n_chunks)) as ex:
            devs = list(ex.map(jax.device_put, parts))
        s = sum(float(jnp.sum(d[..., ::4096].astype(jnp.float32))) for d in devs)
        dt = time.time() - t0
        print(f"track {mbt:.1f} MB in {n_chunks} threaded chunks:     "
              f"{dt:6.2f} s ({mbt/dt:5.1f} MB/s)", flush=True)


if __name__ == "__main__":
    main()
