"""Characterize device->host transfer on the axon tunnel: size sweep, dtype,
chunked fetch."""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import time

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts)


def main():
    dev = jax.devices()[0]
    print("device:", dev.device_kind)
    rng = np.random.default_rng(0)

    for mb in (1, 8, 32, 84):
        arr = rng.standard_normal((mb * 2**20 // 4,)).astype(np.float32)
        d = jax.device_put(arr, dev)
        d.block_until_ready()
        t = timed(lambda: np.asarray(d))
        print(f"D2H {mb:3d} MB fp32: {t*1000:7.0f} ms -> {mb/t:8.1f} MB/s")

    # fp16 fetch of the same logical data
    arr = rng.standard_normal((84 * 2**20 // 4,)).astype(np.float32)
    d = jax.device_put(arr, dev)
    cast = jax.jit(lambda x: x.astype(jnp.float16))
    dh = cast(d)
    dh.block_until_ready()
    t = timed(lambda: np.asarray(dh))
    print(f"D2H  42 MB fp16 (84MB logical): {t*1000:7.0f} ms -> {84/t:8.1f} MB-logical/s")

    # int16 fetch
    to_i16 = jax.jit(lambda x: (jnp.clip(x / jnp.max(jnp.abs(x)), -1, 1) * 32767).astype(jnp.int16))
    di = to_i16(d)
    di.block_until_ready()
    t = timed(lambda: np.asarray(di))
    print(f"D2H  21 MB int16 (84MB logical): {t*1000:7.0f} ms -> {84/t:8.1f} MB-logical/s")

    # H2D for symmetry
    t = timed(lambda: jax.device_put(arr, dev).block_until_ready())
    print(f"H2D  84 MB fp32: {t*1000:7.0f} ms -> {84/t:8.1f} MB/s")


if __name__ == "__main__":
    main()
