"""D2H of COMPUTED arrays (no host-side cache) across sizes + dtypes,
and chunked-fetch strategies."""
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
    base = jax.device_put(rng.standard_normal((84 * 2**20 // 4,)).astype(np.float32), dev)
    bump = jax.jit(lambda x, s: x[: s] + 1.0, static_argnums=1)

    for mb in (1, 4, 16, 42, 84):
        n = mb * 2**20 // 4
        y = bump(base, n)
        y.block_until_ready()
        # fresh computed array each fetch (avoid any caching)
        def fetch():
            z = (y + 0.0).block_until_ready() if False else y
            return np.asarray(jnp.add(y, 0.0))
        t = timed(fetch)
        print(f"D2H computed {mb:3d} MB fp32: {t*1000:7.0f} ms -> {mb/t:8.1f} MB/s")

    y = jnp.add(base, 0.0)
    f16 = jax.jit(lambda x: x.astype(jnp.float16))
    t = timed(lambda: np.asarray(f16(y)))
    print(f"D2H computed  42 MB fp16: {t*1000:7.0f} ms -> {84/t:8.1f} logical-MB/s")
    i16 = jax.jit(lambda x: (jnp.clip(x, -3, 3) * 10000).astype(jnp.int16))
    t = timed(lambda: np.asarray(i16(y)))
    print(f"D2H computed  21 MB int16: {t*1000:7.0f} ms -> {84/t:8.1f} logical-MB/s")

    # chunked fetch: 8 x 10.5MB slices fetched sequentially
    slices = [jnp.add(base[i::8], 0.0) for i in range(8)]
    for s in slices:
        s.block_until_ready()
    t = timed(lambda: [np.asarray(s) for s in slices])
    print(f"D2H 8x10.5MB chunks fp32: {t*1000:7.0f} ms -> {84/t:8.1f} MB/s")

    # H2D computed-size sweep for symmetry
    for mb in (4, 21, 42, 84):
        arr = rng.standard_normal((mb * 2**20 // 4,)).astype(np.float32)
        t = timed(lambda: jax.device_put(arr, dev).block_until_ready())
        print(f"H2D {mb:3d} MB fp32: {t*1000:7.0f} ms -> {mb/t:8.1f} MB/s")


if __name__ == "__main__":
    main()
