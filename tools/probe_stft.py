"""Compare fft vs matmul-DFT STFT/iSTFT timing on TPU."""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import time
import numpy as np
import jax
from demucs_tpu.ops.spec import demucs_spec, demucs_ispec, cac_pack

B, L, nfft = 8, 343980, 4096
x = jax.device_put(np.random.default_rng(0).standard_normal((B, 2, L)).astype(np.float32))

for method in ("fft", "matmul"):
    f = jax.jit(lambda x: cac_pack(demucs_spec(x, nfft, method=method)).sum())
    _ = float(f(x))
    ts = []
    for _i in range(3):
        t0 = time.time(); _ = float(f(x)); ts.append(time.time() - t0)
    print(f"stft {method}: {min(ts)*1000:.1f} ms")

zd = jax.jit(lambda x: demucs_spec(x, nfft))(x)
for method in ("fft", "matmul"):
    g = jax.jit(lambda z: demucs_ispec(z, L, method=method).sum())
    _ = float(g(zd))
    ts = []
    for _i in range(3):
        t0 = time.time(); _ = float(g(zd)); ts.append(time.time() - t0)
    print(f"istft {method}: {min(ts)*1000:.1f} ms")
