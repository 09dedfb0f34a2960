"""Quick TPU forward-throughput probe for htdemucs (dev tool)."""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import time, numpy as np, jax, jax.numpy as jnp
from demucs_tpu.models import htdemucs as ht

cfg = ht.HTDemucsConfig(segment=7.8)
params = jax.device_put(ht.init_htdemucs(cfg, seed=0))
L = cfg.training_length
rng = np.random.default_rng(0)
fwd = jax.jit(lambda p, m: ht.forward(p, m, cfg))
s = jax.jit(lambda p, m: ht.forward(p, m, cfg).sum())
for B in (8,):
    xs = [jnp.asarray(rng.standard_normal((B, 2, L)).astype(np.float32) * 0.1) for _ in range(4)]
    _ = np.asarray(fwd(params, xs[0]))
    t0 = time.time()
    outs = [fwd(params, x) for x in xs[1:]]
    res = [np.asarray(o) for o in outs]
    dt = (time.time() - t0) / 3
    print(f"B={B} fp32 {dt*1000:.0f} ms/batch -> {B*7.8/dt:.1f} audio_s/s (incl D2H)")
    _ = float(s(params, xs[0]))
    t0 = time.time()
    vals = [float(s(params, x)) for x in xs[1:]]
    dt = (time.time() - t0) / 3
    print(f"B={B} fp32 compute-only {dt*1000:.0f} ms/batch -> {B*7.8/dt:.1f} audio_s/s")
