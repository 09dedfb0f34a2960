"""Decompose device-engine per-track time: upload, pass compute, final fetch."""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import time

import numpy as np
import jax
import jax.numpy as jnp

from demucs_tpu.models import htdemucs as ht
from demucs_tpu.models.registry import Model
from demucs_tpu.inference import engine as eng


def main():
    cfg = ht.HTDemucsConfig(segment=7.8)
    params = jax.device_put(ht.init_htdemucs(cfg, seed=0))
    model = Model("htdemucs", cfg, params)
    sr = cfg.samplerate
    L = int(60 * sr)
    rng = np.random.default_rng(0)
    mix = (rng.standard_normal((1, 2, L)) * 0.1).astype(np.float32)

    seg_len = int(sr * 7.8)
    stride = int(0.75 * seg_len)
    target = seg_len
    max_shift = int(0.5 * sr)

    pass_fn = eng._build_pass_fn("htdemucs", cfg, L, max_shift, seg_len, target,
                                 stride, 16, 1.0, 4, 2, None)
    margin = target
    buf = np.zeros((2, margin + max_shift + L + max_shift + margin), np.float32)
    buf[:, margin + max_shift: margin + max_shift + L] = mix[0]

    t0 = time.time()
    buf_dev = jax.device_put(buf)
    csum = float(jnp.sum(buf_dev))  # force upload completion via tiny readback
    t_up = time.time() - t0
    print(f"upload track buf ({buf.nbytes/2**20:.0f} MB): {t_up:.2f} s")

    accum = jnp.zeros((4, 2, L), jnp.float32)
    scale = jnp.ones((4,), jnp.float32)
    t0 = time.time()
    accum = pass_fn(params, buf_dev, jnp.int32(1000), accum, scale)
    _ = float(jnp.sum(accum[..., :8]))
    print(f"pass 1 (compile+run): {time.time()-t0:.1f} s")

    for i in range(2):
        accum2 = jnp.zeros((4, 2, L), jnp.float32)
        t0 = time.time()
        accum2 = pass_fn(params, buf_dev, jnp.int32(500 + i), accum2, scale)
        _ = float(jnp.sum(accum2[..., :8]))
        print(f"pass steady: {time.time()-t0:.2f} s")

    for wire, item in (("float16", 16), ("int16", 16), (None, 32)):
        fin = eng._final_fn(wire, L, 4 * 2 * (item // 8))
        t0 = time.time()
        out = eng._gather_stems(fin(accum2, jnp.ones(4, jnp.float32)), wire, L)
        print(f"final fetch {wire or 'float32'} "
              f"({4*2*L*(item//8)/2**20:.0f} MB wire): {time.time()-t0:.2f} s")

    # ---- decomposition of the pass itself (VERDICT r02 item 1) ----
    # (a) relay round-trip of a trivial program (dispatch + scalar fetch)
    tiny = jax.device_put(np.zeros(8, np.float32))
    rtt_fn = jax.jit(lambda x: jnp.sum(x) + 1.0)
    float(rtt_fn(tiny))  # compile+load
    rtts = []
    for _ in range(20):
        t0 = time.time()
        float(rtt_fn(tiny))
        rtts.append(time.time() - t0)
    rtts.sort()
    print(f"relay RTT (trivial program dispatch+scalar fetch): "
          f"median {rtts[10]*1e3:.0f} ms, min {rtts[0]*1e3:.0f} ms")

    # (b) host-side cost of an ASYNC pass dispatch (no sync)
    t0 = time.time()
    accum3 = pass_fn(params, buf_dev, jnp.int32(123),
                     jnp.zeros((4, 2, L), jnp.float32), scale)
    t_async = time.time() - t0
    _ = float(jnp.sum(accum3[..., :8]))
    print(f"pass dispatch (async, host-side return): {t_async*1e3:.0f} ms")

    # (c) the segment forwards ALONE at the engine's exact batch geometry
    # (same lax.map over right-sized batches, minus extract/OLA/accumulate) —
    # pass_steady - forward_only - RTT = extract+OLA+scatter cost.
    from demucs_tpu.train.solver import model_forward_fn

    fwd = model_forward_fn("htdemucs")
    n_segments = int(np.ceil((L + max_shift) / stride))
    segs = (np.random.default_rng(1).standard_normal(
        (1, n_segments, 2, target)) * 0.1).astype(np.float32)

    @jax.jit
    def forward_only(params, segs):
        outs = jax.lax.map(lambda s: fwd(params, s, cfg), segs)
        return jnp.sum(outs[..., ::4096].astype(jnp.float32))

    segs_dev = jax.device_put(segs)
    t0 = time.time()
    float(forward_only(params, segs_dev))
    print(f"forward-only (compile+load): {time.time()-t0:.1f} s")
    fts = []
    for _ in range(5):
        t0 = time.time()
        float(forward_only(params, segs_dev))
        fts.append(time.time() - t0)
    fts.sort()
    print(f"forward-only steady ({n_segments} segments x {target/44100:.1f}s): "
          f"median {fts[2]:.3f} s  "
          f"(= {n_segments*target/44100/fts[2]:.0f} forward audio-s/s)")
    print(f"track audio-s per pass-equivalent: {L/44100:.0f}; engine ceiling "
          f"from forwards alone: {L/44100/fts[2]:.0f} audio-s/s")


if __name__ == "__main__":
    main()
