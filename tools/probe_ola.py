"""Isolate the overlap-add stages of the engine pass program.

probe_engine.py showed pass_steady (0.88 s) >> forwards alone (0.27 s) with
relay RTT at only ~24 ms: the gap lives INSIDE the pass executable. This
probe times three nested variants sharing the exact engine geometry to
attribute it: extract+forwards | +weight+roll gather | full pass
(+grouped strip adds + normalize + accumulate).
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import time

import numpy as np
import jax
import jax.numpy as jnp

from demucs_tpu.models import htdemucs as ht
from demucs_tpu.inference import engine as eng
from demucs_tpu.inference.apply import _triangle_weight
from demucs_tpu.train.solver import model_forward_fn


def main():
    cfg = ht.HTDemucsConfig(segment=7.8)
    params = jax.device_put(ht.init_htdemucs(cfg, seed=0))
    sr = cfg.samplerate
    L = int(60 * sr)
    seg_len = int(sr * 7.8)
    stride = int(0.75 * seg_len)
    target = seg_len
    max_shift = int(0.5 * sr)
    margin = target
    n_pad = int(np.ceil((L + max_shift) / stride))

    buf = np.zeros((2, margin + max_shift + L + max_shift + margin), np.float32)
    rng = np.random.default_rng(0)
    buf[:, margin + max_shift: margin + max_shift + L] = (
        rng.standard_normal((2, L)) * 0.1)
    buf_dev = jax.device_put(buf)

    fwd = model_forward_fn("htdemucs")
    weight_np = _triangle_weight(seg_len, 1.0)

    def common(track_buf, shift_offset):
        view_length = L + max_shift - shift_offset
        o = jnp.arange(n_pad, dtype=jnp.int32) * stride
        valid = o < view_length
        chunk_len = jnp.clip(view_length - o, 0, seg_len)
        trim = (target - chunk_len) // 2
        start_buf = margin + shift_offset + o - trim
        segments = jax.vmap(
            lambda s: jax.lax.dynamic_slice(track_buf, (0, s), (2, target))
        )(start_buf)
        outs = jax.lax.map(
            lambda seg: fwd(params, seg, cfg),
            segments.reshape(1, n_pad, 2, target),
        ).reshape(n_pad, 4, 2, target)
        return outs, valid, chunk_len, trim

    @jax.jit
    def variant_a(track_buf, shift_offset):  # extract + forwards
        outs, *_ = common(track_buf, shift_offset)
        return jnp.sum(outs[..., ::4096])

    @jax.jit
    def variant_b(track_buf, shift_offset):  # + weighting + roll gather
        outs, valid, chunk_len, trim = common(track_buf, shift_offset)
        j = jnp.arange(target, dtype=jnp.int32)[None, :]
        rel = j - trim[:, None]
        in_range = (rel >= 0) & (rel < chunk_len[:, None]) & valid[:, None]
        wvec = jnp.where(
            in_range,
            jnp.take(jnp.asarray(weight_np), jnp.clip(rel, 0, seg_len - 1)),
            0.0)
        contrib = outs * wvec[:, None, None, :]
        roll_idx = (jnp.arange(target, dtype=jnp.int32)[None, :]
                    + trim[:, None]) % target
        contrib = jnp.take_along_axis(
            contrib,
            jnp.broadcast_to(roll_idx[:, None, None, :], contrib.shape),
            axis=-1)
        return jnp.sum(contrib[..., ::4096])

    pass_fn = eng._build_pass_fn("htdemucs", cfg, L, max_shift, seg_len, target,
                                 stride, 16, 1.0, 4, 2, None)
    scale = jnp.ones((4,), jnp.float32)

    def run_full():
        accum = pass_fn(params, buf_dev, jnp.int32(777),
                        jnp.zeros((4, 2, L), jnp.float32), scale)
        return float(jnp.sum(accum[..., :8]))

    for name, fn in (("A extract+forwards", lambda: float(variant_a(buf_dev, jnp.int32(777)))),
                     ("B +weight+rollgather", lambda: float(variant_b(buf_dev, jnp.int32(777)))),
                     ("C full pass", run_full)):
        t0 = time.time()
        fn()
        load = time.time() - t0
        ts = []
        for _ in range(5):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        ts.sort()
        print(f"{name}: load {load:.1f} s, steady median {ts[2]:.3f} s "
              f"(min {ts[0]:.3f})", flush=True)


if __name__ == "__main__":
    main()
