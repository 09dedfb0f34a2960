"""Dense (einsum+softmax) vs Pallas flash attention on TPU at the REAL
htdemucs token counts (segment 7.8 s -> ~2.7k spec / ~1.3k time tokens,
C=512), isolated per attention call and through the full cross-transformer.

Timing fetches a computed checksum (relay-safe, see tools/probe_compute.py).
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import dataclasses
import time

import numpy as np
import jax

from demucs_tpu.models import htdemucs as ht
from demucs_tpu.models.transformer import crosstransformer_forward
from demucs_tpu.ops.attention import multihead_attention
from demucs_tpu.ops.pallas.attention import flash_mha


def timed(fn, *a, n=5):
    _ = float(fn(*a))
    ts = []
    for _i in range(n):
        t0 = time.time()
        _ = float(fn(*a))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    # The released topology (mmi recipe: bottom_channels 512, 5 layers).
    cfg = ht.HTDemucsConfig(segment=7.8, bottom_channels=512, dconv_mode=3)
    spec = ht.transformer_spec(cfg)
    B = 16
    H = spec.num_heads
    C = spec.dim
    lay = ht.layout(cfg)
    L = cfg.training_length
    params = jax.device_put(ht.init_htdemucs(cfg, seed=0))
    from demucs_tpu.models import hlayers as hl
    from demucs_tpu.ops.spec import cac_pack, demucs_spec

    rng = np.random.default_rng(0)
    mix = jax.device_put((rng.standard_normal((B, 2, L)) * 0.1).astype(np.float32))

    @jax.jit
    def enc_shapes(params, mix):
        z = demucs_spec(mix, cfg.nfft)
        x = cac_pack(z)
        xt = mix
        for idx, spec_l in enumerate(lay.enc):
            xt = hl.henc_forward(params["tencoder"][idx], lay.tenc[idx], xt)
            x = hl.henc_forward(params["encoder"][idx], spec_l, x)
        return x, xt

    xs, xts = jax.eval_shape(enc_shapes, params, mix)
    _Bx, _Cx, Fqx, Tx = xs.shape
    T_spec, T_time = Fqx * Tx, xts.shape[-1]
    print(f"tokens: spec {T_spec} ({Fqx}x{Tx}), time {T_time}; "
          f"dim {C}, heads {H}, batch {B}")

    for name, Tq, Tk in [("self-spec", T_spec, T_spec),
                         ("self-time", T_time, T_time),
                         ("cross-st", T_spec, T_time),
                         ("cross-ts", T_time, T_spec)]:
        q = jax.device_put(rng.standard_normal((B, Tq, C)).astype(np.float32))
        k = jax.device_put(rng.standard_normal((B, Tk, C)).astype(np.float32))
        v = jax.device_put(rng.standard_normal((B, Tk, C)).astype(np.float32))

        @jax.jit
        def dense(q, k, v):
            return multihead_attention(q, k, v, H).sum()

        @jax.jit
        def flash(q, k, v):
            return flash_mha(q, k, v, H).sum()

        td = timed(dense, q, k, v)
        tf = timed(flash, q, k, v)
        print(f"{name:10s} Tq={Tq:5d} Tk={Tk:5d}: dense {td*1000:7.2f} ms  "
              f"flash {tf*1000:7.2f} ms  ({td/tf:.2f}x)")

    # Full cross-transformer (the real call pattern: 5 layers x (self+cross)
    # per branch) with flash on/off, at the post-upsampler dim.
    x = jax.device_put((rng.standard_normal((B, C, Fqx, Tx)) * 0.1).astype(np.float32))
    xt_a = jax.device_put((rng.standard_normal((B, C, T_time)) * 0.1).astype(np.float32))

    for flash_on in (False, True):
        s = dataclasses.replace(spec, flash_attn=flash_on)

        @jax.jit
        def tr(params, x, xt):
            a, b = crosstransformer_forward(params["crosstransformer"], s, x, xt)
            return a.sum() + b.sum()

        t = timed(tr, params, x, xt_a)
        print(f"crosstransformer flash={flash_on}: {t*1000:7.1f} ms")


if __name__ == "__main__":
    main()
