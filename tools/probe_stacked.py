#!/usr/bin/env python
"""Attribute the stacked-bag forward cost: plain conv forwards vs the
member-vmapped (stacked-params) forward on the real chip.

The stacked bag pass (engine._build_stacked_bag_fn) merges the member axis
into the forward batch via ``vmap`` over stacked params — which lowers
convolutions as batched-weight (grouped) convs. This probe measures, at
released htdemucs width, the same total work (M members x B/M segments
each) three ways:

  a) M plain-forward dispatches at batch B/M   (sequential engine's ops)
  b) one vmapped forward over (M, B/M)         (the stacked pass's op)
  c) one lax.scan over members at batch B/M    (one program, plain convs)

Timings fetch a computed scalar (the CLAUDE.md relay rule).
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16,
                        help="TOTAL segments across members")
    parser.add_argument("--members", type=int, default=4)
    parser.add_argument("--repeats", type=int, default=3)
    args = parser.parse_args()

    from demucs_tpu.models import htdemucs as ht
    from demucs_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    cfg = ht.HTDemucsConfig(segment=7.8)
    M, B = args.members, args.batch
    per = B // M
    params = [jax.device_put(ht.init_htdemucs(cfg, seed=s)) for s in range(M)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params)
    L = cfg.training_length
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.standard_normal((B, 2, L)) * 0.1).astype(np.float32))
    xm = x.reshape(M, per, 2, L)

    fwd = lambda p, b: ht.forward(p, b, cfg)  # noqa: E731
    plain = jax.jit(lambda p, b: jnp.sum(fwd(p, b)[..., ::4096]))
    vmapped = jax.jit(
        lambda sp, bm: jnp.sum(jax.vmap(fwd)(sp, bm)[..., ::4096]))

    def scan_fn(sp, bm):
        def body(carry, xs):
            p_m, x_m = xs
            return carry + jnp.sum(fwd(p_m, x_m)[..., ::4096]), 0.0

        out, _ = jax.lax.scan(body, 0.0, (sp, bm))
        return out

    scanned = jax.jit(scan_fn)

    def timed(name, fn):
        fn()  # warm (compile + first relay load)
        ts = []
        for _ in range(args.repeats):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        best = min(ts)
        audio = B * L / cfg.samplerate
        print(f"{name}: {best*1e3:.1f} ms -> {audio/best:.1f} segment-audio-"
              f"s/s   ({[round(t*1e3, 1) for t in ts]})", flush=True)
        return best

    def rate(name, secs, n_segs):
        audio = n_segs * L / cfg.samplerate
        print(f"    => {name}: {audio/secs:.1f} segment-audio-s/s "
              f"({n_segs} segs)", flush=True)

    t = timed(f"(a) {M} plain dispatches, batch {per}",
              lambda: [float(plain(p, xm[m])) for m, p in enumerate(params)])
    rate("a", t, B)
    t = timed(f"(b) one vmapped forward ({M}, {per})",
              lambda: float(vmapped(stacked, xm)))
    rate("b", t, B)
    t = timed(f"(c) one scan over {M} members, batch {per}",
              lambda: float(scanned(stacked, xm)))
    rate("c", t, B)
    # the sequential engine's actual grouping: big per-member batches
    t = timed(f"(a') {M} plain dispatches, batch {B}",
              lambda: [float(plain(p, x)) for p in params])
    rate("a'", t, M * B)
    # one-program member scan at FULL per-member batch (memory = 1 member)
    xfull = jnp.stack([x] * M)
    t = timed(f"(e) one scan over {M} members, batch {B}",
              lambda: float(scanned(stacked, xfull)))
    rate("e", t, M * B)
    # vmapped at (M, B/2): half-budget merged batch
    if B >= 2 * M:
        xh = x.reshape(M, per, 2, L)  # placeholder shape guard
        x8 = jnp.stack([x[: B // 2] for _ in range(M)])
        t = timed(f"(d) one vmapped forward ({M}, {B//2})",
                  lambda: float(vmapped(stacked, x8)))
        rate("d", t, M * (B // 2))


if __name__ == "__main__":
    main()
