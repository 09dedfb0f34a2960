"""Per-stage bf16 sensitivity sweep + matmul-precision quality/perf frontier.

Localizes where reduced precision loses output quality in the HTDemucs
forward: runs the released-width topology on a music-like synthetic segment
and reports, per precision policy, the output SER (dB, vs the all-fp32
forward on the same backend) and optionally per-forward time.

Policies swept:
  - all-fp32 (the reference), all-bf16 (today's ``--preset fast`` compute)
  - leave-one-out: every stage bf16 except ONE kept fp32 (which stage
    RESCUES quality when promoted)
  - only-one: exactly one stage bf16 (which stage ALONE costs quality)
  - matmul algorithm on fp32 activations/weights: "bfloat16" (1 MXU pass),
    "BF16_BF16_F32_X3" (3 passes — the ``compute_dtype="mixed"`` policy),
    "tensorfloat32", "highest" (6 passes)

On CPU every policy's matmul runs in true fp32 (XLA:CPU ignores the
algorithm hints), so CPU runs isolate pure STORAGE rounding (stage casts);
TPU runs measure the real MXU algorithms. Quality engineering recipe used
for BENCHMARKS.md: stage sensitivities on CPU, algorithm quality + all perf
on TPU.

Usage:
    python tools/precision_sweep.py [--small] [--seconds 7.8] [--batch 1]
        [--perf] [--cpu] [--cases stage|matmul|headline]
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import argparse
import dataclasses
import json
import time

import numpy as np


def music_like(L: int, C: int = 2, seed: int = 0) -> np.ndarray:
    """Deterministic broadband quasi-musical test signal (tones + harmonics
    + pink-ish noise), normalized to ~0.2 RMS like typical mixes."""
    rng = np.random.default_rng(seed)
    t = np.arange(L) / 44100.0
    sig = np.zeros((C, L), np.float64)
    for f0, a in [(110.0, 0.5), (220.0, 0.3), (330.5, 0.2), (1247.0, 0.1)]:
        ph = rng.uniform(0, 2 * np.pi, size=(C, 1))
        sig += a * np.sin(2 * np.pi * f0 * t[None, :] + ph)
        sig += 0.3 * a * np.sin(2 * np.pi * 2 * f0 * t[None, :] + ph)
    w = rng.standard_normal((C, L + 1))
    pink = np.cumsum(w, axis=-1)[:, 1:] - w[:, 1:] * 0.5
    pink /= np.abs(pink).max() + 1e-9
    sig += 0.5 * pink
    sig *= 0.2 / (np.sqrt((sig ** 2).mean()) + 1e-9)
    return sig.astype(np.float32)


def ser_db(ref: np.ndarray, out: np.ndarray) -> float:
    err = ref.astype(np.float64) - out.astype(np.float64)
    denom = float((err ** 2).sum())
    if denom == 0:
        return float("inf")
    return float(10 * np.log10((ref.astype(np.float64) ** 2).sum() / denom))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="reduced width (fast CPU iteration)")
    ap.add_argument("--seconds", type=float, default=None)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--perf", action="store_true",
                    help="time each policy's forward (default backend)")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cpu", action="store_true", help="pin compute to CPU")
    ap.add_argument("--cases", default="all",
                    choices=["all", "stage", "matmul", "headline", "frontier",
                             "attribution"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    from demucs_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    from demucs_tpu.models import htdemucs as ht
    from demucs_tpu.models.registry import jitted_forward

    if args.small:
        base = ht.HTDemucsConfig(channels=16, depth=4, nfft=2048, t_layers=3,
                                 t_heads=4, segment=0.5, samplerate=8000)
    else:
        # released htdemucs topology (mmi recipe widths; tests/common.py)
        base = ht.HTDemucsConfig(channels=48, depth=4, nfft=4096, t_layers=5,
                                 t_heads=8, dconv_mode=3, bottom_channels=512,
                                 segment=7.8)
    if args.seconds:
        base = dataclasses.replace(base, segment=args.seconds)
    params = jax.device_put(ht.init_htdemucs(base, seed=0))
    L = base.training_length
    mix = np.stack([music_like(L, seed=i) for i in range(args.batch)])
    mix_dev = jax.device_put(mix)

    stages = ht._STAGES
    # Reference = the most precise policy the backend offers (on TPU the
    # plain-f32 default may itself run reduced-precision MXU passes — that
    # default's own quality shows up as the "fp32-default" row).
    cases = [("fp32-highest", dict(matmul_precision="highest")),
             ("fp32-default", dict())]
    if args.cases in ("all", "headline", "frontier"):
        cases += [
            ("bf16-all", dict(compute_dtype="bfloat16")),
            ("mixed (X3)", dict(compute_dtype="mixed")),
        ]
    if args.cases in ("all", "stage"):
        for s in stages:
            keep = tuple(x for x in stages if x != s)
            cases.append((f"bf16 except {s}", dict(bf16_stages=keep)))
        for s in stages:
            cases.append((f"only {s} bf16", dict(bf16_stages=(s,))))
    if args.cases in ("all", "matmul", "frontier"):
        for alg in ("bfloat16", "tensorfloat32", "BF16_BF16_F32_X3",
                    "BF16_BF16_F32_X6"):
            cases.append((f"matmul {alg}", dict(matmul_precision=alg)))
    if args.cases in ("all", "attribution"):
        # conv vs dot attribution: the enc/dec stages are convolutions, the
        # transformer is dots — raise each op class independently. On TPU
        # "tensorfloat32" = precision HIGH = 3-pass bf16, "highest" = 6-pass.
        conv_stages = tuple(s for s in stages if s != "transformer")
        cv = lambda p: tuple((s, p) for s in conv_stages)
        cases += [
            ("convs highest", dict(precision_stages=cv("highest"))),
            ("dots highest",
             dict(precision_stages=(("transformer", "highest"),))),
            ("convs tf32", dict(precision_stages=cv("tensorfloat32"))),
            ("convs highest + dots tf32",
             dict(precision_stages=cv("highest")
                  + (("transformer", "tensorfloat32"),))),
            ("convs tf32 + transformer bf16 storage",
             dict(precision_stages=cv("tensorfloat32"),
                  bf16_stages=("transformer",))),
        ]

    ref_out = None
    default_out = None
    rows = []
    for name, delta in cases:
        cfg = dataclasses.replace(base, **delta)
        fwd = jitted_forward("htdemucs", cfg)
        out_dev = fwd(params, mix_dev)
        out = np.asarray(out_dev)
        if ref_out is None:
            ref_out = out
        if name == "fp32-default":
            default_out = out
        s = ser_db(ref_out, out)
        row = {"policy": name,
               "ser_db": round(s, 2) if np.isfinite(s) else "exact"}
        if default_out is not None:
            sd = ser_db(default_out, out)
            row["ser_vs_default_db"] = (round(sd, 2) if np.isfinite(sd)
                                        else "exact")
        if args.perf:
            sync = jax.jit(lambda p, m: jnp.sum(
                fwd(p, m)[..., ::4096].astype(jnp.float32)))
            _ = float(sync(params, mix_dev))  # compile+load
            ts = []
            for _i in range(args.repeats):
                t0 = time.time()
                _ = float(sync(params, mix_dev))
                ts.append(time.time() - t0)
            row["forward_ms"] = round(min(ts) * 1000, 1)
            row["audio_s_per_s"] = round(
                args.batch * L / base.samplerate / min(ts), 1)
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("\n| policy | SER dB" + (" | fwd ms | audio-s/s" if args.perf else "")
          + " |")
    print("|---|---|" + ("--|--|" if args.perf else ""))
    for r in rows:
        extra = (f" {r['forward_ms']} | {r['audio_s_per_s']} |"
                 if args.perf else "")
        print(f"| {r['policy']} | {r['ser_db']} |" + extra)


if __name__ == "__main__":
    main()
