#!/usr/bin/env python
"""Generate web/dsp_goldens.json — the browser shell's page-load self-test
fixture (web/index.html runs its JS STFT/iSTFT over these at load and
reports PASS/FAIL before accepting any audio).

Convention contract: the shell's JS DSP deliberately omits the reference's
1/sqrt(nfft) STFT normalization (/root/reference/web/src/dsp.ts:124,157;
ops/spec.py applies it) because the factor provably cancels through
``forward_core`` — see tests/test_web_contract.py. The goldens therefore
store the JS-side convention explicitly:

    spec_golden  = sqrt(nfft) * demucs_spec(x)        (what JS spec returns)
    wave_golden  = demucs_ispec(spec_golden / sqrt(nfft), L)
                 = demucs_ispec(demucs_spec(x), L)  ~= x   (round trip)

so JS ``demucsISpec(demucsSpec(x)) == wave_golden`` checks both directions
plus the round-trip at once. A small nfft keeps the JSON compact; the JS
functions are generic over nfft, so the self-test exercises the exact code
paths the real meta.nfft=4096 model uses.
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import json
import math
from pathlib import Path

import numpy as np


def make_goldens(nfft: int = 512, length: int = 1000, seed: int = 0) -> dict:
    from demucs_tpu.ops.spec import demucs_ispec, demucs_spec

    rng = np.random.default_rng(seed)
    t = np.arange(length) / 8000.0
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.25 * np.sin(2 * np.pi * 97 * t + 0.3)
         + 0.05 * rng.standard_normal(length)).astype(np.float32)

    z = np.asarray(demucs_spec(x[None, None], nfft))[0, 0]  # (F, T) complex
    root = math.sqrt(nfft)
    spec_re = (z.real * root).astype(np.float32)
    spec_im = (z.imag * root).astype(np.float32)
    wave = np.asarray(demucs_ispec(z[None, None], length))[0, 0].astype(
        np.float32)

    return {
        "nfft": nfft,
        "length": length,
        "note": "JS-side convention: spec = sqrt(nfft) * ops/spec.py "
                "demucs_spec(x); wave = demucs_ispec round trip. See "
                "tools/make_web_goldens.py.",
        "x": [float(v) for v in x],
        "spec_re": [[float(v) for v in row] for row in spec_re],
        "spec_im": [[float(v) for v in row] for row in spec_im],
        "wave": [float(v) for v in wave],
    }


def main():
    import jax

    # host-side fixture generation — never touch an accelerator
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    out = Path(__file__).resolve().parent.parent / "web" / "dsp_goldens.json"
    goldens = make_goldens()
    out.write_text(json.dumps(goldens))
    print(f"wrote {out} ({out.stat().st_size} bytes, nfft={goldens['nfft']}, "
          f"L={goldens['length']})")


if __name__ == "__main__":
    main()
