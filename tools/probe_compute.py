"""Decompose htdemucs forward compute on TPU: STFT, encoders, transformer,
decoders+iSTFT — each timed as its own jit (checksum readback)."""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import time

import numpy as np
import jax

from demucs_tpu.models import htdemucs as ht
from demucs_tpu.models import hlayers as hl
from demucs_tpu.models.transformer import crosstransformer_forward
from demucs_tpu.ops.spec import cac_pack, demucs_spec


def timed(fn, *a, n=3):
    _ = float(fn(*a))
    ts = []
    for _i in range(n):
        t0 = time.time()
        _ = float(fn(*a))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    cfg = ht.HTDemucsConfig(segment=7.8)
    params = jax.device_put(ht.init_htdemucs(cfg, seed=0))
    lay = ht.layout(cfg)
    B, L = 8, cfg.training_length
    rng = np.random.default_rng(0)
    mix = jax.device_put((rng.standard_normal((B, 2, L)) * 0.1).astype(np.float32))

    @jax.jit
    def stft_part(mix):
        z = demucs_spec(mix, cfg.nfft)
        return cac_pack(z).sum()

    @jax.jit
    def enc_part(params, mix):
        z = demucs_spec(mix, cfg.nfft)
        x = cac_pack(z)
        xt = mix
        for idx, spec_l in enumerate(lay.enc):
            xt = hl.henc_forward(params["tencoder"][idx], lay.tenc[idx], xt)
            x = hl.henc_forward(params["encoder"][idx], spec_l, x)
        return x.sum() + xt.sum()

    @jax.jit
    def enc_tr_part(params, mix):
        z = demucs_spec(mix, cfg.nfft)
        x = cac_pack(z)
        xt = mix
        for idx, spec_l in enumerate(lay.enc):
            xt = hl.henc_forward(params["tencoder"][idx], lay.tenc[idx], xt)
            x = hl.henc_forward(params["encoder"][idx], spec_l, x)
        x, xt = crosstransformer_forward(
            params["crosstransformer"], ht.transformer_spec(cfg), x, xt)
        return x.sum() + xt.sum()

    @jax.jit
    def full(params, mix):
        return ht.forward(params, mix, cfg).sum()

    t_stft = timed(stft_part, mix)
    print(f"stft+cac:           {t_stft*1000:7.1f} ms")
    t_enc = timed(enc_part, params, mix)
    print(f"+encoders:          {t_enc*1000:7.1f} ms (enc ~{(t_enc-t_stft)*1000:.1f})")
    t_tr = timed(enc_tr_part, params, mix)
    print(f"+transformer:       {t_tr*1000:7.1f} ms (tr ~{(t_tr-t_enc)*1000:.1f})")
    t_full = timed(full, params, mix)
    print(f"full forward:       {t_full*1000:7.1f} ms (dec+istft ~{(t_full-t_tr)*1000:.1f})")
    print(f"throughput: {B*7.8/t_full:.1f} audio_s/s compute-only")


if __name__ == "__main__":
    main()
