"""Golden-output regression tests.

Locks the tiny-model forward numerics to committed golden tensors so future
refactors are checked even without torch/the reference mounted. Goldens were
produced by this same code at a commit where every component was
parity-verified against the PyTorch reference (see tests/golden/README).

Regenerate (only after re-verifying parity!):
    python tests/test_golden.py regen
"""

from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

GOLDEN_DIR = Path(__file__).parent / "golden"

SOURCES = ("drums", "bass", "other", "vocals")


def _mix(L, seed=123):
    rng = np.random.default_rng(seed)
    t = np.arange(L) / 8000.0
    sines = sum(
        a * np.sin(2 * np.pi * f * t + p)
        for a, f, p in [(0.4, 220, 0.1), (0.2, 440, 1.0), (0.1, 1337, 2.0)]
    )
    noise = rng.standard_normal(L) * 0.05
    return np.stack([sines + noise, 0.8 * sines - noise]).astype(np.float32)[None]


def _models():
    from demucs_tpu.models import demucs as m_d
    from demucs_tpu.models import hdemucs as m_h
    from demucs_tpu.models import htdemucs as m_ht

    ht_cfg = m_ht.HTDemucsConfig(
        sources=SOURCES, channels=16, depth=4, nfft=2048, t_layers=3, t_heads=4,
        segment=0.5, samplerate=8000)
    h_cfg = m_h.HDemucsConfig(sources=SOURCES, channels=4, samplerate=8000)
    d_cfg = m_d.DemucsConfig(sources=SOURCES, channels=4, depth=4, samplerate=8000)
    return {
        "htdemucs": ("htdemucs", ht_cfg, m_ht.init_htdemucs(ht_cfg, seed=7),
                     m_ht.forward, ht_cfg.training_length),
        "hdemucs": ("hdemucs", h_cfg, m_h.init_hdemucs(h_cfg, seed=7),
                    m_h.forward, 8192),
        "demucs": ("demucs", d_cfg, m_d.init_demucs(d_cfg, seed=7),
                   m_d.forward, 4096),
    }


def _compute(name):
    kind, cfg, params, forward, L = _models()[name]
    mix = _mix(L)
    out = jax.jit(forward, static_argnames=("cfg",))(params, jnp.asarray(mix), cfg)
    return np.asarray(out)


def test_golden_outputs():
    import pytest

    for name in ("htdemucs", "hdemucs", "demucs"):
        path = GOLDEN_DIR / f"{name}.npz"
        if not path.exists():
            pytest.skip("goldens not generated yet")
        want = np.load(path)["out"]
        got = _compute(name)
        assert got.shape == want.shape, name
        err = np.abs(got - want).max()
        assert err < 2e-4 * max(np.abs(want).max(), 1e-3), (name, err)


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        # Goldens are CPU references (the suite computes on CPU): without
        # this pin, a machine with an accelerator plugin would silently
        # regen them on-device (fp32-on-MXU differs at the 1e-4 level).
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
        GOLDEN_DIR.mkdir(exist_ok=True)
        for name in ("htdemucs", "hdemucs", "demucs"):
            out = _compute(name)
            np.savez_compressed(GOLDEN_DIR / f"{name}.npz", out=out)
            print(f"wrote {name}: {out.shape}")
