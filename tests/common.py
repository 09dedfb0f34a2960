"""Shared helpers for parity tests: build paired (torch reference, ours) models."""

import numpy as np
import torch

from torchref import import_reference, torch_state_to_params

SOURCES = ["drums", "bass", "other", "vocals"]


def small_htdemucs_kwargs():
    # Full htdemucs topology at reduced width/short segment so CPU tests are
    # fast. nfft=2048/depth=4 keeps all four freq layers non-empty (the real
    # htdemucs topology: branches exchange only in the transformer).
    return dict(
        channels=16,
        depth=4,
        nfft=2048,
        t_layers=3,
        t_heads=4,
        segment=0.5,
        samplerate=8000,
    )


_PAIR_CACHE = {}


def make_htdemucs_pair(extra=None, seed=0):
    """Build (torch reference model, our cfg, bridged params). Cached — pairs
    are treated as read-only by all tests, and sharing them shares the jit
    cache across test modules (big CPU-time win for the suite)."""
    key = (tuple(sorted((extra or {}).items())), seed)
    if key in _PAIR_CACHE:
        return _PAIR_CACHE[key]
    from demucs_tpu.models import htdemucs as jht

    ref = import_reference()
    kwargs = small_htdemucs_kwargs()
    if extra:
        kwargs.update(extra)
    torch.manual_seed(seed)
    tmodel = ref.htdemucs.HTDemucs(SOURCES, **kwargs).eval()
    params = torch_state_to_params(tmodel)
    cfg = jht.HTDemucsConfig(sources=tuple(SOURCES), **kwargs)
    _PAIR_CACHE[key] = (tmodel, cfg, params)
    return _PAIR_CACHE[key]


def random_mix(shape, seed=0, scale=0.1):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) * scale).astype(np.float32)


# Released (shipped-width) topologies, per the reference's training recipes:
# htdemucs = the mmi grid recipe (grids/mmi.py:20-50: t_layers 5, dconv_mode 3,
# bottom_channels 512) at the exported 7.8 s segment (tools/export.py:53-56);
# hdemucs/demucs = conf/config.yaml:95-165 defaults (channels 48 / 64, the
# mdx-era widths). Used by the full-width parity tests and tools/compare_ref.
FULL_KWARGS = {
    "htdemucs": dict(channels=48, depth=4, nfft=4096, t_layers=5, t_heads=8,
                     dconv_mode=3, bottom_channels=512, segment=7.8,
                     samplerate=44100),
    "hdemucs": dict(channels=48, depth=6, nfft=4096, samplerate=44100),
    "demucs": dict(channels=64, depth=6, samplerate=44100),
}


def make_full_pair(family: str, seed: int = 0):
    """(torch reference model, our cfg, bridged params) at FULL released
    width. Heavy: only for tests marked ``full``."""
    ref = import_reference()
    kwargs = dict(FULL_KWARGS[family])
    torch.manual_seed(seed)
    if family == "htdemucs":
        from demucs_tpu.models import htdemucs as jm

        tmodel = ref.htdemucs.HTDemucs(SOURCES, **kwargs).eval()
        cfg = jm.HTDemucsConfig(sources=tuple(SOURCES), **kwargs)
    elif family == "hdemucs":
        from demucs_tpu.models import hdemucs as jm

        tmodel = ref.hdemucs.HDemucs(SOURCES, **kwargs).eval()
        cfg = jm.HDemucsConfig(sources=tuple(SOURCES), **kwargs)
    else:
        from demucs_tpu.models import demucs as jm

        tmodel = ref.demucs.Demucs(SOURCES, **kwargs).eval()
        cfg = jm.DemucsConfig(sources=tuple(SOURCES), **kwargs)
    params = torch_state_to_params(tmodel)
    return tmodel, cfg, params
