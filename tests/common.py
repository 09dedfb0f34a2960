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
