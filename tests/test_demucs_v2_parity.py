"""Demucs v2 (time-domain U-Net) parity vs the PyTorch reference.

The 2x resampling path compares against a torch-side reimplementation of
julius's documented windowed-sinc algorithm (tests/torchref.py), so a separate
resample=False case isolates pure-network parity, and spectral tests validate
the resampler itself (test_resample.py)."""

import numpy as np
import pytest
import torch

import jax

from common import SOURCES, random_mix
from torchref import import_reference, torch_state_to_params

from demucs_tpu.models import demucs as jd


def _make_pair(seed=0, **kwargs):
    ref = import_reference()
    torch.manual_seed(seed)
    tmodel = ref.demucs.Demucs(SOURCES, **kwargs).eval()
    params = torch_state_to_params(tmodel)
    cfg = jd.DemucsConfig(sources=tuple(SOURCES), **kwargs)
    return tmodel, cfg, params


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(channels=4, depth=4, resample=False),
        dict(channels=4, depth=4, resample=True),
        dict(channels=4, depth=4, lstm_layers=2, resample=False),
        dict(channels=8, depth=3, dconv_lstm=1, dconv_attn=1, resample=False),
        dict(channels=4, depth=3, glu=False, gelu=False, resample=False),
        dict(channels=4, depth=5, norm_starts=3, resample=False),
    ],
    ids=["base", "resample", "blstm_bottleneck", "dconv_lstm_attn", "relu", "groupnorm"],
)
def test_demucs_v2_forward_parity(kwargs):
    tmodel, cfg, params = _make_pair(**kwargs)
    L = 4096
    mix = random_mix((1, 2, L), seed=4)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(mix)).numpy()
    got = np.asarray(jax.jit(jd.forward, static_argnames=("cfg",))(params, mix, cfg))
    assert got.shape == want.shape == (1, len(SOURCES), 2, L)
    err = np.abs(got - want).max()
    assert err < 3e-3 * max(np.abs(want).max(), 1.0), err


def test_valid_length():
    ref = import_reference()
    torch.manual_seed(0)
    tmodel = ref.demucs.Demucs(SOURCES, channels=4, depth=6)
    cfg = jd.DemucsConfig(sources=tuple(SOURCES), channels=4, depth=6)
    for L in (1, 1000, 44100, 343980):
        assert jd.valid_length(cfg, L) == tmodel.valid_length(L)


def test_demucs_v2_init_shapes():
    tmodel, cfg, _ = _make_pair(channels=4, depth=4, lstm_layers=2)
    from demucs_tpu.zoo.torch_load import flatten_state

    ours = {k: tuple(v.shape) for k, v in flatten_state(jd.init_demucs(cfg)).items()}
    theirs = {k: tuple(v.shape) for k, v in tmodel.state_dict().items()}
    assert ours == theirs, (
        sorted(set(theirs) - set(ours))[:5],
        sorted(set(ours) - set(theirs))[:5],
    )
