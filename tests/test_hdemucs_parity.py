"""HDemucs (v3) parity vs the PyTorch reference, including the
``demucs_unittest`` topology (HDemucs channels=4, pretrained.py:27-29), the
merge/inject + empty-layer paths, DConv BLSTM/LocalState branches,
``hybrid_old`` (MDX padding-bug replication) and the freq-only model."""

import numpy as np
import pytest
import torch

import jax

from common import SOURCES, random_mix
from torchref import import_reference, torch_state_to_params

from demucs_tpu.models import hdemucs as jh


def _make_pair(seed=0, **kwargs):
    ref = import_reference()
    torch.manual_seed(seed)
    tmodel = ref.hdemucs.HDemucs(SOURCES, **kwargs).eval()
    params = torch_state_to_params(tmodel)
    cfg = jh.HDemucsConfig(sources=tuple(SOURCES), **kwargs)
    return tmodel, cfg, params


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(channels=4),  # demucs_unittest model (pretrained.py:27-29)
        dict(channels=4, hybrid_old=True),
        dict(channels=4, hybrid=False),
        dict(channels=4, dconv_lstm=2, dconv_attn=2),
    ],
    ids=["unittest4", "hybrid_old", "freq_only", "early_lstm_attn"],
)
def test_hdemucs_forward_parity(kwargs):
    tmodel, cfg, params = _make_pair(**kwargs)
    L = 8192 if cfg.depth == 6 else 4096
    mix = random_mix((1, 2, L), seed=3)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(mix)).numpy()
    got = np.asarray(
        jax.jit(jh.forward, static_argnames=("cfg",))(params, mix, cfg)
    )
    assert got.shape == want.shape == (1, len(SOURCES), 2, L)
    err = np.abs(got - want).max()
    assert err < 3e-3 * max(np.abs(want).max(), 1.0), err


def test_hdemucs_init_shapes():
    tmodel, cfg, _ = _make_pair(channels=4)
    from demucs_tpu.zoo.torch_load import flatten_state

    ours = {k: tuple(v.shape) for k, v in flatten_state(jh.init_hdemucs(cfg)).items()}
    theirs = {k: tuple(v.shape) for k, v in tmodel.state_dict().items()}
    assert ours == theirs, (
        sorted(set(theirs) - set(ours))[:5],
        sorted(set(ours) - set(theirs))[:5],
        [k for k in theirs if k in ours and theirs[k] != ours[k]][:5],
    )


def test_multiwrap_parity():
    """MultiWrap frequency-band replication (hdemucs.py:160-253)."""
    kwargs = dict(channels=4, multi_freqs=[0.25, 0.5], multi_freqs_depth=2)
    ref = import_reference()
    torch.manual_seed(0)
    tmodel = ref.hdemucs.HDemucs(SOURCES, channels=4, multi_freqs=[0.25, 0.5],
                                 multi_freqs_depth=2).eval()
    params = torch_state_to_params(tmodel)
    cfg = jh.HDemucsConfig(sources=tuple(SOURCES), channels=4,
                           multi_freqs=(0.25, 0.5), multi_freqs_depth=2)
    L = 8192
    mix = random_mix((1, 2, L), seed=6)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(mix)).numpy()
    got = np.asarray(jax.jit(jh.forward, static_argnames=("cfg",))(params, mix, cfg))
    err = np.abs(got - want).max()
    assert err < 3e-3 * max(np.abs(want).max(), 1.0), err

    from demucs_tpu.zoo.torch_load import flatten_state

    ours = {k: tuple(v.shape) for k, v in flatten_state(jh.init_hdemucs(cfg)).items()}
    theirs = {k: tuple(v.shape) for k, v in tmodel.state_dict().items()}
    assert ours == theirs
