"""End-to-end numerical parity of our HTDemucs vs the PyTorch reference.

Random-weight models (fixed seed) on both sides; weights transferred through
the zoo bridge; forward outputs compared on the same input. This is the
strictest possible capability check without network access to the released
checkpoints (the same bridge loads them byte-for-byte identically).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from demucs_tpu.models import htdemucs as jht

from torchref import import_reference, torch_state_to_params

SOURCES = ["drums", "bass", "other", "vocals"]


def _small_cfg_kwargs():
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


def _make_pair(extra=None):
    ref = import_reference()
    kwargs = _small_cfg_kwargs()
    if extra:
        kwargs.update(extra)
    torch.manual_seed(0)
    tmodel = ref.htdemucs.HTDemucs(SOURCES, **kwargs).eval()
    params = torch_state_to_params(tmodel)
    cfg = jht.HTDemucsConfig(sources=tuple(SOURCES), **kwargs)
    return tmodel, cfg, params


@pytest.mark.parametrize(
    "extra",
    [None, {"bottom_channels": 64}, {"nfft": 1024}],
    ids=["base", "bottom_channels", "merge_inject"],
)
def test_htdemucs_forward_parity(extra):
    tmodel, cfg, params = _make_pair(extra)
    L = cfg.training_length
    rng = np.random.default_rng(0)
    mix = rng.standard_normal((2, 2, L)).astype(np.float32) * 0.1

    with torch.no_grad():
        want = tmodel(torch.from_numpy(mix)).numpy()

    got = np.asarray(jax.jit(jht.forward, static_argnames=("cfg",))(params, jnp.asarray(mix), cfg))
    assert got.shape == want.shape == (2, len(SOURCES), 2, L)
    err = np.abs(got - want).max()
    scale = np.abs(want).max()
    assert err < 2e-3 * max(scale, 1.0), (err, scale)


def test_htdemucs_forward_core_parity():
    tmodel, cfg, params = _make_pair()
    L = cfg.training_length
    rng = np.random.default_rng(1)
    mix = rng.standard_normal((1, 2, L)).astype(np.float32) * 0.1

    with torch.no_grad():
        tmix = torch.from_numpy(mix)
        z = tmodel._spec(tmix)
        mag = tmodel._magnitude(z)
        spec_want, time_want = tmodel.forward_core(mag, tmix)

    from demucs_tpu.ops.spec import cac_pack, demucs_spec

    zj = demucs_spec(jnp.asarray(mix), cfg.nfft)
    magj = cac_pack(zj)
    np.testing.assert_allclose(np.asarray(magj), mag.numpy(), atol=2e-5, rtol=1e-4)

    spec_got, time_got = jax.jit(jht.forward_core, static_argnames=("cfg",))(
        params, magj, jnp.asarray(mix), cfg
    )
    for got, want in ((spec_got, spec_want.numpy()), (time_got, time_want.numpy())):
        err = np.abs(np.asarray(got) - want).max()
        assert err < 2e-3 * max(np.abs(want).max(), 1.0), err


def test_htdemucs_short_input_pads_to_segment():
    """Eval mode pads input up to the training segment (htdemucs.py:530-537)."""
    tmodel, cfg, params = _make_pair()
    L = cfg.training_length // 2
    rng = np.random.default_rng(2)
    mix = rng.standard_normal((1, 2, L)).astype(np.float32) * 0.1
    with torch.no_grad():
        want = tmodel(torch.from_numpy(mix)).numpy()
    got = np.asarray(jht.forward(params, jnp.asarray(mix), cfg))
    assert got.shape == want.shape
    err = np.abs(got - want).max()
    assert err < 2e-3 * max(np.abs(want).max(), 1.0), err


def test_init_shapes_match_reference():
    """Our random init produces exactly the reference parameter set."""
    tmodel, cfg, _ = _make_pair()
    from demucs_tpu.zoo.torch_load import flatten_state

    ours = flatten_state(jht.init_htdemucs(cfg, seed=0))
    theirs = {k: tuple(v.shape) for k, v in tmodel.state_dict().items()}
    ours_shapes = {k: tuple(v.shape) for k, v in ours.items()}
    missing = set(theirs) - set(ours_shapes)
    extra = set(ours_shapes) - set(theirs)
    assert not missing, sorted(missing)[:10]
    assert not extra, sorted(extra)[:10]
    mismatched = {k: (ours_shapes[k], theirs[k]) for k in theirs if ours_shapes[k] != theirs[k]}
    assert not mismatched, mismatched


def test_six_source_parity():
    """6-source variant (htdemucs_6s adds guitar+piano, README.md:36-37)."""
    sources6 = SOURCES + ["guitar", "piano"]
    ref = import_reference()
    import torch as th

    th.manual_seed(0)
    kwargs = dict(channels=16, depth=4, nfft=2048, t_layers=2, t_heads=4,
                  segment=0.5, samplerate=8000)
    tmodel = ref.htdemucs.HTDemucs(sources6, **kwargs).eval()
    params = torch_state_to_params(tmodel)
    cfg = jht.HTDemucsConfig(sources=tuple(sources6), **kwargs)
    L = cfg.training_length
    mix = (np.random.default_rng(80).standard_normal((1, 2, L)) * 0.1).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(mix)).numpy()
    got = np.asarray(jax.jit(jht.forward, static_argnames=("cfg",))(params, mix, cfg))
    assert got.shape == (1, 6, 2, L)
    err = np.abs(got - want).max()
    assert err < 2e-3 * max(np.abs(want).max(), 1.0), err
