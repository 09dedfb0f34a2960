"""Wiener EM filter invariants + cac=False model paths.

openunmix (the reference's wiener dependency) is not installed, so correctness
rests on first-principles properties of the multichannel Wiener filter:
initialization uses the mixture phase; EM source estimates sum to the mixture
(the gains sum to identity); a single source whose magnitude matches the
mixture reconstructs it.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from common import SOURCES, random_mix
from torchref import import_reference, torch_state_to_params

from demucs_tpu.ops.wiener import wiener


def _complex_mix(T=40, F=32, C=2, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((T, F, C)) + 1j * rng.standard_normal((T, F, C))).astype(
        np.complex64
    )


def test_zero_iterations_is_mixture_phase():
    mix = _complex_mix()
    mags = np.abs(mix)[..., None] * np.array([0.7, 0.3])  # two sources
    y = np.asarray(wiener(jnp.asarray(mags), jnp.asarray(mix), iterations=0))
    # each source = magnitude * mixture phase
    phase = mix / np.abs(mix)
    np.testing.assert_allclose(y[..., 0], 0.7 * np.abs(mix) * phase, atol=1e-4)
    np.testing.assert_allclose(y[..., 1], 0.3 * np.abs(mix) * phase, atol=1e-4)


def test_em_estimates_sum_to_mixture():
    mix = _complex_mix(seed=1)
    rng = np.random.default_rng(2)
    mags = np.abs(rng.standard_normal((*mix.shape, 3))).astype(np.float32)
    y = np.asarray(wiener(jnp.asarray(mags), jnp.asarray(mix), iterations=2))
    total = y.sum(axis=-1)
    err = np.abs(total - mix).max() / np.abs(mix).max()
    assert err < 0.05, err  # gains sum to ~identity (eps regularization)


def test_single_source_reconstructs_mixture():
    mix = _complex_mix(seed=3)
    mags = np.abs(mix)[..., None]
    y = np.asarray(wiener(jnp.asarray(mags), jnp.asarray(mix), iterations=1))
    err = np.abs(y[..., 0] - mix).max() / np.abs(mix).max()
    assert err < 0.02, err


@pytest.mark.parametrize("wiener_iters", [-1, 0, 1])
def test_hdemucs_cac_false_forward(wiener_iters):
    """cac=False model paths run end-to-end (mag-mask / mixture-phase /
    Wiener EM). Reference parity is unavailable (openunmix not installed);
    shape + finiteness + torch-model construction compatibility checked."""
    from demucs_tpu.models import hdemucs as jh

    cfg = jh.HDemucsConfig(
        sources=tuple(SOURCES), channels=4, cac=False, nfft=1024,
        wiener_iters=wiener_iters, end_iters=wiener_iters,
    )
    params = jh.init_hdemucs(cfg)
    mix = random_mix((1, 2, 4096), seed=5)
    out = np.asarray(jh.forward(params, jnp.asarray(mix), cfg))
    assert out.shape == (1, 4, 2, 4096)
    assert np.isfinite(out).all()


def test_cac_false_param_shapes_match_reference():
    ref = import_reference()
    torch.manual_seed(0)
    tmodel = ref.hdemucs.HDemucs(SOURCES, channels=4, cac=False,
                                 wiener_iters=0, end_iters=0)
    from demucs_tpu.models import hdemucs as jh
    from demucs_tpu.zoo.torch_load import flatten_state

    cfg = jh.HDemucsConfig(sources=tuple(SOURCES), channels=4, cac=False)
    ours = {k: tuple(v.shape) for k, v in flatten_state(jh.init_hdemucs(cfg)).items()}
    theirs = {k: tuple(v.shape) for k, v in tmodel.state_dict().items()}
    assert ours == theirs
