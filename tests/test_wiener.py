"""Wiener EM filter invariants + cac=False model paths.

openunmix (the reference's wiener dependency) is not installed, so correctness
rests on first-principles properties of the multichannel Wiener filter:
initialization uses the mixture phase; EM source estimates sum to the mixture
(the gains sum to identity); a single source whose magnitude matches the
mixture reconstructs it.
"""

import jax
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from common import SOURCES, random_mix
from torchref import import_reference

from demucs_tpu.ops.wiener import wiener


@pytest.fixture(scope="module", autouse=True)
def _fresh_executable_memory():
    """Late in the full suite ~200 live executables exhaust the XLA CPU JIT's
    code memory and the (large) hdemucs+wiener forward compile segfaults
    deterministically; dropping cached executables first keeps it healthy.
    Only this module recompiles afterwards — earlier modules already ran."""
    jax.clear_caches()


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


def test_em_fixed_point_disjoint_sources():
    """Exact-answer case: two sources with disjoint time support. Starting
    from the true estimates, every EM iteration must return (nearly) the true
    sources — the gain for the active source is ~1 where the other's PSD is
    zero. This pins the E/M steps' *solution*, not just invariants."""
    rng = np.random.default_rng(4)
    T, F, C = 20, 8, 2
    y_true = np.zeros((T, F, C, 2), np.complex64)
    y_true[:10, ..., 0] = (rng.standard_normal((10, F, C))
                           + 1j * rng.standard_normal((10, F, C)))
    y_true[10:, ..., 1] = (rng.standard_normal((10, F, C))
                           + 1j * rng.standard_normal((10, F, C)))
    x = y_true.sum(axis=-1)

    from demucs_tpu.ops.wiener import expectation_maximization

    for iters in (1, 3):
        y = np.asarray(expectation_maximization(
            jnp.asarray(y_true), jnp.asarray(x), iterations=iters))
        err = np.abs(y - y_true).max() / np.abs(y_true).max()
        assert err < 2e-3, (iters, err)


def test_em_single_iteration_hand_derived():
    """One EM iteration on a tiny (T=3, F=1, C=2, S=2) case, checked against
    an independent plain-loop implementation of the published local Gaussian
    model equations (Liutkus & Badeau; np.linalg.inv vs our closed-form 2x2
    adjugate, loops vs the einsum chain)."""
    rng = np.random.default_rng(5)
    T, Fq, C, S = 3, 1, 2, 2
    eps = 1e-10  # openunmix default
    y0 = (rng.standard_normal((T, Fq, C, S))
          + 1j * rng.standard_normal((T, Fq, C, S))).astype(np.complex64)
    x = (rng.standard_normal((T, Fq, C))
         + 1j * rng.standard_normal((T, Fq, C))).astype(np.complex64)

    # independent derivation (f = 0 only)
    y = y0[:, 0]  # (T, C, S)
    v = np.mean(np.abs(y) ** 2, axis=1)  # (T, S)
    want = np.zeros_like(y)
    R = np.zeros((S, C, C), np.complex128)
    for s in range(S):
        num = sum(np.outer(y[t, :, s], np.conj(y[t, :, s])) for t in range(T))
        R[s] = num / (eps + v[:, s].sum())
    for t in range(T):
        # openunmix regularizes with sqrt(eps) * I = 1e-5 * I
        Cx = sum(v[t, s] * R[s] for s in range(S)) + np.sqrt(eps) * np.eye(C)
        inv = np.linalg.inv(Cx)
        for s in range(S):
            want[t, :, s] = v[t, s] * (R[s] @ inv @ x[t, 0])

    from demucs_tpu.ops.wiener import expectation_maximization

    got = np.asarray(expectation_maximization(
        jnp.asarray(y0), jnp.asarray(x), iterations=1))[:, 0]
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_against_openunmix_golden():
    """Golden-tensor comparison against the reference's actual wiener
    dependency. The fixture is produced on a networked machine by
    ``python tools/dump_wiener_golden.py`` (openunmix installable there);
    skipped when absent — the analytic tests above carry the in-env gate."""
    from pathlib import Path

    golden_path = Path(__file__).parent / "goldens" / "wiener_openunmix.npz"
    if not golden_path.exists():
        pytest.skip("openunmix golden not generated (needs networked machine; "
                    "see tools/dump_wiener_golden.py)")
    data = np.load(golden_path)
    y = np.asarray(wiener(jnp.asarray(data["targets"]), jnp.asarray(data["mix"]),
                          iterations=int(data["iterations"])))
    np.testing.assert_allclose(y, data["expected"], atol=1e-4, rtol=1e-3)


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
