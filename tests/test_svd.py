"""SVD spectral penalty parity vs the reference (exact path) and estimator
sanity (lowrank/power approximate the exact value)."""

import numpy as np
import torch

import jax

from common import make_htdemucs_pair

from demucs_tpu.train.svd import svd_penalty


def test_exact_penalty_matches_reference():
    from torchref import import_reference

    ref = import_reference()
    from demucs.svd import svd_penalty as ref_svd_penalty

    tmodel, cfg, params = make_htdemucs_pair()
    want = float(ref_svd_penalty(tmodel, min_size=0.01, exact=True, proba=1))
    got = float(svd_penalty(params, min_size=0.01, exact=True, proba=1))
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_demucs_v2_convtr_parity():
    """The v2 decoder's transposed convs live at positional paths (no
    'conv_tr' in the name): convtr_names_for must enumerate them so the
    exact penalty matches the reference's isinstance-based transposition."""
    from torchref import import_reference

    import_reference()
    from demucs.demucs import Demucs as TorchDemucs
    from demucs.svd import svd_penalty as ref_svd_penalty

    from demucs_tpu.models import demucs as m_d
    from demucs_tpu.train.svd import convtr_names_for
    from demucs_tpu.zoo.torch_load import flatten_state, nest_state

    cfg = m_d.DemucsConfig(sources=("a", "b", "c", "d"), channels=16,
                           depth=3, samplerate=8000)
    torch.manual_seed(3)
    tmodel = TorchDemucs(list(cfg.sources), audio_channels=2,
                         channels=16, depth=3, samplerate=8000)
    params = nest_state({k: v.detach().numpy()
                         for k, v in tmodel.state_dict().items()})

    class _M:
        kind = "demucs"

    _M.cfg = cfg
    names = convtr_names_for(_M)
    flat = flatten_state(params)
    assert names and all(n in flat for n in names), (sorted(names))
    # each enumerated weight really is a decoder ConvTranspose1d
    for (tname, mod) in tmodel.named_modules():
        if isinstance(mod, torch.nn.ConvTranspose1d):
            assert f"{tname}.weight" in names, tname
    want = float(ref_svd_penalty(tmodel, min_size=0.01, exact=True, proba=1))
    got = float(svd_penalty(params, min_size=0.01, exact=True, proba=1,
                            convtr_names=names))
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_lowrank_approximates_exact():
    _, cfg, params = make_htdemucs_pair()
    exact = float(svd_penalty(params, min_size=0.01, exact=True, proba=1))
    approx = float(svd_penalty(params, min_size=0.01, dim=4, niters=3, proba=1,
                               key=jax.random.PRNGKey(0)))
    # randomized lowrank underestimates slightly; should be within ~10%
    assert 0.7 * exact < approx <= 1.02 * exact, (approx, exact)


def test_penalty_is_differentiable():
    _, cfg, params = make_htdemucs_pair()

    def loss(p):
        return svd_penalty(p, min_size=0.01, dim=1, niters=2, proba=1,
                           key=jax.random.PRNGKey(1))

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(grads)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in leaves)
