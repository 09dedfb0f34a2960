"""Transformer embedding variants (CAPE / scaled / norm variants) vs the
reference, and bag segment-override semantics."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from common import SOURCES, make_htdemucs_pair, random_mix

from demucs_tpu.models import htdemucs as jht


@pytest.mark.parametrize(
    "extra",
    [
        {"t_emb": "cape", "t_cape_augment": False},
        {"t_emb": "scaled"},
        {"t_norm_first": False, "t_norm_out": False},
        {"t_cross_first": True},
        {"t_gelu": False},
    ],
    ids=["cape", "scaled", "post_norm", "cross_first", "relu"],
)
def test_transformer_variant_parity(extra):
    tmodel, cfg, params = make_htdemucs_pair(extra)
    L = cfg.training_length
    mix = random_mix((1, 2, L), seed=70)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(mix)).numpy()
    got = np.asarray(jax.jit(jht.forward, static_argnames=("cfg",))(params, mix, cfg))
    err = np.abs(got - want).max()
    assert err < 3e-3 * max(np.abs(want).max(), 1.0), err


def test_cape_train_augment_runs():
    _, cfg0, params = make_htdemucs_pair({"t_emb": "cape"})
    import dataclasses

    cfg = dataclasses.replace(cfg0, t_cape_augment=True)
    mix = random_mix((1, 2, cfg.training_length), seed=71)
    out = jht.forward(params, jnp.asarray(mix), cfg, train=True,
                      rng=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out)).all()


def test_bag_segment_override_mutates_non_ht_models():
    """BagOfModels(segment=...) raises the segment of non-HTDemucs members
    in place (apply.py:53-55), and leaves HTDemucs alone."""
    from demucs_tpu.models import hdemucs as jh
    from demucs_tpu.models.registry import BagOfModels, Model

    hcfg = jh.HDemucsConfig(sources=tuple(SOURCES), channels=4, segment=40.0,
                            samplerate=8000)
    hd = Model("hdemucs", hcfg, jh.init_hdemucs(hcfg))
    _, htcfg, htparams = make_htdemucs_pair()
    htd = Model("htdemucs", htcfg, htparams)

    bag = BagOfModels([hd, htd], segment=44)
    assert hd.segment == 44.0
    assert htd.segment == htcfg.segment  # unchanged
    assert bag.max_allowed_segment == float(htcfg.segment)


def test_dropout_active_in_train_only():
    """t_dropout (reference transformer.py:277,449-450,507-512): eval is
    deterministic and dropout-free; train=True with an rng perturbs the
    output stochastically per key."""
    import jax
    import numpy as np

    from common import make_htdemucs_pair, random_mix
    from demucs_tpu.models import htdemucs as jht

    # layer_scale off: its 1e-4 gamma init hides the dropout perturbation at
    # random init
    _, cfg, params = make_htdemucs_pair(
        extra=dict(t_dropout=0.5, t_layer_scale=False))
    L = int(cfg.samplerate * cfg.segment)
    mix = random_mix((1, 2, L), seed=21)

    fwd = jax.jit(jht.forward, static_argnames=("cfg", "train"))
    ev1 = np.asarray(fwd(params, mix, cfg))
    ev2 = np.asarray(fwd(params, mix, cfg))
    np.testing.assert_array_equal(ev1, ev2)  # eval: no dropout

    tr1 = np.asarray(fwd(params, mix, cfg, train=True, rng=jax.random.PRNGKey(0)))
    tr2 = np.asarray(fwd(params, mix, cfg, train=True, rng=jax.random.PRNGKey(1)))
    scale = np.abs(ev1).max()
    assert np.abs(tr1 - ev1).max() > 1e-3 * scale  # dropout changes the output
    assert np.abs(tr1 - tr2).max() > 1e-3 * scale  # and is rng-dependent
    assert np.isfinite(tr1).all() and np.isfinite(tr2).all()
