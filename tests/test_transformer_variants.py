"""Transformer embedding variants (CAPE / scaled / norm variants) vs the
reference, and bag segment-override semantics."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from common import SOURCES, make_htdemucs_pair, random_mix
from torchref import import_reference, torch_state_to_params

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
