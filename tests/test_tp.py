"""Tensor-parallel shardings (parallel/tp.py): forward and train step under
Megatron-style transformer weight sharding match the single-device program
on the virtual 8-device CPU mesh (SURVEY.md §2.10 TP contingency axis)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from common import SOURCES, random_mix, small_htdemucs_kwargs

from demucs_tpu.models import htdemucs as jht
from demucs_tpu.models.registry import Model
from demucs_tpu.parallel.tp import (
    tp_forward, tp_shardings, transformer_tp_specs,
)


@pytest.fixture(scope="module")
def model():
    cfg = jht.HTDemucsConfig(sources=tuple(SOURCES), **small_htdemucs_kwargs())
    return Model("htdemucs", cfg, jht.init_htdemucs(cfg, seed=0))


def test_specs_shard_only_transformer_projections(model):
    specs = transformer_tp_specs(model.params)
    flat_specs = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    sharded = [s for s in flat_specs if s != P()]
    assert sharded, "no transformer projection matched"
    # encoder/decoder convs stay replicated
    def flatten(d, path=()):
        for k, v in d.items():
            if isinstance(v, dict):
                yield from flatten(v, path + (str(k),))
            else:
                yield path + (str(k),), v

    for path, spec in flatten(specs):
        if "crosstransformer" not in path:
            assert spec == P(), path
        if path[-1] in ("in_proj_weight", "in_proj_bias"):
            assert spec != P(), path


def test_tp_forward_matches_single_device(model, cpu_devices):
    mix = random_mix((1, 2, model.cfg.training_length), seed=21)
    want = np.asarray(model.forward_fn()(model.params, jnp.asarray(mix)))

    mesh = Mesh(np.array(cpu_devices[:4]), ("tp",))
    got = tp_forward(model, mix, mesh)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_dp_tp_train_step_matches_dp_only(model, cpu_devices):
    """One train step on a 2-D (dp=2, tp=4) mesh — params sharded over tp,
    batch over dp — matches the replicated-params DP step."""
    from demucs_tpu.train.step import (
        TrainConfig, make_optimizer, make_train_step,
    )

    tcfg = TrainConfig(clip_grad=1.0)
    optimizer = make_optimizer(tcfg)
    step = make_train_step(jht.forward, model.cfg, tcfg, optimizer)

    B = 4
    sources = random_mix(
        (B, len(SOURCES), 2, model.cfg.training_length), seed=22)
    rng = jax.random.PRNGKey(0)

    # single-device reference
    opt0 = optimizer.init(model.params)
    p_want, _o, m_want = jax.jit(step)(model.params, opt0, sources, rng)

    mesh = Mesh(np.array(cpu_devices[:8]).reshape(2, 4), ("dp", "tp"))
    param_sh = tp_shardings(model.params, mesh)
    params = jax.device_put(model.params, param_sh)
    # optimizer state inherits the param shardings (zeros_like of sharded
    # arrays) — the mu/nu trees live tp-sharded with no extra plumbing.
    opt_state = optimizer.init(params)
    batch = jax.device_put(
        sources, NamedSharding(mesh, P("dp")))
    with mesh:
        p_got, _opt, m_got = jax.jit(step)(params, opt_state, batch, rng)

    np.testing.assert_allclose(float(m_got["loss"]), float(m_want["loss"]),
                               rtol=1e-6)
    flat_want = jax.tree.leaves(p_want)
    flat_got = jax.tree.leaves(p_got)
    for a, b in zip(flat_got, flat_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
