"""Zoo bridge: reference .th packages load into working models; native .dmx
roundtrips; fp16 states promote; unknown kwargs drop."""

import numpy as np
import torch

import jax

from common import SOURCES, make_htdemucs_pair, random_mix
from torchref import import_reference

from demucs_tpu.models.registry import Model
from demucs_tpu.zoo.torch_load import load_th_model


def _serialize_reference_model(tmodel, path, half=True):
    import_reference()
    from demucs.states import serialize_model

    pkg = serialize_model(tmodel, {"dummy": 1}, half=half)
    pkg["kwargs"]["unknown_future_arg"] = 123  # exercised drop path
    torch.save(pkg, path)


def test_th_roundtrip_forward_parity(tmp_path):
    tmodel, cfg_direct, _ = make_htdemucs_pair()
    path = tmp_path / "model.th"
    _serialize_reference_model(tmodel, path, half=True)

    cfg, kind, params = load_th_model(path)
    assert kind == "htdemucs"
    assert cfg.sources == tuple(SOURCES)
    assert float(cfg.segment) == cfg_direct.segment

    from demucs_tpu.models import htdemucs as jht

    L = cfg.training_length
    mix = random_mix((1, 2, L), seed=60)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(mix)).numpy()
    got = np.asarray(jax.jit(jht.forward, static_argnames=("cfg",))(params, mix, cfg))
    # fp16 storage round-trip: ~1e-3 relative
    err = np.abs(got - want).max()
    assert err < 2e-2 * max(np.abs(want).max(), 1.0), err


def test_native_dmx_roundtrip(tmp_path):
    from demucs_tpu.zoo.native import load_native_model, save_with_checksum

    _, cfg, params = make_htdemucs_pair()
    model = Model("htdemucs", cfg, params)
    path = save_with_checksum(model, tmp_path / "model.dmx", half=False)
    assert "-" in path.stem  # sha256 suffix

    loaded = load_native_model(path)
    assert loaded.kind == "htdemucs"
    assert loaded.cfg == cfg
    from demucs_tpu.zoo.torch_load import flatten_state

    a = flatten_state(params)
    b = flatten_state(loaded.params)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_local_repo_scan_and_checksum(tmp_path):
    from demucs_tpu.zoo.native import save_with_checksum
    from demucs_tpu.zoo.repo import LocalRepo

    _, cfg, params = make_htdemucs_pair()
    model = Model("htdemucs", cfg, params)
    path = save_with_checksum(model, tmp_path / "abcd1234.dmx")
    sig = path.stem.split("-")[0]

    repo = LocalRepo(tmp_path)
    assert repo.has_model(sig)
    loaded = repo.get_model(sig)
    assert loaded.cfg.sources == cfg.sources


def test_v2_legacy_rename_shim():
    from demucs_tpu.zoo.torch_load import _demucs_v2_rename_shim

    state = {"encoder.0.2.weight": np.zeros(1), "encoder.0.2.bias": np.zeros(1),
             "decoder.1.3.weight": np.ones(1)}
    out = _demucs_v2_rename_shim(state, depth=2)
    assert "encoder.0.3.weight" in out and "encoder.0.2.weight" not in out
    assert "decoder.1.3.weight" in out
