"""Quantization-aware training (train/quantize.py): unit behavior of the
pseudo-noise / STE / hard-quant transforms, and a full DiffQ solver smoke run
(logits train, ms metric logged, resume keeps logits, quantized export
round-trips through the decoder and the native .dmx container)."""

import numpy as np

import jax
import jax.numpy as jnp

from test_train_smoke import SR, dataset_root, _make_args  # noqa: F401 (fixture)

from demucs_tpu.train.quantize import (
    QuantSpec, bits_from_logits, eval_params,
    init_logits, model_size_mb, noisy_params, quantized_param_names,
    ste_params,
)


def _toy_params():
    rng = np.random.default_rng(0)
    return {
        "enc": {0: {"weight": jnp.asarray(rng.standard_normal((16, 16)),
                                          jnp.float32)}},
        "bias": jnp.asarray(rng.standard_normal(4), jnp.float32),
    }


SPEC = QuantSpec(mode="diffq", penalty=1e-4, min_size=1e-4, group_size=8)


def test_noisy_params_scope_and_scale():
    params = _toy_params()
    names = ["enc.0.weight"]
    logits = init_logits(params, names, SPEC)
    noisy = noisy_params(params, logits, jax.random.PRNGKey(0), SPEC)
    w = np.asarray(params["enc"][0]["weight"])
    nw = np.asarray(noisy["enc"][0]["weight"])
    assert not np.array_equal(w, nw)
    # small params untouched
    np.testing.assert_array_equal(np.asarray(noisy["bias"]),
                                  np.asarray(params["bias"]))
    # noise std ~ delta/sqrt(12) at 8 bits: bounded well below weight scale
    g = w.reshape(-1, 8)
    delta = (g.max(-1) - g.min(-1)) / 255.0
    assert np.abs(nw - w).max() < 6 * delta.max()


def test_model_size_tracks_bits():
    params = _toy_params()
    logits = init_logits(params, ["enc.0.weight"], SPEC)
    ms8 = float(model_size_mb(logits, SPEC))
    # 16*16 weights at 8 bits = 256 bytes
    assert abs(ms8 - 256 / 2**20) < 1e-9
    fewer = {k: v - 10.0 for k, v in logits.items()}  # bits -> ~min_bits
    assert float(model_size_mb(fewer, SPEC)) < ms8 / 2
    # differentiable and pushing bits DOWN (positive gradient w.r.t. logits)
    grad = jax.grad(lambda lg: model_size_mb(lg, SPEC))(logits)
    assert float(np.asarray(grad["enc.0.weight"]).sum()) > 0


def test_ste_value_and_gradient():
    spec = QuantSpec(mode="qat", bits=5, min_size=1e-4, group_size=0)
    params = _toy_params()
    out = ste_params(params, ["enc.0.weight"], spec)
    w = np.asarray(params["enc"][0]["weight"])
    q = np.asarray(out["enc"][0]["weight"])
    # value is truly quantized: at most 2**5 distinct values
    assert len(np.unique(q)) <= 32
    assert np.abs(q - w).max() <= (w.max() - w.min()) / 31 * 0.5 + 1e-6

    # straight-through gradient: d(sum(ste(w)))/dw == 1
    def f(p):
        return ste_params(p, ["enc.0.weight"], spec)["enc"][0]["weight"].sum()

    g = jax.grad(f)(params)
    np.testing.assert_allclose(np.asarray(g["enc"][0]["weight"]), 1.0)


def test_eval_params_matches_decoder():
    """Hard-quantized eval params == decoding the exported container."""
    from demucs_tpu.zoo.diffq import dequantize_entry

    params = _toy_params()
    logits = {"enc.0.weight": jnp.asarray(np.linspace(-3, 3, 32), jnp.float32)}
    ev = np.asarray(eval_params(params, logits, SPEC)["enc"][0]["weight"])

    w = np.asarray(params["enc"][0]["weight"])
    bits = np.clip(np.round(np.asarray(bits_from_logits(logits["enc.0.weight"],
                                                        SPEC))), 1, 15)
    from demucs_tpu.zoo.diffq import quantize_entry

    entry = quantize_entry(w, 8, bits.astype(np.uint8))
    dec = dequantize_entry(entry, w.shape, {})
    np.testing.assert_allclose(ev, dec, atol=1e-6)


def test_diffq_solver_smoke(dataset_root, tmp_path):  # noqa: F811
    from demucs_tpu.train.train import get_solver
    from demucs_tpu.train.config import xp_signature

    args = _make_args(dataset_root, tmp_path, **{
        "quant.diffq": 1e-4,
        "quant.min_size": 1e-4,  # tiny model: lower the threshold
        "quant.group_size": 8,
        "epochs": 1,
    })
    solver = get_solver(args)
    assert solver.qlogits, "no quantized params found"
    init = {k: np.asarray(v).copy() for k, v in solver.qlogits.items()}
    solver.train()

    m = solver.history[-1]["train"]
    assert np.isfinite(m["loss"]) and "ms" in m and m["ms"] > 0
    moved = any(not np.allclose(np.asarray(solver.qlogits[k]), init[k])
                for k in init)
    assert moved, "diffq logits did not train"

    # resume restores logits
    solver2 = get_solver(args)
    for k in init:
        np.testing.assert_array_equal(np.asarray(solver2.qlogits[k]),
                                      np.asarray(solver.qlogits[k]))

    # quantized export round-trips: container decodes and loads as a model
    qstate = solver.quantized_state()
    from demucs_tpu.zoo.diffq import dequantize_state
    from demucs_tpu.zoo.torch_load import flatten_state

    flat = dequantize_state(qstate, solver.model.kind, solver.model.cfg)
    want = flatten_state(solver.model.params)
    assert set(flat) == set(want)
    name = max(flat, key=lambda n: flat[n].size)
    w = np.asarray(want[name])
    snr = 20 * np.log10(np.linalg.norm(w)
                        / (np.linalg.norm(flat[name] - w) + 1e-12))
    assert snr > 30, (name, snr)

    from demucs_tpu.zoo.native import load_native_model, serialize_model

    qpath = tmp_path / "model_q.dmx"
    qpath.write_bytes(serialize_model(solver.model, quantized_state=qstate))
    loaded = load_native_model(qpath)
    got = flatten_state(loaded.params)
    np.testing.assert_allclose(np.asarray(got[name]), flat[name], atol=1e-6)

    sig = xp_signature(args)
    assert (tmp_path / "outputs" / "xps" / sig / "checkpoint.tpk").exists()


def test_qat_solver_smoke(dataset_root, tmp_path):  # noqa: F811
    from demucs_tpu.train.train import get_solver

    args = _make_args(dataset_root, tmp_path, **{
        "quant.qat": 6,
        "quant.min_size": 1e-4,
        "epochs": 1,
        "ema.batch": (),
        "ema.epoch": (),
    })
    solver = get_solver(args)
    assert solver.qlogits is None and solver._qnames
    solver.train()
    assert np.isfinite(solver.history[-1]["train"]["loss"])
    assert np.isfinite(solver.history[-1]["valid"]["loss"])


def test_quantized_names_full_width_match_decoder_partition():
    """The trainer's quantized-param walk equals the decoder's partition at
    the released mdx settings (min_size 0.2, group 8) on the reduced model."""
    from common import make_htdemucs_pair
    from demucs_tpu.zoo.diffq import _partition, param_order

    _, cfg, _ = make_htdemucs_pair()
    spec = QuantSpec(mode="diffq", min_size=0.01, group_size=8)
    names = quantized_param_names("htdemucs", cfg, spec)
    big, _ = _partition(param_order("htdemucs", cfg), 0.01)
    assert list(names) == [n for n, _ in big]
