"""diffq quantized-checkpoint decoder: parameter walk golden-tested against
torch, encoder/decoder round trip, end-to-end load through the hermetic .th
bridge. Format assumptions: docs/diffq_format.md."""

import numpy as np
import pytest
import torch

from common import SOURCES, make_htdemucs_pair
from torchref import import_reference

from demucs_tpu.zoo.diffq import (
    dequantize_entry, dequantize_state, param_order, quantize_state,
)
from demucs_tpu.zoo.torch_load import config_from_torch_kwargs, flatten_state


def test_param_order_matches_torch():
    ref = import_reference()

    cases = [
        ("HTDemucs", make_htdemucs_pair()[0], make_htdemucs_pair()[1]),
        ("HTDemucs",
         make_htdemucs_pair(extra={"bottom_channels": 32})[0],
         make_htdemucs_pair(extra={"bottom_channels": 32})[1]),
    ]
    t_h = ref.hdemucs.HDemucs(SOURCES, channels=8).eval()
    cfg_h, _ = config_from_torch_kwargs("HDemucs", (SOURCES,), dict(channels=8))
    cases.append(("HDemucs", t_h, cfg_h))
    t_d = ref.demucs.Demucs(SOURCES, channels=8, depth=4, lstm_layers=2).eval()
    cfg_d, _ = config_from_torch_kwargs(
        "Demucs", (SOURCES,), dict(channels=8, depth=4, lstm_layers=2))
    cases.append(("Demucs", t_d, cfg_d))

    kind_map = {"HTDemucs": "htdemucs", "HDemucs": "hdemucs", "Demucs": "demucs"}
    for klass, tmodel, cfg in cases:
        want = [(n, tuple(p.shape)) for n, p in tmodel.named_parameters()]
        got = param_order(kind_map[klass], cfg)
        assert got == want, klass


def test_quantize_roundtrip_bounds():
    _, cfg, params = make_htdemucs_pair()
    flat = {k: np.asarray(v) for k, v in flatten_state(params).items()}
    state = quantize_state(flat, "htdemucs", cfg, min_size_mb=0.001, bits=8)
    state["meta"]["init_kwargs"]["min_size"] = 0.001
    assert state["__quantized"] and len(state["quantized"]) > 0

    decoded = dequantize_state(state, "htdemucs", cfg)
    assert set(decoded) == set(flat)
    for name in flat:
        a, b = flat[name], decoded[name]
        assert b.shape == a.shape and b.dtype == np.float32
        # 8-bit [min,max] group quantization: error <= half a step per group
        if a.size > int(0.001 * 2**20) // 4:
            span = a.reshape(-1, 8).max(-1) - a.reshape(-1, 8).min(-1)
            step = (span / 255.0).reshape(-1, 1)
            err = np.abs((b - a).reshape(-1, 8))
            assert (err <= step * 0.5 + 1e-7).all(), name
        else:
            np.testing.assert_array_equal(a.astype(np.float32), b)


def test_dequantize_symmetric_branch():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((4, 8)).astype(np.float32)
    scale = np.abs(w).max(axis=-1, keepdims=True)
    bits = np.full((4,), 8, np.uint8)
    levels = np.round(w / scale * 127.0).astype(np.int8)
    out = dequantize_entry((levels, scale, bits), (4, 8), {})
    assert np.abs(out - w).max() <= (scale / 127.0 * 0.5 + 1e-6).max()


def test_dequantize_minmax_tuple_branch():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((4, 8)).astype(np.float32)
    mn = w.min(axis=-1, keepdims=True)
    mx = w.max(axis=-1, keepdims=True)
    levels = np.round((w - mn) / (mx - mn) * 255.0).astype(np.uint8)
    out = dequantize_entry((levels, (mn, mx)), (4, 8), {"bits": 8})
    assert np.abs(out - w).max() <= ((mx - mn) / 255.0 * 0.5 + 1e-6).max()


def test_dequantize_unknown_layout_raises():
    levels = np.zeros((4, 8), np.uint8)  # unsigned + single scale: ambiguous
    with pytest.raises(NotImplementedError, match="diffq_format"):
        dequantize_entry((levels, np.ones((4, 1))), (4, 8), {"bits": 8})


def test_quantize_entry_validates_bits_and_group_size():
    """int16 levels cap bits at 15 (silent wraparound otherwise); a group
    size of 2 would emit a container the decoder's structural detection is
    guaranteed to misread."""
    from demucs_tpu.zoo.diffq import quantize_entry

    arr = np.random.default_rng(0).standard_normal(64).astype(np.float32)
    with pytest.raises(ValueError, match=r"bits must be in \[1, 15\]"):
        quantize_entry(arr, 8, 16)
    with pytest.raises(ValueError, match=r"bits must be in \[1, 15\]"):
        quantize_entry(arr, 8, 0)
    with pytest.raises(ValueError, match="group_size=2"):
        quantize_entry(arr, 2, 8)
    levels, scales, bits = quantize_entry(arr, 8, 15)
    assert levels.dtype == np.int16 and levels.min() >= 0


def test_dequantize_count_mismatch_raises():
    _, cfg, _ = make_htdemucs_pair()
    state = {"__quantized": True, "quantized": [], "others": [],
             "meta": {"init_kwargs": {"min_size": 0.001}}}
    with pytest.raises(ValueError, match="line up"):
        dequantize_state(state, "htdemucs", cfg)


def test_quantized_th_loads_end_to_end(tmp_path):
    """A reference-format package whose state is __quantized loads through
    load_th_model (hermetic read + dequant) and the model runs."""
    import jax

    tmodel, cfg_direct, _ = make_htdemucs_pair()
    import_reference()
    from demucs.states import serialize_model

    pkg = serialize_model(tmodel, {"dummy": 1}, half=False)
    flat = {k: v.numpy() for k, v in pkg["state"].items()}
    pkg["state"] = quantize_state(flat, "htdemucs", cfg_direct,
                                  min_size_mb=0.001, bits=8)
    pkg["state"]["meta"]["init_kwargs"]["min_size"] = 0.001
    path = tmp_path / "model_q.th"
    torch.save(pkg, path)

    from demucs_tpu.zoo.torch_load import load_th_model

    cfg, kind, params = load_th_model(path)
    assert kind == "htdemucs"
    got = flatten_state(params)
    # quantization error only: high-SNR reconstruction of every big tensor
    for name, want in flat.items():
        g = np.asarray(got[name])
        sig = np.linalg.norm(want)
        if sig < 1e-9:  # zero-init tensors (norm biases, LayerScale)
            np.testing.assert_allclose(g, want, atol=1e-7, err_msg=name)
            continue
        noise = np.linalg.norm(g - want)
        snr = 20 * np.log10(sig / (noise + 1e-12))
        assert snr > 35, (name, snr)

    from demucs_tpu.models import htdemucs as jht

    L = cfg.training_length
    mix = np.random.default_rng(0).standard_normal((1, 2, L)).astype(np.float32) * 0.1
    out = np.asarray(jax.jit(jht.forward, static_argnames=("cfg",))(params, mix, cfg))
    assert np.isfinite(out).all() and out.shape == (1, 4, 2, L)
