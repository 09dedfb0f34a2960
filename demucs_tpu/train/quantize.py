"""Quantization-aware training: DiffQ (learnable bit-depths via pseudo
quantization noise) and fixed-bit QAT, on functional param pytrees.

Behavioral reference: the reference trains its ``mdx_q``/``mdx_extra_q``
models with ``diffq.DiffQuantizer(model, min_size=0.2, group_size=8)`` and a
model-size penalty term in the loss (``demucs/states.py:23-47``,
``demucs/solver.py:339-342``, ``conf/config.yaml:284-288``), or with
``UniformQuantizer(bits=qat)`` for fixed-bit QAT. DiffQ (Défossez, Adi,
Synnaeve, "Differentiable Model Compression via Pseudo Quantization Noise"):
during training each large weight group gets additive noise matching the
quantization step implied by a *learnable* bit-depth, and the loss carries
``penalty * model_size_MB``; at export the weights are hard-quantized with
the learned bits.

Here the quantizer is pure data: a frozen :class:`QuantSpec`, a
``{name: (groups,) logits}`` pytree trained alongside the model by its own
Adam (diffq's ``setup_optimizer`` uses lr 1e-3), and pure functions mapping
params -> noisy/STE/hard-quantized params inside the jitted train step.
Group walk + serialized container are shared with the checkpoint decoder
(``demucs_tpu/zoo/diffq.py``), so our quantized exports load back through
``load_th_model``'s path.
"""

from __future__ import annotations

import dataclasses
import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["QuantSpec", "make_spec", "quantized_param_names", "init_logits",
           "bits_from_logits", "noisy_params", "ste_params", "eval_params",
           "model_size_mb", "hard_quantized_state"]


@dataclasses.dataclass(frozen=True)
class QuantSpec:
    mode: str                 # "diffq" | "qat"
    penalty: float = 0.0      # diffq model-size loss weight
    bits: int = 8             # qat fixed bit-depth
    min_size: float = 0.2     # MB threshold below which params stay fp32
    group_size: int = 8
    min_bits: float = 2.0
    max_bits: float = 15.0
    init_bits: float = 8.0
    logit_lr: float = 1e-3


def make_spec(args) -> tp.Optional[QuantSpec]:
    """TrainArgs.quant -> QuantSpec (None when quantization is off)."""
    q = args.quant
    if q.diffq:
        return QuantSpec(mode="diffq", penalty=float(q.diffq),
                         min_size=q.min_size, group_size=q.group_size)
    if q.qat:
        return QuantSpec(mode="qat", bits=int(q.qat), min_size=q.min_size,
                         group_size=0)  # UniformQuantizer: per-tensor range
    return None


def quantized_param_names(kind: str, cfg, spec: QuantSpec) -> tp.Tuple[str, ...]:
    """Dotted names of params large enough to quantize (> min_size MB of fp32
    elements), in the canonical walk order shared with the decoder."""
    from demucs_tpu.zoo.diffq import _partition, param_order

    big, _small = _partition(param_order(kind, cfg), spec.min_size)
    if spec.group_size:
        for name, shape in big:
            numel = int(np.prod(shape))
            if numel % spec.group_size:
                raise ValueError(
                    f"{name}: numel {numel} not divisible by group_size "
                    f"{spec.group_size}")
    return tuple(name for name, _ in big)


# ---------------------------------------------------------------- pytree utils

# The dotted-name scheme must stay byte-identical to the zoo walk that
# zoo.diffq.param_order keys on — use the single canonical implementation.
from demucs_tpu.zoo.torch_load import flatten_state as _flatten  # noqa: E402


def _nest(flat: tp.Mapping[str, tp.Any]) -> dict:
    out: dict = {}
    for name, value in flat.items():
        parts = [int(p) if p.isdigit() else p for p in name.split(".")]
        node = out
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return out


def _groups(w, group_size: int):
    return w.reshape(-1, group_size) if group_size else w.reshape(1, -1)


# ------------------------------------------------------------------- training

def init_logits(params: dict, names: tp.Sequence[str], spec: QuantSpec) -> dict:
    """One logit per weight group, initialized so bits == init_bits."""
    p0 = (spec.init_bits - spec.min_bits) / (spec.max_bits - spec.min_bits)
    l0 = math.log(p0 / (1.0 - p0))
    flat = _flatten(params)
    out = {}
    for name in names:
        n_groups = _groups(flat[name], spec.group_size).shape[0]
        out[name] = jnp.full((n_groups,), l0, jnp.float32)
    return out


def bits_from_logits(logit: jax.Array, spec: QuantSpec) -> jax.Array:
    return spec.min_bits + (spec.max_bits - spec.min_bits) * jax.nn.sigmoid(logit)


def noisy_params(params: dict, logits: tp.Mapping[str, jax.Array],
                 key: jax.Array, spec: QuantSpec) -> dict:
    """DiffQ train-time params: per-group additive noise with the std of the
    uniform quantization error (delta/sqrt(12)) at the learnable bit-depth.
    Differentiable w.r.t. both the weights and the logits."""
    flat = _flatten(params)
    out = dict(flat)
    names = sorted(logits)
    keys = jax.random.split(key, max(1, len(names)))
    for k, name in zip(keys, names):
        w = flat[name]
        g = _groups(w, spec.group_size)
        bits = bits_from_logits(logits[name], spec)[:, None]
        span = jax.lax.stop_gradient(
            g.max(axis=-1, keepdims=True) - g.min(axis=-1, keepdims=True))
        delta = span / (2.0 ** bits - 1.0)
        noise = jax.random.normal(k, g.shape, dtype=w.dtype)
        out[name] = (g + noise * (delta / math.sqrt(12.0))).reshape(w.shape)
    return _nest(out)


def _hard_quant_dequant(g: jax.Array, bits: jax.Array) -> jax.Array:
    """Affine [min, max]-range quantize->dequantize of groups ``(G, n)`` at
    per-group ``bits (G, 1)`` (the container codec of zoo/diffq.py)."""
    mn = g.min(axis=-1, keepdims=True)
    mx = g.max(axis=-1, keepdims=True)
    nlev = 2.0 ** bits - 1.0
    span = jnp.where(mx > mn, mx - mn, 1.0)
    levels = jnp.round((g - mn) / span * nlev)
    return levels / nlev * (mx - mn) + mn


def ste_params(params: dict, names: tp.Sequence[str], spec: QuantSpec) -> dict:
    """Fixed-bit QAT params: straight-through estimator — forward sees the
    hard-quantized weights, gradient passes through unchanged."""
    flat = _flatten(params)
    out = dict(flat)
    for name in names:
        w = flat[name]
        g = _groups(w, spec.group_size)
        q = _hard_quant_dequant(g, jnp.asarray(float(spec.bits))).reshape(w.shape)
        out[name] = w + jax.lax.stop_gradient(q - w)
    return _nest(out)


def eval_params(params: dict, logits: tp.Mapping[str, jax.Array],
                spec: QuantSpec) -> dict:
    """DiffQ eval-time params: hard quantize-dequantize at the ROUNDED learned
    bit-depths (mirrors diffq's eval-mode forward pre-hook, so validation
    scores reflect the quantized model)."""
    flat = _flatten(params)
    out = dict(flat)
    for name in sorted(logits):
        w = flat[name]
        g = _groups(w, spec.group_size)
        bits = jnp.clip(jnp.round(bits_from_logits(logits[name], spec)),
                        1.0, 15.0)[:, None]
        out[name] = _hard_quant_dequant(g, bits).reshape(w.shape)
    return _nest(out)


def model_size_mb(logits: tp.Mapping[str, jax.Array], spec: QuantSpec,
                  group_numel: tp.Optional[tp.Mapping[str, int]] = None) -> jax.Array:
    """Differentiable model size (MB) of the quantized params: sum over groups
    of group_size * bits, in bytes. The diffq penalty target."""
    total_bits = 0.0
    for name in sorted(logits):
        bits = bits_from_logits(logits[name], spec)
        per_group = (group_numel or {}).get(name, spec.group_size)
        total_bits = total_bits + (bits * per_group).sum()
    return total_bits / 8.0 / 2.0**20


def hard_quantized_state(params: dict, logits: tp.Optional[tp.Mapping[str, jax.Array]],
                         spec: QuantSpec, kind: str, cfg) -> dict:
    """Export: params -> ``__quantized`` container (decoder-compatible,
    docs/diffq_format.md) with per-group learned bits (diffq) or the fixed
    QAT bits."""
    from demucs_tpu.zoo.diffq import _partition, param_order, quantize_entry

    order = param_order(kind, cfg)
    big, small = _partition(order, spec.min_size)
    flat = {k: np.asarray(v) for k, v in _flatten(params).items()}
    quantized = []
    for name, _shape in big:
        arr = flat[name].astype(np.float32)
        if logits is not None:
            bits = np.clip(np.round(np.asarray(
                bits_from_logits(logits[name], spec))), 1, 15).astype(np.uint8)
        else:
            bits = None
        quantized.append(quantize_entry(arr, spec.group_size,
                                        spec.bits if bits is None else bits))
    others = [flat[name].astype(np.float32) for name, _ in small]
    return {
        "__quantized": True,
        "quantized": quantized,
        "others": others,
        "float16": [],
        "meta": {
            "klass": "DiffQuantizer" if spec.mode == "diffq" else "UniformQuantizer",
            "init_kwargs": {"min_size": spec.min_size,
                            "group_size": spec.group_size}
            if spec.mode == "diffq" else
            {"min_size": spec.min_size, "bits": spec.bits},
        },
    }
