"""Decoder for diffq-quantized reference checkpoints (``mdx_q`` /
``mdx_extra_q``) and a matching first-party quantizer.

The reference stores quantized models with ``state['__quantized'] = True``
(``demucs/states.py:96-107``) and restores them via
``diffq.restore_quantized_state`` (``demucs/states.py:23-47``). The diffq
package is not installable in this environment, so this module implements the
*format* from first principles and documents every assumption explicitly in
``docs/diffq_format.md``; the encoder half produces the same layout, and the
round-trip is golden-tested (tests/test_diffq.py).

Container layout (diffq BaseQuantizer.get_quantized_state):

    state = {
        "__quantized": True,
        "quantized": [entry, ...],   # one entry per LARGE param, in order
        "others":    [tensor, ...],  # small params stored verbatim (fp32)
        "float16":   [tensor, ...],  # small params when float16=True
        "meta": {"klass": <quantizer class>, "init_kwargs": {...}},
    }

Crucially the lists carry NO parameter names: diffq re-walks the target
model's modules in registration order and zips. We reproduce that walk from
our own param pytrees (whose flattened dotted names match the torch
state_dict exactly) via :func:`param_order`, partitioning by the ``min_size``
threshold from ``meta.init_kwargs`` — the published mdx recipes use
``DiffQuantizer(model, min_size=0.2, group_size=8)``
(``/root/reference/conf/config.yaml:285-288``, ``demucs/grids/mdx.py:32``).

Per-entry decode (group-wise uniform quantization over the group's
[min, max] range, the DiffQ paper's quantizer):

    entry = (levels, scales, bits)   # DiffQuantizer: learned bits per group
    entry = (levels, scales)         # UniformQuantizer: fixed init_kwargs bits
    w  ≈  levels / (2**bits - 1) * (max - min) + min      per group of
                                                          ``group_size`` values

The decoder detects the scale layout structurally: two values per group
(packed last-axis pair or a (min, max) tuple) -> affine range decode; a single
value with SIGNED levels -> symmetric max-abs decode
(``w ≈ levels * scale / (2**(bits-1) - 1)``). Anything else raises with a
pointer to the format doc rather than mis-decoding.
"""

from __future__ import annotations

import fnmatch
import typing as tp

import numpy as np

__all__ = ["param_order", "dequantize_state", "quantize_state", "MIN_SIZE_MB",
           "GROUP_SIZE"]

MIN_SIZE_MB = 0.2   # conf/config.yaml:287
GROUP_SIZE = 8      # conf/config.yaml:288


def _init_params(kind: str, cfg) -> dict:
    if kind == "htdemucs":
        from demucs_tpu.models import htdemucs as m

        return m.init_htdemucs(cfg, seed=0)
    if kind == "hdemucs":
        from demucs_tpu.models import hdemucs as m

        return m.init_hdemucs(cfg, seed=0)
    if kind == "demucs":
        from demucs_tpu.models import demucs as m

        return m.init_demucs(cfg, seed=0)
    raise ValueError(f"unknown model kind {kind!r}")


# Top-level submodule registration order per model family, read from the
# reference constructors (nn.Module registers at FIRST module-valued
# assignment): htdemucs.py:244-418, hdemucs.py:479-582, demucs.py:308-309.
_GROUP_ORDER = {
    "htdemucs": ["encoder", "decoder", "tencoder", "tdecoder", "freq_emb",
                 "channel_upsampler", "channel_downsampler",
                 "channel_upsampler_t", "channel_downsampler_t",
                 "crosstransformer"],
    "hdemucs": ["encoder", "decoder", "tencoder", "tdecoder", "freq_emb"],
    "demucs": ["encoder", "decoder", "lstm"],
}

# Second-level registration order where it differs from our pytree insertion
# order (reference transformer.py:582-605: position_embeddings, norm_in,
# norm_in_t, then the layer lists).
_SUBGROUP_ORDER = {
    "crosstransformer": ["position_embeddings", "norm_in", "norm_in_t",
                         "layers", "layers_t"],
}


def param_order(kind: str, cfg) -> tp.List[tp.Tuple[str, tp.Tuple[int, ...]]]:
    """``(name, shape)`` for every parameter, in torch ``named_parameters``
    registration order (golden-tested against the reference models in
    tests/test_diffq.py).

    Our pytrees carry the same dotted names but a different insertion order
    (e.g. our init emits tencoder right after encoder; Demucs v2's torch
    decoder is ascending despite being built innermost-first). Reconstruct
    torch order by a stable sort on (top-level registration rank, layer
    index) — within a layer the relative order already matches.
    """
    from demucs_tpu.zoo.torch_load import flatten_state

    flat = flatten_state(_init_params(kind, cfg))
    rank = {g: i for i, g in enumerate(_GROUP_ORDER[kind])}

    def key(name: str):
        parts = name.split(".")
        k = [rank[parts[0]]]
        sub = _SUBGROUP_ORDER.get(parts[0])
        i = 1
        if sub is not None and len(parts) > 1:
            k.append(sub.index(parts[1]))
            i = 2
        k.append(int(parts[i]) if len(parts) > i and parts[i].isdigit() else -1)
        return tuple(k)

    names = sorted(flat, key=key)  # stable: within-layer order preserved
    return [(n, tuple(np.shape(flat[n]))) for n in names]


def _partition(order, min_size_mb: float, exclude: tp.Sequence[str] = ()):
    """Split params into (quantized, passthrough) name lists, mirroring
    diffq's walk: numel must STRICTLY exceed ``min_size_mb`` MB of fp32
    elements to be quantized; ``exclude`` patterns match the full dotted name
    or the leaf name."""
    min_params = int(min_size_mb * 2**20) // 4
    big, small = [], []
    for name, shape in order:
        leaf = name.rsplit(".", 1)[-1]
        excluded = any(
            fnmatch.fnmatch(name, pat) or fnmatch.fnmatch(leaf, pat)
            for pat in exclude)
        numel = int(np.prod(shape)) if shape else 1
        if numel <= min_params or excluded:
            small.append((name, shape))
        else:
            big.append((name, shape))
    return big, small


def _entry_bits(entry, init_kwargs) -> np.ndarray:
    if len(entry) == 3:
        return np.asarray(entry[2], dtype=np.float64)
    bits = init_kwargs.get("bits", 8)
    return np.asarray(float(bits))


def dequantize_entry(entry, shape, init_kwargs) -> np.ndarray:
    levels = np.asarray(entry[0])
    scales = entry[1]
    bits = _entry_bits(entry, init_kwargs)
    if bits.ndim == 1:
        bits = bits[:, None]
    lv = levels.astype(np.float64)

    if isinstance(scales, (tuple, list)) and len(scales) == 2:
        mn = np.asarray(scales[0], np.float64)
        mx = np.asarray(scales[1], np.float64)
        out = lv / (2.0**bits - 1.0) * (mx - mn) + mn
    else:
        sc = np.asarray(scales, np.float64)
        if sc.ndim >= 2 and sc.shape[-1] == 2 and levels.shape[-1] != 2:
            mn, mx = sc[..., :1], sc[..., 1:]
            out = lv / (2.0**bits - 1.0) * (mx - mn) + mn
        elif np.issubdtype(levels.dtype, np.signedinteger):
            # symmetric max-abs variant: scale is the group |max|
            out = lv * sc / (2.0 ** (bits - 1.0) - 1.0)
        else:
            raise NotImplementedError(
                "unrecognized diffq entry layout "
                f"(levels {levels.dtype}{levels.shape}, scales "
                f"{getattr(sc, 'dtype', type(scales))}{getattr(sc, 'shape', '')}); "
                "see docs/diffq_format.md for the layouts this decoder "
                "understands and file the actual layout there")
    return out.astype(np.float32).reshape(shape)


def dequantize_state(state: dict, kind: str, cfg) -> tp.Dict[str, np.ndarray]:
    """``__quantized`` state -> flat ``name -> fp32 ndarray`` dict."""
    meta = state.get("meta") or {}
    init_kwargs = dict(meta.get("init_kwargs") or {})
    init_kwargs.pop("model", None)
    min_size = float(init_kwargs.get("min_size", MIN_SIZE_MB))
    exclude = tuple(init_kwargs.get("exclude") or ())
    use_fp16 = bool(init_kwargs.get("float16", False))

    order = param_order(kind, cfg)
    big, small = _partition(order, min_size, exclude)

    quantized = list(state.get("quantized") or ())
    passthrough = list(state.get("float16" if use_fp16 else "others") or ())
    if len(quantized) != len(big) or len(passthrough) != len(small):
        raise ValueError(
            f"diffq state does not line up with the {kind} parameter walk: "
            f"{len(quantized)} quantized entries for {len(big)} large params, "
            f"{len(passthrough)} passthrough for {len(small)} small params "
            f"(min_size={min_size} MB). See docs/diffq_format.md.")

    flat: tp.Dict[str, np.ndarray] = {}
    for (name, shape), entry in zip(big, quantized):
        flat[name] = dequantize_entry(entry, shape, init_kwargs)
    for (name, shape), tensor in zip(small, passthrough):
        arr = np.asarray(tensor)
        if arr.shape != shape:
            raise ValueError(
                f"passthrough tensor shape {arr.shape} != expected {shape} "
                f"for {name}")
        flat[name] = arr.astype(np.float32)
    return flat


def quantize_entry(arr: np.ndarray, group_size: int,
                   bits: tp.Union[int, np.ndarray]):
    """Group-wise uniform [min, max]-range quantization (encoder half of
    :func:`dequantize_entry`'s affine layout): levels uint8 (bits<=8) or
    int16, scales fp32 ``(G, 2) = [min, max]``, bits uint8 per group.
    ``bits`` may be a scalar or a per-group array (DiffQ learned depths)."""
    if group_size == 2:
        # levels of shape (G, 2) are indistinguishable from the decoder's
        # packed [min, max] scales layout (dequantize_entry's structural
        # detection) — refuse to emit an ambiguous container.
        raise ValueError("group_size=2 produces an ambiguous container "
                         "layout; use group_size >= 3 (default 8)")
    raw_bits = np.asarray(bits)
    if raw_bits.max() > 15 or raw_bits.min() < 1:
        # int16 level storage holds at most 2**15-1 levels; silent wraparound
        # (at the uint8 cast or the int16 levels) would decode to garbage
        # weights with no error anywhere.
        raise ValueError(f"bits must be in [1, 15], got {bits}")
    flat = arr.reshape(-1, group_size) if group_size else arr.reshape(1, -1)
    bits_arr = np.broadcast_to(raw_bits.astype(np.uint8),
                               (flat.shape[0],)).copy()
    nlev = (2.0 ** bits_arr.astype(np.float64) - 1.0)[:, None]
    mn = flat.min(axis=-1, keepdims=True)
    mx = flat.max(axis=-1, keepdims=True)
    span = np.where(mx > mn, mx - mn, 1.0)
    levels = np.round((flat - mn) / span * nlev)
    levels = levels.astype(np.uint8 if bits_arr.max() <= 8 else np.int16)
    scales = np.concatenate([mn, mx], axis=-1).astype(np.float32)
    return levels, scales, bits_arr


def quantize_state(flat_state: tp.Mapping[str, np.ndarray], kind: str, cfg, *,
                   min_size_mb: float = MIN_SIZE_MB,
                   group_size: int = GROUP_SIZE, bits: int = 8) -> dict:
    """Produce a ``__quantized`` state in the container layout above from a
    flat fp32 state dict. Used for round-trip format tests and for shipping
    our own quantized ``.dmx``/``.th``-style exports."""
    order = param_order(kind, cfg)
    big, small = _partition(order, min_size_mb)
    quantized = []
    for name, shape in big:
        arr = np.asarray(flat_state[name], np.float32)
        if group_size and arr.size % group_size:
            raise ValueError(
                f"{name}: numel {arr.size} not divisible by group_size "
                f"{group_size}")
        quantized.append(quantize_entry(arr, group_size, bits))
    others = [np.asarray(flat_state[name], np.float32) for name, _ in small]
    return {
        "__quantized": True,
        "quantized": quantized,
        "others": others,
        "float16": [],
        "meta": {
            "klass": "DiffQuantizer",
            "init_kwargs": {"min_size": min_size_mb, "group_size": group_size},
        },
    }
