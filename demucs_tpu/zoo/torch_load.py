"""Bridge from the reference's serialized checkpoints to our param pytrees.

The reference's deploy format (``demucs/states.py:121-132``) is a torch pickle
``{klass, args, kwargs, state, training_args}`` where ``state`` is a flat
``name -> tensor`` dict (fp16 on released models). Our param pytrees
deliberately mirror those dotted paths (numeric components become int dict
keys), so conversion is a pure re-nesting + fp32 promotion — no per-layer
rename tables.

This module does NOT require torch unless you load an actual ``.th`` file; the
re-nesting works on any ``name -> ndarray`` mapping.
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp
import numpy as np

__all__ = ["nest_state", "flatten_state", "load_th_model", "config_from_torch_kwargs"]


def nest_state(state: tp.Mapping[str, tp.Any], dtype=jnp.float32) -> dict:
    """``{"encoder.0.conv.weight": t, ...} -> {"encoder": {0: {"conv": {...}}}}``.

    Values are converted to jnp arrays; float16/float64 promote to ``dtype``
    (released zoo weights are fp16 — the reference computes in fp32 after
    load).
    """
    out: dict = {}
    for name, value in state.items():
        arr = np.asarray(value)
        if arr.dtype in (np.float16, np.float64):
            arr = arr.astype(np.float32)
        parts: list = [int(p) if p.isdigit() else p for p in name.split(".")]
        node = out
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(arr, dtype=dtype if arr.dtype == np.float32 else None)
    return out


def flatten_state(params: dict, prefix: str = "") -> dict:
    """Inverse of :func:`nest_state` (for saving / diffing)."""
    flat: dict = {}
    for key, value in params.items():
        name = f"{prefix}.{key}" if prefix else str(key)
        if isinstance(value, dict):
            flat.update(flatten_state(value, name))
        else:
            flat[name] = value
    return flat


_MODEL_CLASS_NAMES = {"HTDemucs": "htdemucs", "HDemucs": "hdemucs", "Demucs": "demucs",
                      "WDemucs": "hdemucs"}


def config_from_torch_kwargs(klass_name: str, args: tuple, kwargs: dict):
    """Build our config dataclass from the reference's captured ctor args.

    Mirrors ``demucs/states.py:50-80`` including dropping kwargs unknown to the
    current signature.
    """
    import dataclasses

    from demucs_tpu.models import htdemucs as m_ht

    kind = _MODEL_CLASS_NAMES.get(klass_name)
    if kind == "htdemucs":
        cls = m_ht.HTDemucsConfig
    elif kind == "hdemucs":
        from demucs_tpu.models import hdemucs as m_h

        cls = m_h.HDemucsConfig
    elif kind == "demucs":
        from demucs_tpu.models import demucs as m_d

        cls = m_d.DemucsConfig
    else:
        raise ValueError(f"Unknown model class {klass_name!r}")

    fields = {f.name for f in dataclasses.fields(cls)}
    kw = dict(kwargs)
    if args:
        # capture_init stores positional ctor args in order; every model
        # family's signature starts (sources, audio_channels, channels, ...)
        # — map what we know, refuse to silently drop the rest
        positional = ("sources", "audio_channels", "channels")
        if len(args) > len(positional):
            raise ValueError(
                f"checkpoint has {len(args)} positional init args; only "
                f"{positional} are mapped — extend the mapping")
        for name, value in zip(positional, args):
            kw[name] = value
    clean = {}
    for key, value in kw.items():
        if key not in fields:
            continue
        if isinstance(value, list):
            value = tuple(value)
        if key == "segment":
            value = float(value)
        clean[key] = value
    if "sources" in clean:
        clean["sources"] = tuple(clean["sources"])
    return cls(**clean), kind


def load_th_model(path) -> tp.Tuple[tp.Any, str, dict]:
    """Load a reference ``.th`` package -> (config, kind, params pytree).

    HERMETIC: parses the torch zip container + pickle stream directly
    (:mod:`demucs_tpu.zoo.thpickle`) — no torch import, no ``demucs`` package
    import, no code execution from the (downloaded, untrusted) file. The
    pickled model class global resolves to an inert name stub; tensors come
    back as numpy. Format spec: ``demucs/states.py:50-132``.

    diffq-quantized states (``__quantized``) are dequantized via
    :mod:`demucs_tpu.zoo.diffq`.
    """
    from demucs_tpu.zoo.thpickle import read_th

    pkg = read_th(path)
    state = pkg["state"]
    klass = pkg["klass"]
    klass_name = klass if isinstance(klass, str) else klass.__name__
    cfg, kind = config_from_torch_kwargs(klass_name, pkg.get("args", ()), pkg.get("kwargs", {}))
    if state.get("__quantized"):
        from demucs_tpu.zoo.diffq import dequantize_state

        flat = dequantize_state(state, kind, cfg)
    else:
        flat = {k: np.asarray(v) for k, v in state.items()}
    if kind == "demucs":
        flat = _demucs_v2_rename_shim(flat, cfg.depth)
    params = nest_state(flat)
    return cfg, kind, params


def _demucs_v2_rename_shim(state: dict, depth: int) -> dict:
    """Previous-generation Demucs models stored the rewrite conv at Sequential
    index 2; current models at 3 (demucs.py:438-447)."""
    state = dict(state)
    for idx in range(depth):
        for a in ("encoder", "decoder"):
            for b in ("bias", "weight"):
                new = f"{a}.{idx}.3.{b}"
                old = f"{a}.{idx}.2.{b}"
                if old in state and new not in state:
                    state[new] = state.pop(old)
    return state
