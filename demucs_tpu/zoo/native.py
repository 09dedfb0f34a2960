"""Native checkpoint format: ``.dmx`` = zip (npz) of flat params + JSON config.

Replaces the reference's torch-pickle deploy format (``demucs/states.py``) with
a torch-free container: loading requires only numpy/jax. ``save_with_checksum``
mirrors states.py:110-118 (8-hex sha256 suffix).
"""

from __future__ import annotations

import dataclasses
import hashlib
import io
import json
import typing as tp
import zipfile
from pathlib import Path

import numpy as np

from demucs_tpu.models.registry import Model
from demucs_tpu.zoo.torch_load import flatten_state, nest_state

_CONFIG_CLASSES = {
    "htdemucs": ("demucs_tpu.models.htdemucs", "HTDemucsConfig"),
    "hdemucs": ("demucs_tpu.models.hdemucs", "HDemucsConfig"),
    "demucs": ("demucs_tpu.models.demucs", "DemucsConfig"),
}


def serialize_model(model: Model, training_args: tp.Optional[dict] = None,
                    half: bool = True,
                    quantized_state: tp.Optional[dict] = None) -> bytes:
    """Model -> bytes of the .dmx container (fp16 weights by default, like the
    released zoo — states.py:121-132).

    ``quantized_state``: a ``__quantized`` container (train/quantize.py
    ``hard_quantized_state``) stored instead of the float params — the native
    analog of the reference's diffq-compressed releases (mdx_q)."""
    buf = io.BytesIO()
    meta = {
        "kind": model.kind,
        "config": dataclasses.asdict(model.cfg),
        "training_args": training_args or {},
        "format_version": 1,
    }
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        arrays = {}
        if quantized_state is not None:
            meta["quantized"] = {
                "meta": {k: v for k, v in quantized_state["meta"].items()},
                "n_entries": len(quantized_state["quantized"]),
                "n_others": len(quantized_state["others"]),
            }
            member = "quant.npz"
            for i, (levels, scales, bits) in enumerate(quantized_state["quantized"]):
                arrays[f"q{i}.levels"] = np.asarray(levels)
                arrays[f"q{i}.scales"] = np.asarray(scales)
                arrays[f"q{i}.bits"] = np.asarray(bits)
            for i, other in enumerate(quantized_state["others"]):
                arrays[f"o{i}"] = np.asarray(other)
        else:
            member = "params.npz"
            for name, value in flatten_state(model.params).items():
                arr = np.asarray(value)
                if half and arr.dtype == np.float32:
                    arr = arr.astype(np.float16)
                arrays[name] = arr
        zf.writestr("meta.json", json.dumps(meta))
        npz_buf = io.BytesIO()
        np.savez(npz_buf, **arrays)
        zf.writestr(member, npz_buf.getvalue())
    return buf.getvalue()


def save_model(model: Model, path, training_args: tp.Optional[dict] = None,
               half: bool = True) -> Path:
    path = Path(path)
    path.write_bytes(serialize_model(model, training_args, half))
    return path


def save_with_checksum(model: Model, path, training_args: tp.Optional[dict] = None,
                       half: bool = True) -> Path:
    """Save with an 8-hex sha256 suffix in the filename (states.py:110-118)."""
    content = serialize_model(model, training_args, half)
    sig = hashlib.sha256(content).hexdigest()[:8]
    path = Path(path)
    path = path.parent / (path.stem + "-" + sig + path.suffix)
    path.write_bytes(content)
    return path


def load_native_model(path) -> Model:
    import importlib

    with zipfile.ZipFile(path) as zf:
        meta = json.loads(zf.read("meta.json"))
        member = "quant.npz" if "quantized" in meta else "params.npz"
        with zf.open(member) as f:
            arrays = dict(np.load(io.BytesIO(f.read())))
    kind = meta["kind"]
    mod_name, cls_name = _CONFIG_CLASSES[kind]
    cls = getattr(importlib.import_module(mod_name), cls_name)
    cfg_dict = meta["config"]
    for key, value in list(cfg_dict.items()):
        if isinstance(value, list):
            cfg_dict[key] = tuple(tuple(v) if isinstance(v, list) else v for v in value)
    cfg = cls(**cfg_dict)
    if "quantized" in meta:
        from demucs_tpu.zoo.diffq import dequantize_state

        qmeta = meta["quantized"]
        state = {
            "__quantized": True,
            "quantized": [
                (arrays[f"q{i}.levels"], arrays[f"q{i}.scales"], arrays[f"q{i}.bits"])
                for i in range(qmeta["n_entries"])
            ],
            "others": [arrays[f"o{i}"] for i in range(qmeta["n_others"])],
            "meta": qmeta["meta"],
        }
        params = nest_state(dequantize_state(state, kind, cfg))
    else:
        params = nest_state(arrays)
    return Model(kind, cfg, params)
