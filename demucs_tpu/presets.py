"""The one definition of the serving presets (quality/speed ladder).

Shared by the CLI (separate.py), the HTTP server (serve.py) and bench.py so
each preset's contents, the explicit-flag-wins rule and the printed quality
contract cannot drift apart.

The ladder is set by the TPU MXU's pass-count algorithms for f32 operands
(measured at released width on v5e, tools/precision_sweep.py — SER vs the
true-fp32 forward; throughputs are raw batch-8 forward rates):

  preset     MXU policy                    SER vs fp32   forward rate
  fast       bf16 storage (1-pass)         ~56 dB        376 audio-s/s
  (default)  f32, XLA default = 1-pass     ~59 dB        275 audio-s/s
  balanced   f32, precision HIGH (3-pass)  ~82 dB        200 audio-s/s
  quality    f32, precision HIGHEST        bit-parity    167 audio-s/s
                                           w/ CPU/torch

Note the honest default: XLA lowers plain-f32 convs/dots on TPU to 1-pass
bf16 MXU passes, so the un-presetted accelerator path is itself ~59 dB vs
a true-fp32 reference — comparable to the reference project's own CUDA
default (TF32 tensor cores). "quality" is the bit-parity-grade opt-in;
"balanced" beats the default's accuracy while keeping ~73% of its speed.
"""

from __future__ import annotations

import typing as tp

FAST_COMPUTE_DTYPE = "bfloat16"
FAST_WIRE = "int8"
FAST_CONTRACT = ("bf16 MXU storage: ~56 dB SER vs true fp32 (the default "
                 "f32 path itself measures ~59 dB) + int8 stems wire "
                 "(~44 dB vs local signal)")

# preset -> (compute_dtype, matmul_precision, default wire, contract)
PRESETS: tp.Dict[str, tp.Tuple[tp.Optional[str], tp.Optional[str],
                               tp.Optional[str], str]] = {
    "fast": (FAST_COMPUTE_DTYPE, None, FAST_WIRE, FAST_CONTRACT),
    "balanced": (None, "tensorfloat32", None,
                 "precision HIGH (3-pass bf16 MXU): ~82 dB SER vs true fp32 "
                 "— more accurate than the f32 default (~59 dB) at ~73% of "
                 "its speed"),
    "quality": (None, "highest", "float32",
                "precision HIGHEST (6-pass MXU) + bit-exact wire: full fp32 "
                "numerics, bit-parity-grade vs the CPU/torch reference path "
                "(~61% of default throughput)"),
}


def resolve_preset(
    preset: str, wire: tp.Optional[str]
) -> tp.Tuple[tp.Optional[str], tp.Optional[str], tp.Optional[str],
              tp.Optional[str]]:
    """-> (compute_dtype, matmul_precision, wire, banner).

    ``wire`` is the user's stems-wire choice with ``None``/``"auto"`` meaning
    "not explicitly set" — an explicit wire always wins over the preset, and
    the banner states the wire actually in effect."""
    if preset in (None, "default"):
        return None, None, wire, None
    if preset not in PRESETS:
        raise ValueError(f"unknown preset {preset!r}")
    compute_dtype, matmul_precision, preset_wire, contract = PRESETS[preset]
    explicit = wire not in (None, "auto")
    wire_out = wire if explicit else (preset_wire if preset_wire else wire)
    banner = (f"preset {preset}: {contract}; stems wire: {wire_out}"
              + (" (explicit --wire override in effect)" if explicit else "")
              + " (see BENCHMARKS.md)")
    return compute_dtype, matmul_precision, wire_out, banner


def resolve_fast_preset(
    preset: str, wire: tp.Optional[str]
) -> tp.Tuple[tp.Optional[str], tp.Optional[str], tp.Optional[str]]:
    """Back-compat shim -> (compute_dtype, wire, banner)."""
    compute_dtype, _, wire_out, banner = resolve_preset(preset, wire)
    return compute_dtype, wire_out, banner
