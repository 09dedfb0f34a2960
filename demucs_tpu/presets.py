"""The one definition of the ``fast`` serving preset.

Shared by the CLI (separate.py), the HTTP server (serve.py), and bench.py so
the preset's contents, its explicit-flag-wins rule, and its printed quality
contract cannot drift apart. Measured contract: BENCHMARKS.md "Quality vs
wire format" (bf16 compute ~47 dB SER, int8 wire ~44 dB SNR vs the default
bit-exact path — preview/monitoring grade, above PCM16 archival floor only
for the bf16 half)."""

from __future__ import annotations

import typing as tp

FAST_COMPUTE_DTYPE = "bfloat16"
FAST_WIRE = "int8"
FAST_CONTRACT = ("~47 dB SER (bf16 compute) / ~44 dB SNR (int8 wire) vs the "
                 "default path")


def resolve_fast_preset(
    preset: str, wire: tp.Optional[str]
) -> tp.Tuple[tp.Optional[str], tp.Optional[str], tp.Optional[str]]:
    """-> (compute_dtype, wire, banner).

    ``wire`` is the user's stems-wire choice with ``None``/``"auto"`` meaning
    "not explicitly set" — an explicit wire always wins over the preset, and
    the banner states the wire actually in effect."""
    if preset != "fast":
        return None, wire, None
    explicit = wire not in (None, "auto")
    wire_out = wire if explicit else FAST_WIRE
    banner = (f"preset fast: {FAST_COMPUTE_DTYPE} compute + {wire_out} stems "
              f"wire — {FAST_CONTRACT}"
              + (" (explicit --wire override in effect)" if explicit else "")
              + " (preview grade; see BENCHMARKS.md)")
    return FAST_COMPUTE_DTYPE, wire_out, banner
