"""Serving warm path: pinned shift-offset sets + executable prewarming.

The shift trick draws ``offset = randint(0, max_shift)`` per pass
(reference semantics: ``demucs/apply.py:237-256``). For length-dependent-
target kinds (demucs v2, hdemucs, htdemucs without train segment) the
ragged tail chunk shapes follow that offset, so serving with random shifts
compiles+loads new tail executables on unseen offsets — measured ~75 s
first-load each through this deployment's relay (BENCHMARKS.md zoo notes),
i.e. a first request can stall minutes while warm repeats take ~2 s.

Two pieces close that cliff without touching numerics:

- ``PinnedShifts`` / the ``shift_offsets`` parameter on ``apply_model`` /
  ``Separator`` / ``serve.py``: a fixed offset set consumed in order
  instead of random draws. A pinned offset is just a specific draw — the
  engine still runs the reference exact-tails path for it.
- ``prewarm()``: runs silent tracks of the expected lengths through the
  configured engine path, consuming EVERY pinned offset, so all pass/tail/
  normalize/wire executables compile and load before traffic.

Executable-count bound per (model, track-length bucket): 1 main pass
(uniform kinds) or 1 full pass + 1 normalize + at most
``ceil(segment_length / stride)`` tail programs per distinct pinned offset
(exact kinds), plus one final wire program per (wire dtype, length) and one
upload/prep program per (padded geometry). With K pinned offsets the tail
programs are <= K * ceil(segment/stride) per model per bucket — bounded and
enumerable, vs unbounded under random shifts.
"""

from __future__ import annotations

import time
import typing as tp

import numpy as np

__all__ = ["PinnedShifts", "prewarm"]


class PinnedShifts:
    """``random.Random``-compatible shift-offset source cycling a pinned set.

    Pass as ``rng`` to ``apply_model`` / ``device_apply_model`` (or set
    ``shift_offsets`` on those entry points / on ``Separator``): every
    ``randint(0, max_shift)`` call returns the next pinned offset in order.
    ``reset()`` restarts the sequence — the track loops call it per track so
    every track consumes the same offsets.
    """

    def __init__(self, offsets: tp.Sequence[int]):
        offs = tuple(int(o) for o in offsets)
        if not offs:
            raise ValueError("shift_offsets must be a non-empty sequence")
        if any(o < 0 for o in offs):
            raise ValueError(f"shift offsets must be >= 0, got {offs}")
        self.offsets = offs
        self._i = 0

    def reset(self) -> None:
        self._i = 0

    def randint(self, a: int, b: int) -> int:
        off = self.offsets[self._i % len(self.offsets)]
        self._i += 1
        if not a <= off <= b:
            raise ValueError(
                f"pinned shift offset {off} outside the engine's draw range "
                f"[{a}, {b}] (max_shift = 0.5 s * samplerate)")
        return off


def prewarm(
    model,
    durations: tp.Union[float, tp.Sequence[float]],
    *,
    shifts: int = 1,
    shift_offsets: tp.Optional[tp.Sequence[int]] = None,
    overlap: float = 0.25,
    segment: tp.Optional[float] = None,
    batch_size: int = 16,
    engine: str = "auto",
    transfer_dtype: tp.Optional[str] = None,
    length_bucket_seconds: tp.Optional[float] = None,
    tail_mode: str = "exact",
    bag_mode: str = "auto",
    verbose: bool = False,
) -> tp.List[dict]:
    """Compile + load every executable the given serving configuration needs.

    Runs a silent track per requested duration through ``apply_model`` with
    the exact serving parameters, discarding the stems. With a pinned offset
    set, the warm run consumes EVERY offset (shift count is raised to cover
    the set), so the tail programs for each offset are built too. Returns a
    report: one dict per duration with the wall time (dominated by this
    deployment's ~25-300 s first executable loads; ~free when already warm).

    Without ``shift_offsets`` and with ``shifts > 0`` the offsets stay
    random, so tail executables for exact-tail kinds CANNOT be prewarmed —
    the report flags ``tails_warmed=False`` in that case (pin offsets, use
    ``tail_mode="uniform"``, or serve ``shifts=0`` to bound them).
    """
    from demucs_tpu.inference.apply import apply_model
    from demucs_tpu.models.registry import BagOfModels

    if isinstance(durations, (int, float)):
        durations = [float(durations)]
    first = model.models[0] if isinstance(model, BagOfModels) else model
    n_members = len(model.models) if isinstance(model, BagOfModels) else 1
    sr = first.samplerate
    C = first.audio_channels

    kinds = ([m.kind for m in model.models] if isinstance(model, BagOfModels)
             else [model.kind])
    exact_tail_kinds = tail_mode == "exact" and any(
        k != "htdemucs" or not (m.uses_train_segment or segment is not None)
        for k, m in zip(kinds, model.models if isinstance(model, BagOfModels)
                        else [model]))

    warm_shifts = shifts
    if shifts and shift_offsets and exact_tail_kinds:
        # one warm pass must consume the whole pinned set (serving consumes
        # shifts offsets per member per track, cycling from the start).
        # Uniform-target kinds skip this: their executables are offset-
        # independent, and raising the shift count would compile a DIFFERENT
        # stacked-bag program (keyed on n_passes) than serving uses.
        per_track = shifts * n_members
        need = max(per_track, len(shift_offsets))
        warm_shifts = -(-need // n_members)

    report = []
    for dur in sorted({float(d) for d in durations}):
        length = int(dur * sr)
        mix = np.zeros((1, C, length), np.float32)
        t0 = time.perf_counter()
        apply_model(
            model, mix, shifts=warm_shifts, split=True, overlap=overlap,
            segment=segment, batch_size=batch_size, engine=engine,
            transfer_dtype=transfer_dtype,
            length_bucket_seconds=length_bucket_seconds, tail_mode=tail_mode,
            bag_mode=bag_mode,
            shift_offsets=tuple(shift_offsets) if shift_offsets else None,
        )
        dt = time.perf_counter() - t0
        entry = {
            "seconds": dur,
            "samples": length,
            "warm_time_s": round(dt, 3),
            "shift_offsets": tuple(shift_offsets) if shift_offsets else None,
            # random shifts leave exact-tail executables cold (unbounded
            # offset space); everything else is warmed either way
            "tails_warmed": bool(shift_offsets) or not shifts
            or not exact_tail_kinds,
        }
        report.append(entry)
        if verbose:
            print(f"prewarm: {dur:.0f}s track warmed in {dt:.1f}s "
                  f"(offsets={entry['shift_offsets']}, "
                  f"tails_warmed={entry['tails_warmed']})", flush=True)
    return report
