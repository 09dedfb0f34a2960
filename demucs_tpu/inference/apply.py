"""Separation engine: segment-batched overlap-add inference.

Behavioral reference: ``demucs/apply.py:145-322`` — same three nested modes
(bag ensemble, random-shift trick, overlap-add split) and identical numerics,
but re-architected for TPU:

- The reference runs one host thread per segment, each issuing a single-item
  forward (apply.py:278-287). Here all segments of a track are stacked into
  ``(batch, C, L_seg)`` arrays and driven through ONE jitted forward per
  batch; JAX's async dispatch pipelines host↔device transfers with compute.
- Chunk extraction replicates ``TensorChunk.padded`` (apply.py:108-124):
  centered windows that draw *real* neighboring audio from the padded track
  and zero-pad only beyond its bounds.
- The triangular transition window and weight normalization are identical
  (apply.py:269-299); accumulation happens host-side in fp32.

Randomness for the shift trick uses an explicit ``random.Random`` so parity
tests can pin the exact reference sequence.
"""

from __future__ import annotations

import random as _random
import typing as tp

import numpy as np

from demucs_tpu.models.registry import AnyModel, BagOfModels, Model

__all__ = ["apply_model", "apply_model_tracks"]


def _accelerator_backend() -> bool:
    """True when computations will land on an accelerator by default
    (shared resolution with ``parallel.sharded.auto_mesh`` so engine and
    mesh auto-selection can never disagree)."""
    try:
        from demucs_tpu.parallel.sharded import default_platform

        return default_platform() != "cpu"
    except RuntimeError:
        return False


class Chunk:
    """Zero-copy (array, offset, length) view — TensorChunk (apply.py:82-124)."""

    def __init__(self, array, offset: int = 0, length: tp.Optional[int] = None):
        if isinstance(array, Chunk):
            base, offset = array.base, array.offset + offset
            total = array.length + array.offset
        else:
            base, total = array, array.shape[-1]
        assert 0 <= offset < total
        if length is None:
            length = total - offset
        else:
            length = min(total - offset, length)
        self.base = base
        self.offset = offset
        self.length = length

    @property
    def shape(self):
        shape = list(self.base.shape)
        shape[-1] = self.length
        return tuple(shape)

    def padded(self, target_length: int) -> np.ndarray:
        delta = target_length - self.length
        total = self.base.shape[-1]
        assert delta >= 0, (target_length, self.length)
        start = self.offset - delta // 2
        end = start + target_length
        correct_start = max(0, start)
        correct_end = min(total, end)
        pad_left = correct_start - start
        pad_right = end - correct_end
        out = np.pad(
            self.base[..., correct_start:correct_end],
            [(0, 0)] * (self.base.ndim - 1) + [(pad_left, pad_right)],
        )
        assert out.shape[-1] == target_length
        return out


def center_trim(arr: np.ndarray, length: int) -> np.ndarray:
    delta = arr.shape[-1] - length
    if delta < 0:
        raise ValueError(f"arr must be longer than {length}")
    if delta:
        arr = arr[..., delta // 2 : -(delta - delta // 2)]
    return arr


def _triangle_weight(segment_length: int, transition_power: float) -> np.ndarray:
    # apply.py:271-276
    weight = np.concatenate(
        [
            np.arange(1, segment_length // 2 + 1, dtype=np.float32),
            np.arange(segment_length - segment_length // 2, 0, -1, dtype=np.float32),
        ]
    )
    assert len(weight) == segment_length
    return (weight / weight.max()) ** transition_power


def _run_batched(
    model: Model,
    chunks: tp.Sequence[Chunk],
    target_length: int,
    batch_size: int,
    on_chunk: tp.Optional[tp.Callable[[int, str], None]] = None,
) -> tp.List[np.ndarray]:
    """Forward all chunks (padded to ``target_length``) through the jitted model.

    Chunks with batch dim B each produce ``(B, S, C, chunk_length)``; batches
    are dispatched asynchronously and gathered in order.
    """
    import jax.numpy as jnp

    fwd = model.forward_fn()
    inputs = [c.padded(target_length) for c in chunks]
    outputs_dev = []
    results: tp.List[np.ndarray] = []

    def collect(out, n_valid, item_b, i, n_group):
        arr = np.asarray(out)[:n_valid]
        for j in range(n_group):
            chunk_out = arr[j * item_b : (j + 1) * item_b]
            results.append(center_trim(chunk_out, chunks[i + j].length))
            if on_chunk is not None:
                on_chunk(i + j, "end")

    for i in range(0, len(inputs), batch_size):
        group = inputs[i : i + batch_size]
        # Flatten track-batch into the segment batch; pad to a fixed batch
        # size so every batch reuses one compiled executable.
        stacked = np.concatenate(group, axis=0)
        n_valid = stacked.shape[0]
        item_b = group[0].shape[0]
        full = batch_size * item_b
        if stacked.shape[0] < full:
            stacked = np.pad(stacked, [(0, full - n_valid)] + [(0, 0)] * (stacked.ndim - 1))
        if on_chunk is not None:
            for j in range(i, i + len(group)):
                on_chunk(j, "start")
        out = fwd(model.params, jnp.asarray(stacked))
        if on_chunk is not None:
            # Callback runs get reference event cadence (every started
            # chunk's "end" fires before the next batch's "start",
            # apply.py:278-320) at the cost of batch-level pipelining.
            collect(out, n_valid, item_b, i, len(group))
        else:
            outputs_dev.append((out, n_valid, item_b, i, len(group)))
    for pending in outputs_dev:
        collect(*pending)
    return results


def apply_model(
    model: AnyModel,
    mix: tp.Union[np.ndarray, Chunk],
    shifts: int = 1,
    split: bool = True,
    overlap: float = 0.25,
    transition_power: float = 1.0,
    progress: bool = False,
    device=None,
    num_workers: int = 0,
    segment: tp.Optional[float] = None,
    pool=None,
    lock=None,
    callback: tp.Optional[tp.Callable[[dict], None]] = None,
    callback_arg: tp.Optional[dict] = None,
    rng: tp.Optional[_random.Random] = None,
    batch_size: int = 16,
    engine: str = "auto",
    transfer_dtype: tp.Optional[str] = None,
    length_bucket_seconds: tp.Optional[float] = None,
    tail_mode: str = "exact",
    bag_mode: str = "auto",
    shift_offsets: tp.Optional[tp.Sequence[int]] = None,
) -> np.ndarray:
    """Apply ``model`` to ``mix (B, C, L)`` -> ``(B, S, C, L)``.

    Flag surface and semantics match ``demucs/apply.py:145-173``; ``device``,
    ``num_workers``, ``pool`` and ``lock`` are accepted for API compatibility
    (placement is JAX-managed, parallelism comes from segment batching).

    ``engine``: "host" = per-batch round trips mirroring the reference's
    orchestration; "device" = fully device-resident overlap-add with ONE fetch
    per track (demucs_tpu.inference.engine); "auto" picks the device engine on
    accelerator backends when semantics allow (split mode, single track, no
    per-chunk callback, HTDemucs-family uniform padding targets).
    ``transfer_dtype`` applies to the device engine's single final fetch. The
    default (None) is BIT-EXACT on every backend — reduced-precision wires
    ("float16"/"int16"/"int8", all well below PCM16 error) are opt-in, as in
    the CLI's ``--wire auto``.

    All three kinds run bit-exactly on the device engine: uniform-target
    models (HTDemucs with ``use_train_segment`` or an explicit ``segment``)
    as one program per (model, shift); length-dependent-target kinds
    (demucs v2's ``valid_length``, hdemucs, htdemucs without train segment —
    reference apply.py:302-309) additionally re-run each ragged tail chunk
    at its exact per-length leaf target (one small extra executable per
    distinct tail target — the same compile granularity the host engine
    pays for its tail-target batch groups). ``bag_mode`` controls the
    device engine's homogeneous-bag strategy on one device: "auto"
    (default) runs all members + shift passes as ONE stacked-member
    program (a lax.scan over the stacked params — measured +7% forward
    rate over the sequential dispatches at 1-member memory; ~1.5e-8 CPU /
    ~5e-5 TPU deviation vs the sequential member loop, because XLA conv
    lowering is program-context-dependent); "sequential" forces the
    reference-style member loop.
    ``tail_mode="uniform"`` trades
    that exactness for a single executable (tail chunks see slightly more
    real context; full chunks stay bit-exact) — for throughput-critical
    serving of segment-44 bags where random shifts would otherwise compile
    per track.
    """
    if engine not in ("auto", "host", "device"):
        raise ValueError(f"unknown engine {engine!r}")
    if shift_offsets is not None:
        # Serving warm path (prewarm.py): every shift draw comes from the
        # pinned set, in order, instead of random — the engines run the same
        # exact-tails numerics for it, but the tail executable set becomes
        # bounded and prewarmable.
        from demucs_tpu.inference.prewarm import PinnedShifts

        if rng is not None:
            raise ValueError("pass either rng or shift_offsets, not both")
        rng = PinnedShifts(shift_offsets)
    if engine != "host":
        mix_arr = mix if isinstance(mix, np.ndarray) else None
        kinds = ([m.kind for m in model.models] if isinstance(model, BagOfModels)
                 else [model.kind])
        base_ok = (
            split
            and callback is None
            and mix_arr is not None
            and mix_arr.ndim == 3
            and mix_arr.shape[0] == 1
        )
        device_ok = base_ok and all(
            k in ("htdemucs", "hdemucs", "demucs") for k in kinds)
        if engine == "device" or (device_ok and _accelerator_backend()):
            if not device_ok:
                raise ValueError(
                    "engine='device' requires split mode, a single (1, C, L) "
                    "track, no callback, and htdemucs/hdemucs/demucs models"
                )
            if not transition_power >= 1:
                raise AssertionError(
                    "transition_power < 1 leads to weird behavior.")
            from demucs_tpu.inference.engine import device_apply_model
            from demucs_tpu.parallel.sharded import auto_mesh

            return device_apply_model(
                model, mix_arr,
                shifts=shifts, overlap=overlap, transition_power=transition_power,
                segment=segment, batch_size=batch_size, rng=rng,
                transfer_dtype=transfer_dtype, progress=progress,
                length_bucket_seconds=length_bucket_seconds,
                tail_mode=tail_mode, bag_mode=bag_mode,
                mesh=auto_mesh(),
            )
    if rng is None:
        rng = _random  # module acts as a Random instance (reference parity)
    callback_arg = dict(callback_arg or {})
    callback_arg.setdefault("model_idx_in_bag", 0)
    callback_arg.setdefault("shift_idx", 0)
    callback_arg.setdefault("segment_offset", 0)

    if isinstance(mix, np.ndarray):
        mix = Chunk(mix.astype(np.float32, copy=False))

    kwargs = dict(
        shifts=shifts,
        split=split,
        overlap=overlap,
        transition_power=transition_power,
        progress=progress,
        segment=segment,
        rng=rng,
        batch_size=batch_size,
        callback=callback,
    )

    if isinstance(model, BagOfModels):
        # apply.py:201-229 — fresh random shifts per sub-model.
        estimates = 0.0
        totals = [0.0] * len(model.sources)
        callback_arg["models"] = len(model.models)
        for idx, (sub_model, model_weights) in enumerate(zip(model.models, model.weights)):
            sub_cb = dict(callback_arg)
            sub_cb["model_idx_in_bag"] = idx
            out = apply_model(sub_model, mix, callback_arg=sub_cb, **kwargs)
            for k, inst_weight in enumerate(model_weights):
                out[:, k] *= inst_weight
                totals[k] += inst_weight
            estimates = estimates + out
        assert isinstance(estimates, np.ndarray)
        for k in range(estimates.shape[1]):
            estimates[:, k] /= totals[k]
        return estimates

    assert isinstance(model, Model)
    callback_arg.setdefault("models", 1)
    assert transition_power >= 1, "transition_power < 1 leads to weird behavior."
    batch, channels, length = mix.shape

    if shifts:
        # apply.py:237-256
        kwargs["shifts"] = 0
        max_shift = int(0.5 * model.samplerate)
        padded_mix = Chunk(mix.padded(length + 2 * max_shift))
        out = 0.0
        for shift_idx in range(shifts):
            offset = rng.randint(0, max_shift)
            shifted = Chunk(padded_mix, offset, length + max_shift - offset)
            sub_cb = dict(callback_arg)
            sub_cb["shift_idx"] = shift_idx
            res = apply_model(model, shifted, callback_arg=sub_cb, **kwargs)
            out = out + res[..., max_shift - offset :]
        out /= shifts
        assert isinstance(out, np.ndarray)
        return out

    if split:
        # apply.py:257-301, batched.
        kwargs["split"] = False
        out = np.zeros((batch, len(model.sources), channels, length), dtype=np.float32)
        sum_weight = np.zeros(length, dtype=np.float32)
        if segment is None:
            segment_f = model.segment
        else:
            segment_f = segment
        assert segment_f is not None and segment_f > 0.0
        segment_length = int(model.samplerate * segment_f)
        stride = int((1 - overlap) * segment_length)
        offsets = list(range(0, length, stride))
        weight = _triangle_weight(segment_length, transition_power)

        chunks = [Chunk(mix, offset, segment_length) for offset in offsets]
        groups: tp.Dict[int, tp.List[int]] = {}
        targets = []
        for chunk in chunks:
            target = model.leaf_target(chunk.length, segment)
            targets.append(target)
            groups.setdefault(target, []).append(len(targets) - 1)

        chunk_outs: tp.List[tp.Optional[np.ndarray]] = [None] * len(chunks)

        bar = None
        if progress:
            import tqdm

            # per-chunk progress in audio seconds (reference apply.py:286-287)
            scale = float(format(stride / model.samplerate, ".2f"))
            bar = tqdm.tqdm(total=len(chunks), unit_scale=scale, ncols=120,
                            unit="seconds")

        def on_chunk_factory(indices):
            def on_chunk(group_pos: int, state: str):
                if state == "end" and bar is not None:
                    bar.update(1)
                if callback is not None:
                    cb = dict(callback_arg)
                    cb["segment_offset"] = offsets[indices[group_pos]]
                    cb["state"] = state
                    callback(cb)

            return on_chunk

        for target, indices in groups.items():
            results = _run_batched(
                model,
                [chunks[i] for i in indices],
                target,
                batch_size,
                on_chunk_factory(indices),
            )
            for i, res in zip(indices, results):
                chunk_outs[i] = res
        if bar is not None:
            bar.close()

        for offset, chunk, chunk_out in zip(offsets, chunks, chunk_outs):
            assert chunk_out is not None
            chunk_length = chunk_out.shape[-1]
            out[..., offset : offset + segment_length] += weight[:chunk_length] * chunk_out
            sum_weight[offset : offset + segment_length] += weight[:chunk_length]
        assert sum_weight.min() > 0
        out /= sum_weight
        return out

    # Leaf (apply.py:302-322), single chunk.
    target = model.leaf_target(length, segment)
    if callback is not None:
        callback(dict(callback_arg, state="start"))
    [res] = _run_batched(model, [Chunk(mix, 0, length)], target, 1)
    if callback is not None:
        callback(dict(callback_arg, state="end"))
    return res


def apply_model_tracks(
    model: AnyModel,
    tracks: tp.Iterable[np.ndarray],
    *,
    shifts: int = 1,
    split: bool = True,
    overlap: float = 0.25,
    transition_power: float = 1.0,
    progress: bool = False,
    segment: tp.Optional[float] = None,
    rng: tp.Optional[_random.Random] = None,
    batch_size: int = 16,
    engine: str = "auto",
    transfer_dtype: tp.Optional[str] = None,
    length_bucket_seconds: tp.Optional[float] = None,
    tail_mode: str = "exact",
    bag_mode: str = "auto",
    shift_offsets: tp.Optional[tp.Sequence[int]] = None,
) -> tp.Iterator[np.ndarray]:
    """Pipelined multi-track ``apply_model``: yields ``(1, S, C, L)`` stems per
    input track ``(1, C, L)``, in order.

    On the device engine, each track's device->host stems fetch overlaps the
    next track's compute (the reference separates tracks strictly serially;
    on this deployment's slow host link the fetch is a large fixed cost —
    see demucs_tpu.inference.engine.device_separate_tracks). Falls back to
    per-track ``apply_model`` when the device engine isn't eligible. Set
    ``length_bucket_seconds`` so variable-length tracks share executables.
    """
    kinds = ([m.kind for m in model.models] if isinstance(model, BagOfModels)
             else [model.kind])
    device_ok = split and all(k in ("htdemucs", "hdemucs", "demucs") for k in kinds)
    use_device = engine == "device" or (
        engine == "auto" and device_ok and _accelerator_backend())

    def _checked(items):
        for mix in items:
            mix = np.asarray(mix)
            if mix.ndim != 3 or mix.shape[0] != 1 or mix.dtype.kind != "f":
                raise ValueError(
                    "apply_model_tracks expects float (1, C, L) tracks, got "
                    f"shape {mix.shape} dtype {mix.dtype}; use apply_model "
                    "for batched input")
            yield mix

    tracks = _checked(tracks)
    if shift_offsets is not None:
        # One pinned source shared across tracks, reset as each track is
        # pulled (the engine dispatches a track's passes — consuming its
        # offsets — before pulling the next), so EVERY track consumes the
        # same offsets from the start of the set.
        from demucs_tpu.inference.prewarm import PinnedShifts

        if rng is not None:
            raise ValueError("pass either rng or shift_offsets, not both")
        rng = PinnedShifts(shift_offsets)

        def _resetting(items, pinned=rng):
            for mix in items:
                pinned.reset()
                yield mix

        tracks = _resetting(tracks)
    if use_device:
        if not device_ok:
            raise ValueError(
                "engine='device' requires split mode and htdemucs/hdemucs/"
                "demucs models")
        from demucs_tpu.inference.engine import device_separate_tracks
        from demucs_tpu.parallel.sharded import auto_mesh

        yield from device_separate_tracks(
            model, tracks, shifts=shifts, overlap=overlap,
            transition_power=transition_power, segment=segment,
            batch_size=batch_size, rng=rng, transfer_dtype=transfer_dtype,
            progress=progress, length_bucket_seconds=length_bucket_seconds,
            tail_mode=tail_mode, bag_mode=bag_mode, mesh=auto_mesh())
        return
    for mix in tracks:
        yield apply_model(
            model, mix, shifts=shifts, split=split, overlap=overlap,
            transition_power=transition_power, progress=progress,
            segment=segment, rng=rng, batch_size=batch_size, engine=engine,
            transfer_dtype=transfer_dtype,
            length_bucket_seconds=length_bucket_seconds,
            tail_mode=tail_mode, bag_mode=bag_mode)
