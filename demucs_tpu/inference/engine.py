"""Device-resident separation engine.

The host-side engine in ``apply.py`` mirrors the reference's orchestration and
pays one device->host round trip per segment batch. On this TPU deployment the
host link is ~20-30 MB/s, so transfers — not compute — bound throughput
(tools/probe_d2h*.py). This engine keeps the whole track on device:

  upload track once ->
    [per bag-model, per shift]  ONE jitted program:
        extract all overlap segments (vmapped dynamic_slice, runtime shift
        offset — no recompile per random shift) ->
        batched forwards (lax.map over segment batches) ->
        triangular-weighted overlap-add + sum-weight normalization ->
        accumulate into a persistent device buffer (bag/shift averaging)
  -> ONE final fetch of the stems (optionally fp16/int16 over the wire).

Numerics are identical to apply.py / the reference: segment offsets, centered
TensorChunk padding (apply.py:108-124), triangular weights ^ transition_power
(apply.py:271-276), per-source bag weights and shift averaging — all expressed
with traced offset arithmetic so one executable serves every random shift.

Kinds whose leaf padding target depends on the chunk length (demucs v2's
``valid_length``, hdemucs, htdemucs without ``use_train_segment`` — reference
apply.py:302-309) additionally run each ragged tail chunk at its EXACT
per-length target through a small cached program (``_build_tail_fn``), making
the engine bit-exact for every chunk of every kind; ``tail_mode="uniform"``
opts back into the single-executable uniform-target pass for
throughput-critical serving (see ``_dispatch_track``).
"""

from __future__ import annotations

import functools
import math
import random as _random
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from demucs_tpu.models.registry import BagOfModels, Model

__all__ = ["device_apply_model", "device_separate_tracks", "stage_track"]


# Single source of truth for the reference triangle window (apply.py:271-276
# semantics) — both engines' bit-exact parity depends on sharing it.
from demucs_tpu.inference.apply import _triangle_weight as _triangle_weight_np  # noqa: E402

# Stacked bag params resident on a mesh, keyed on (member param ids, mesh):
# re-stacking per track would round-trip ~4x model size over the host link.
_STACKED_PARAMS_CACHE: dict = {}


def _segment_grid(length: int, max_shift: int, stride: int, batch_size: int,
                  shard_size: int = 1) -> tp.Tuple[int, int, int]:
    """Segment grid sized for the largest possible shifted view
    (``length + max_shift`` samples); shorter views mask out tail segments.
    Right-sizes the per-map batch so padding slots (wasted forwards) are
    minimal: e.g. 11 segments at batch 8 would run 16 slots; batch 6 runs 12.
    Returns ``(batch_size, n_batches, n_pad)``."""
    max_view = length + max_shift
    n_segments = int(math.ceil(max_view / stride))
    per = int(math.ceil(n_segments / shard_size))
    n_batches = int(math.ceil(per / batch_size))
    batch_size = int(math.ceil(per / n_batches))
    per = n_batches * batch_size
    return batch_size, n_batches, per * shard_size


def _exact_obuf_len(length: int, max_shift: int, segment_length: int,
                    target: int, stride: int, batch_size: int) -> int:
    """Length of the unnormalized accumulation buffers shared by the
    exact-tails pass, tail and norm programs (must agree exactly)."""
    _, _, n_pad = _segment_grid(length, max_shift, stride, batch_size)
    K = -(-target // stride)
    ng = -(-n_pad // K)
    return target + max_shift + (K - 1) * stride + ng * K * stride + target


def _make_pass_body(kind: str, cfg, length: int, max_shift: int, segment_length: int,
                    target: int, stride: int, batch_size: int, transition_power: float,
                    n_sources: int, audio_channels: int, mesh=None,
                    shard_axis: tp.Optional[str] = None, shard_size: int = 1,
                    exact_tails: bool = False):
    """Unjitted (model, shift)-pass over a track of static ``length``.

    Dynamic inputs: params, padded track buffer, shift offset, accumulator and
    per-source scale. Returns the updated accumulator.

    ``shard_axis``/``shard_size``: inside a ``shard_map`` body, split the
    segment forwards over that manual mesh axis (each device computes its
    contiguous slice, outputs reassembled with one tiled all_gather so the
    overlap-add runs in the exact sequential order — bit-identical results).
    Used by the bag fan-out when a member's device group has several chips.

    ``exact_tails``: for kinds whose leaf padding target depends on the chunk
    length (demucs v2's ``valid_length``, hdemucs / htdemucs without
    ``use_train_segment`` — reference apply.py:302-309), the uniform-target
    pass cannot reproduce ragged tail chunks bit-exactly. In this mode the
    pass contributes FULL windows only (their target/trim are compile-time
    constants) and returns the UNNORMALIZED ``(out_buf, wsum_buf)``; the
    tail chunks are re-run at their exact reference targets by
    ``_build_tail_fn`` programs and folded in before ``_build_norm_fn``
    divides — together bit-identical to the host engine for every chunk.
    """
    from demucs_tpu.train.solver import model_forward_fn

    forward = model_forward_fn(kind)

    batch_size, n_batches, n_pad = _segment_grid(
        length, max_shift, stride, batch_size, shard_size)
    per = n_batches * batch_size  # segments per shard (== n_pad / shard_size)
    margin = target  # slack so every centered window stays in bounds

    weight_np = _triangle_weight_np(segment_length, transition_power)
    buf_len = margin + max_shift + length + max_shift + margin

    def full_only_fn(params, track_buf, shift_offset):
        """exact_tails mode: unnormalized full-window contributions.

        Every segment whose window is complete (``chunk_len ==
        segment_length``) uses the static head path; ragged tails are masked
        to zero here and handled by the per-tail programs. Returns
        ``(out_buf (S, C, obuf_len), wsum_buf (obuf_len,))`` in padded buffer
        coordinates (track sample 0 at ``margin + max_shift``).
        """
        view_length = length + max_shift - shift_offset
        o = jnp.arange(n_pad, dtype=jnp.int32) * stride
        trim_full = (target - segment_length) // 2
        start_buf = margin + shift_offset + o - trim_full

        def extract(s):
            return jax.lax.dynamic_slice(track_buf, (0, s), (audio_channels, target))

        segments = jax.vmap(extract)(start_buf)
        if mesh is not None and mesh.devices.size > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            segs = jax.lax.with_sharding_constraint(
                segments, NamedSharding(mesh, P("dp")))
            outs = forward(params, segs, cfg)
            outs = jax.lax.with_sharding_constraint(
                outs, NamedSharding(mesh, P()))
        else:
            outs = jax.lax.map(
                lambda seg: forward(params, seg, cfg),
                segments.reshape(n_batches, batch_size, audio_channels, target),
            )
        outs = outs.reshape(n_pad, n_sources, audio_channels, target)

        w_pad = np.zeros(target, np.float32)
        w_pad[trim_full:trim_full + segment_length] = weight_np
        head_w_rolled = jnp.asarray(np.roll(w_pad, -trim_full))

        full = (o + segment_length <= view_length).astype(jnp.float32)
        contrib = jnp.roll(outs, -trim_full, axis=-1) * head_w_rolled
        contrib = contrib * full[:, None, None, None]
        wroll = head_w_rolled[None, :] * full[:, None]

        K = -(-target // stride)
        P_ = K * stride
        ng = -(-n_pad // K)
        contrib = jnp.pad(contrib, [(0, ng * K - n_pad), (0, 0), (0, 0),
                                    (0, P_ - target)])
        wroll = jnp.pad(wroll, [(0, ng * K - n_pad), (0, P_ - target)])

        # + target slack on the right: tail programs update a full
        # ``target_tail``-wide (mask-padded) window at dynamic positions up
        # to the view end — the slack keeps dynamic_update_slice unclamped.
        obuf_len = margin + max_shift + (K - 1) * stride + ng * P_ + target
        base = margin + shift_offset
        out_buf = jnp.zeros((n_sources, audio_channels, obuf_len), jnp.float32)
        wsum_buf = jnp.zeros((obuf_len,), jnp.float32)
        for g in range(K):
            start = base + g * stride
            strip = (contrib[g::K].transpose(1, 2, 0, 3)
                     .reshape(n_sources, audio_channels, ng * P_))
            cur = jax.lax.dynamic_slice(
                out_buf, (0, 0, start), (n_sources, audio_channels, ng * P_))
            out_buf = jax.lax.dynamic_update_slice(
                out_buf, cur + strip, (0, 0, start))
            wstrip = wroll[g::K].reshape(ng * P_)
            wcur = jax.lax.dynamic_slice(wsum_buf, (start,), (ng * P_,))
            wsum_buf = jax.lax.dynamic_update_slice(
                wsum_buf, wcur + wstrip, (start,))
        return out_buf, wsum_buf

    if exact_tails:
        assert shard_axis is None, "exact_tails is not used under fan-out"
        return full_only_fn

    def geometry(shift_offset):
        """Per-segment view geometry for a given shift offset: (segment
        offsets o, validity mask, chunk lengths, center-trim left cuts)."""
        view_length = length + max_shift - shift_offset
        o = jnp.arange(n_pad, dtype=jnp.int32) * stride  # offsets in view
        valid = o < view_length
        chunk_len = jnp.clip(view_length - o, 0, segment_length)
        trim = (target - chunk_len) // 2  # center_trim left cut
        return o, valid, chunk_len, trim

    def extract_segments(track_buf, shift_offset):
        """(C, buf_len) padded track -> (n_pad, C, target) centered windows."""
        o, _valid, _chunk_len, trim = geometry(shift_offset)
        # start of the centered window in padded_mix coords, then buffer coords
        start_buf = margin + shift_offset + o - trim

        def extract(s):
            return jax.lax.dynamic_slice(track_buf, (0, s), (audio_channels, target))

        return jax.vmap(extract)(start_buf)

    def pass_fn(params, track_buf, shift_offset, accum, scale):
        """track_buf: (C, buf_len) — [margin | max_shift zeros | track |
        max_shift zeros | margin]. shift_offset: int32 scalar in [0, max_shift].
        accum: (S, C, length). scale: (S,) per-source contribution weight."""
        segments = extract_segments(track_buf, shift_offset)  # (n_pad, C, target)

        if shard_axis is not None and shard_size > 1:
            # Manual (shard_map) segment parallelism within this device
            # group: slice my contiguous segments, forward them, reassemble
            # with a tiled all_gather (device order == segment order) so the
            # scatter-add below sees the identical full `outs`.
            idx = jax.lax.axis_index(shard_axis)
            my = jax.lax.dynamic_slice_in_dim(segments, idx * per, per, axis=0)
            outs = jax.lax.map(
                lambda seg: forward(params, seg, cfg),
                my.reshape(n_batches, batch_size, audio_channels, target),
            ).reshape(per, n_sources, audio_channels, target)
            outs = jax.lax.all_gather(outs, shard_axis, axis=0, tiled=True)
        elif mesh is not None and mesh.devices.size > 1:
            # Multi-chip: one forward over all segments, batch dim sharded over
            # the `dp` mesh axis (SPMD — XLA partitions the model replicas and
            # all-gathers the outputs over ICI for the overlap-add).
            from jax.sharding import NamedSharding, PartitionSpec as P

            segs = jax.lax.with_sharding_constraint(
                segments, NamedSharding(mesh, P("dp")))
            outs = forward(params, segs, cfg)
            outs = jax.lax.with_sharding_constraint(
                outs, NamedSharding(mesh, P()))
        else:
            outs = jax.lax.map(
                lambda seg: forward(params, seg, cfg),
                segments.reshape(n_batches, batch_size, audio_channels, target),
            )  # (n_batches, batch_size, S, C, target)
        outs = outs.reshape(n_pad, n_sources, audio_channels, target)
        return ola_accum(outs, shift_offset, accum, scale)

    def ola_accum(outs, shift_offset, accum, scale):
        """Overlap-add ``outs (n_pad, S, C, target)`` into ``accum`` with the
        triangular weights, normalize by the true weight sum, scale."""
        o, valid, chunk_len, trim = geometry(shift_offset)

        # Parallel overlap-add (replaces a serial fori_loop scatter; matches
        # the reference hot loop apply.py:257-301 numerically). Two steps:
        #
        # 1. Roll each segment's weighted contribution LEFT by its center-trim
        #    so every window lands at the UNIFORM position base + i*stride
        #    (tail segments' trim otherwise shifts their window start). The
        #    roll's wrapped entries are exactly the weight-masked (rel < 0)
        #    zeros, so the rotation is lossless.
        # 2. Group segments by i mod K with K = ceil(target/stride): within a
        #    group, windows are P = K*stride >= target apart, hence DISJOINT —
        #    a group flattens to one contiguous strip added with a single
        #    dynamic_update_slice. K strip-adds total (K=2 at the default
        #    overlap 0.25) instead of n_segments serial scatter iterations.
        #
        # Perf (tools/probe_ola.py): a naive full-size take_along_axis roll
        # gather costs 2x the model forwards on v5e. But segments with
        # o + segment_length <= length are full-window and valid at EVERY
        # shift offset, so their trim is the compile-time constant
        # (target - segment_length)//2: their weighted+rolled contribution
        # needs no gather at all (static weight vector, static rotation).
        # Only the <= ceil(segment_length/stride)+1 potential tail segments
        # take the dynamic path, and their roll runs as a vmapped
        # dynamic_slice on a doubled buffer (contiguous slices lower far
        # better than arbitrary gathers on TPU).
        #
        # Summation order: each output sample receives one term per covering
        # group. At overlap <= 0.5 (<= 2 covering segments) the result is
        # bit-identical to the sequential scatter (two-term float sums are
        # commutative); at higher overlaps group-order association differs
        # from segment-order by ~1 ulp.
        trim_full = (target - segment_length) // 2
        tail_start = min(n_pad, max(0, (length - segment_length) // stride + 1))
        w_pad = np.zeros(target, np.float32)
        w_pad[trim_full:trim_full + segment_length] = weight_np
        head_w_rolled = jnp.asarray(np.roll(w_pad, -trim_full))  # = w at [0, seg)

        head = jnp.roll(outs[:tail_start], -trim_full, axis=-1)  # static shift
        head = head * head_w_rolled

        j = jnp.arange(target, dtype=jnp.int32)[None, :]
        rel = j - trim[tail_start:, None]
        in_range = ((rel >= 0) & (rel < chunk_len[tail_start:, None])
                    & valid[tail_start:, None])
        wvec_t = jnp.where(
            in_range,
            jnp.take(jnp.asarray(weight_np), jnp.clip(rel, 0, segment_length - 1)),
            0.0,
        )  # (n_tail, target)
        contrib_t = outs[tail_start:] * wvec_t[:, None, None, :]

        def roll_left(x, w, t):
            x2 = jnp.concatenate([x, x], axis=-1)
            w2 = jnp.concatenate([w, w])
            return (jax.lax.dynamic_slice(
                        x2, (0, 0, t), (n_sources, audio_channels, target)),
                    jax.lax.dynamic_slice(w2, (t,), (target,)))

        contrib_t, wroll_t = jax.vmap(roll_left)(
            contrib_t, wvec_t, trim[tail_start:])

        contrib = jnp.concatenate([head, contrib_t], axis=0)
        wroll = jnp.concatenate(
            [jnp.broadcast_to(head_w_rolled, (tail_start, target)), wroll_t],
            axis=0)

        K = -(-target // stride)
        P = K * stride
        ng = -(-n_pad // K)
        contrib = jnp.pad(contrib, [(0, ng * K - n_pad), (0, 0), (0, 0),
                                    (0, P - target)])
        wroll = jnp.pad(wroll, [(0, ng * K - n_pad), (0, P - target)])

        obuf_len = margin + max_shift + (K - 1) * stride + ng * P
        base = margin + shift_offset
        out_buf = jnp.zeros((n_sources, audio_channels, obuf_len), jnp.float32)
        wsum_buf = jnp.zeros((obuf_len,), jnp.float32)
        for g in range(K):
            start = base + g * stride
            strip = (contrib[g::K].transpose(1, 2, 0, 3)
                     .reshape(n_sources, audio_channels, ng * P))
            cur = jax.lax.dynamic_slice(
                out_buf, (0, 0, start), (n_sources, audio_channels, ng * P))
            out_buf = jax.lax.dynamic_update_slice(
                out_buf, cur + strip, (0, 0, start))
            wstrip = wroll[g::K].reshape(ng * P)
            wcur = jax.lax.dynamic_slice(wsum_buf, (start,), (ng * P,))
            wsum_buf = jax.lax.dynamic_update_slice(
                wsum_buf, wcur + wstrip, (start,))

        # The original track span sits at padded coords [max_shift,
        # max_shift+length). Divide by the TRUE weight sum: every in-track
        # sample is covered by at least one segment so it is > 0 (the host
        # engine asserts the same, apply.py), and a floor like 1e-12 would
        # corrupt track-edge samples whose genuine weight sum is below it
        # (min triangle weight (2/segment_length)**transition_power —
        # already ~2e-16 at the released segment with power 3).
        lo = margin + max_shift
        res = out_buf[..., lo : lo + length] / wsum_buf[lo : lo + length]
        return accum + scale[:, None, None] * res

    # Reusable pieces for the stacked single-chip bag pass
    # (_build_stacked_bag_fn): shared extraction + per-member OLA around a
    # merged member-axis forward.
    pass_fn.extract_segments = extract_segments
    pass_fn.ola_accum = ola_accum
    pass_fn.grid = (batch_size, n_batches, n_pad)
    return pass_fn


@functools.lru_cache(maxsize=32)
def _build_pass_fn(*args):
    return jax.jit(_make_pass_body(*args), donate_argnums=(3,))


@functools.lru_cache(maxsize=32)
def _build_full_fn(*args):
    """Exact-tails full-window pass: (params, track_buf, offset) ->
    (out_buf, wsum_buf), unnormalized."""
    return jax.jit(_make_pass_body(*args, exact_tails=True))


@functools.lru_cache(maxsize=64)
def _build_tail_fn(kind: str, cfg, tail_target: int, segment_length: int,
                   transition_power: float, n_sources: int,
                   audio_channels: int, obuf_len: int):
    """One ragged tail chunk at its EXACT reference leaf target.

    The window (host-built with the same ``Chunk.padded`` arithmetic as the
    host engine — apply.py:108-124 / 302-322) runs the forward at the static
    ``tail_target`` shape; position and chunk length stay dynamic so one
    executable serves every shift offset that maps to this target (for
    demucs v2, ``valid_length`` quantizes many tail lengths onto one target;
    for hdemucs the target IS the tail length). Updates the exact-tails
    pass's unnormalized buffers in place (donated).
    """
    from demucs_tpu.train.solver import model_forward_fn

    forward = model_forward_fn(kind)
    weight_np = _triangle_weight_np(segment_length, transition_power)
    w_pad = np.zeros(tail_target, np.float32)
    w_pad[:min(segment_length, tail_target)] = \
        weight_np[:min(segment_length, tail_target)]

    def tail_fn(params, window, out_buf, wsum_buf, pos, chunk_len):
        """window: (C, tail_target). pos: int32 buffer coord of the chunk
        START (margin + shift_offset + o_i). chunk_len: int32 <= segment."""
        out = forward(params, window[None], cfg)[0]  # (S, C, tail_target)
        trim = (tail_target - chunk_len) // 2  # center_trim left cut
        # Roll the output LEFT by trim so sample j is the j-th TRIMMED
        # sample; weight-mask to the chunk length (weights beyond are 0).
        out2 = jnp.concatenate([out, out], axis=-1)
        rolled = jax.lax.dynamic_slice(
            out2, (0, 0, trim), (n_sources, audio_channels, tail_target))
        j = jnp.arange(tail_target, dtype=jnp.int32)
        wvec = jnp.where(j < chunk_len, jnp.asarray(w_pad), 0.0)
        contrib = rolled * wvec
        cur = jax.lax.dynamic_slice(
            out_buf, (0, 0, pos), (n_sources, audio_channels, tail_target))
        out_buf = jax.lax.dynamic_update_slice(out_buf, cur + contrib,
                                               (0, 0, pos))
        wcur = jax.lax.dynamic_slice(wsum_buf, (pos,), (tail_target,))
        wsum_buf = jax.lax.dynamic_update_slice(wsum_buf, wcur + wvec, (pos,))
        return out_buf, wsum_buf

    return jax.jit(tail_fn, donate_argnums=(2, 3))


@functools.lru_cache(maxsize=32)
def _build_norm_fn(length: int, n_sources: int, audio_channels: int,
                   margin: int, max_shift: int):
    """Per-pass normalization for exact-tails mode: divide by the true
    weight sum (see the uniform pass's note on why there is no epsilon
    floor) and accumulate the scaled result."""

    def norm_fn(out_buf, wsum_buf, accum, scale):
        lo = margin + max_shift
        res = (out_buf[..., lo:lo + length]
               / wsum_buf[lo:lo + length])
        return accum + scale[:, None, None] * res

    return jax.jit(norm_fn, donate_argnums=(2,))


@functools.lru_cache(maxsize=8)
def _build_bag_pass_fn(kind: str, cfg, length: int, max_shift: int,
                       segment_length: int, target: int, stride: int,
                       batch_size: int, transition_power: float, n_sources: int,
                       audio_channels: int, n_models: int, mesh):
    """Fan a homogeneous bag out across the mesh: inputs stacked per model
    (params, shift offset, per-source scale) are sharded over the ``model``
    mesh axis and each member's pass runs as plain local code on its device
    (shard_map), with one all-reduce summing the stems over ICI — the
    reference runs bag members *sequentially* (apply.py:208-224); this is the
    embarrassingly-parallel TPU win called out in SURVEY.md §2.10."""
    dp = mesh.devices.size // n_models
    body = _make_pass_body(kind, cfg, length, max_shift, segment_length, target,
                           stride, batch_size, transition_power, n_sources,
                           audio_channels, mesh=None,
                           shard_axis="dp" if dp > 1 else None, shard_size=dp)
    zero = functools.partial(jnp.zeros, (n_sources, audio_channels, length),
                             jnp.float32)

    # shard_map (not vmap + sharded inputs): each device group runs its
    # member's pass as plain local code — bit-identical to the sequential
    # engine — and only the final stem sum crosses groups (one all-reduce).
    # The SPMD partitioner pushed through the vmapped scan/scatter body loses
    # precision on some backends, so manual placement is also the safe choice.
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def bag_pass(stacked_params, track_buf, offsets, accum, scales):
        """stacked_params: pytree with leading model axis (M,...). offsets:
        (M,) int32. scales: (M, S). accum: (S, C, length)."""

        def local(track_l, params_l, offsets_l, scales_l):
            p = jax.tree.map(lambda x: x[0], params_l)
            out = body(p, track_l, offsets_l[0], zero(), scales_l[0])
            return out[None]

        per = shard_map(
            local, mesh=mesh,
            in_specs=(P(), P("model"), P("model"), P("model")),
            out_specs=P("model"), check_vma=False,
        )(track_buf, stacked_params, offsets, scales)
        return accum + per.sum(axis=0)

    return jax.jit(bag_pass, donate_argnums=(3,))


@functools.lru_cache(maxsize=8)
def _build_stacked_bag_fn(kind: str, cfg, length: int, max_shift: int,
                          segment_length: int, target: int, stride: int,
                          batch_size: int, transition_power: float,
                          n_sources: int, audio_channels: int,
                          n_models: int, n_passes: int,
                          transfer_dtype: tp.Optional[str] = None):
    """Single-chip stacked bag pass: ONE program for a whole homogeneous bag.

    The reference (and our sequential path) runs bag members one pass at a
    time (apply.py:208-224): M pass executables + per-pass dispatches. Here
    the stacked member params become a ``lax.scan`` axis over the FULL
    per-member pass (shared track buffer -> segment extraction -> right-
    sized ``lax.map`` forward batches -> triangular OLA + true-weight-sum
    normalization), with the accumulator as the scan carry — so the
    member-major accumulation order and the per-member per-source weights
    match the reference bag loop exactly, in one executable whose code and
    activation memory are those of a SINGLE member.

    Why a member-scan and not a member-vmap batch fold (both were built and
    measured on v5e, tools/probe_stacked.py, released width): the vmapped
    fold lowers convs with a leading weight-batch axis and must shrink the
    per-member batch to fit the memory budget — at (4 members x batch 4) it
    reaches 311 segment-audio-s/s vs 382 for the sequential engine's plain
    batch-16 dispatches (engine-level: 49.7 vs 56.1 device_resident). The
    member-scan keeps plain convs at the full per-member batch and measures
    409 segment-audio-s/s (+7% over the sequential dispatches) with
    1-member memory.

    Numerics: identical arithmetic, but XLA's conv lowering is only
    program-context-stable, not cross-program-stable — measured (round 5):
    the SAME forward in a differently-structured program deviates by ~1.5e-8
    (XLA:CPU fp32) / ~4.8e-5 (TPU default = its 1-pass bf16 MXU class), so
    NO fused restructuring can be bitwise-equal to the sequential engine's
    per-pass executables. The stacked pass therefore matches the sequential
    engine to those measured bounds (~140 dB on CPU; on TPU, within the
    default precision's own cross-program noise class) and the host engine
    at the standard device-engine tolerance. Parity: tests/test_stacked_bag.py.
    """
    body = _make_pass_body(kind, cfg, length, max_shift, segment_length,
                           target, stride, batch_size, transition_power,
                           n_sources, audio_channels)
    # the bag program is single-dispatch by design, so the final normalize
    # + wire-format rides along for free (one launch + fetch per track)
    fin = _final_body(transfer_dtype, length,
                      n_sources * audio_channels * _WIRE_BYTES[transfer_dtype])

    def bag_fn(stacked_params, track_buf, offsets, scales, totals):
        """stacked_params: pytree with leading member axis (M, ...).
        track_buf: (C, buf_len) shared padded track. offsets: (M, n_passes)
        int32 shift offsets (member-major draw order, matching the
        sequential engines). scales: (M, S). totals: (S,) weight sums."""
        accum = jnp.zeros((n_sources, audio_channels, length), jnp.float32)

        def member_body(acc, xs):
            params_m, offsets_m, scale_m = xs
            for s in range(n_passes):
                acc = body(params_m, track_buf, offsets_m[s], acc, scale_m)
            return acc, 0.0

        accum, _ = jax.lax.scan(member_body, accum,
                                (stacked_params, offsets, scales))
        return fin(accum, totals)

    return jax.jit(bag_fn)


def _stack_member_params(models, mesh=None):
    """Stack (and cache on device) a homogeneous bag's param pytrees along a
    leading member axis; keyed on the member param identities so repeated
    tracks skip the host->device param upload."""
    cache_key = (tuple(id(m.params) for m in models), mesh)
    stacked = _STACKED_PARAMS_CACHE.get(cache_key)
    if stacked is None:
        stacked = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
            *[m.params for m in models])
        _STACKED_PARAMS_CACHE.clear()  # one bag live at a time is the norm
        _STACKED_PARAMS_CACHE[cache_key] = stacked
    return stacked


_FETCH_CHUNK_BYTES = 12 * 2**20


@functools.lru_cache(maxsize=64)
def _final_fn(transfer_dtype: tp.Optional[str], length: int, item_bytes: int):
    """Normalize + wire-format cast + pre-slice for chunked fetch.

    The host link collapses on large single transfers (tools/probe_d2h2.py:
    16 MB sustains ~44 MB/s, 84 MB drops to ~9 MB/s), so the stems come back
    as a tuple of <=12 MB slices — all produced by ONE jitted executable.
    """
    return jax.jit(_final_body(transfer_dtype, length, item_bytes))


def _final_body(transfer_dtype: tp.Optional[str], length: int, item_bytes: int):
    """Unjitted normalize + wire-format + chunk-slice body — composed into
    single-dispatch programs by the fused builders (and jitted standalone by
    ``_final_fn`` for the multi-pass accumulate paths)."""
    nbytes = length * item_bytes
    n_chunks = max(1, -(-nbytes // _FETCH_CHUNK_BYTES))
    step = -(-length // n_chunks)
    bounds = [(i, min(length, i + step)) for i in range(0, length, step)]

    def normalize(x, t):
        return x / t[:, None, None]

    if transfer_dtype in (None, "float32"):
        def fn(x, t):
            y = normalize(x, t)
            return tuple(y[..., a:b] for a, b in bounds)
        return fn
    if transfer_dtype == "float16":
        def fn(x, t):
            y = normalize(x, t).astype(jnp.float16)
            return tuple(y[..., a:b] for a, b in bounds)
        return fn
    if transfer_dtype == "int16":
        def fn(x, t):
            y = normalize(x, t)
            scale = jnp.max(jnp.abs(y), axis=-1, keepdims=True) / 32766.0 + 1e-12
            q = jnp.round(y / scale).astype(jnp.int16)
            return tuple(q[..., a:b] for a, b in bounds), scale
        return fn
    if transfer_dtype == "int8":
        # Block-adaptive int8: per-(source, channel, 1024-sample block)
        # max-abs scaling -> ~44 dB SNR relative to the LOCAL signal level
        # (quantization noise tracks the envelope). Half the wire bytes of
        # fp16/int16; opt-in for preview/streaming-grade serving. Scales ride
        # along as fp16 (+0.2% bytes).
        blk = _INT8_BLOCK
        pad = (-length) % blk
        # re-chunk bounds on block boundaries so slices stay dequantizable
        n_blocks = (length + pad) // blk
        blocks_per_chunk = max(1, _FETCH_CHUNK_BYTES // (item_bytes * blk))
        bbounds = [(i, min(n_blocks, i + blocks_per_chunk))
                   for i in range(0, n_blocks, blocks_per_chunk)]

        def fn(x, t):
            y = normalize(x, t)
            if pad:
                y = jnp.pad(y, [(0, 0), (0, 0), (0, pad)])
            yb = y.reshape(*y.shape[:-1], n_blocks, blk)
            scale = jnp.max(jnp.abs(yb), axis=-1, keepdims=True) / 126.0 + 1e-12
            q = jnp.round(yb / scale).astype(jnp.int8)
            return (tuple(q[..., a:b, :] for a, b in bbounds),
                    scale.astype(jnp.float16))
        return fn
    raise ValueError(transfer_dtype)


_WIRE_BYTES = {None: 4, "float32": 4, "float16": 2, "int16": 2, "int8": 1}


@functools.lru_cache(maxsize=16)
def _build_pass_final_fn(kind: str, cfg, length: int, max_shift: int,
                         segment_length: int, target: int, stride: int,
                         batch_size: int, transition_power: float,
                         n_sources: int, audio_channels: int,
                         transfer_dtype: tp.Optional[str]):
    """Single-dispatch track program for the DEFAULT serving shape (one
    model, one shift pass, uniform targets): the full pass body + normalize
    + wire-format + chunk-slice in ONE executable — a track costs one
    program launch + the fetch instead of pass + final + fetch
    (tools/probe_engine.py attributed ~24 ms of relay RTT per extra launch)."""
    body = _make_pass_body(kind, cfg, length, max_shift, segment_length,
                           target, stride, batch_size, transition_power,
                           n_sources, audio_channels)
    fin = _final_body(transfer_dtype, length,
                      n_sources * audio_channels * _WIRE_BYTES[transfer_dtype])

    def fused(params, track_buf, shift_offset, scale, totals):
        accum = body(params, track_buf, shift_offset,
                     jnp.zeros((n_sources, audio_channels, length),
                               jnp.float32), scale)
        return fin(accum, totals)

    return jax.jit(fused)


_INT8_BLOCK = 1024


@functools.lru_cache(maxsize=16)
def _prep_fn(C: int, L: int, margin: int, max_shift: int,
             chunk_lens: tp.Tuple[int, ...] = ()):
    """Pad the raw uploaded track into the engine buffer on device (the
    zero margins never cross the host link). The track arrives as
    ``chunk_lens`` time-slices (threaded chunked upload) concatenated here."""

    def prep(*chunks):
        mix = (chunks[0] if len(chunks) == 1
               else jnp.concatenate(chunks, axis=-1)).astype(jnp.float32)
        return jnp.pad(mix, [(0, 0), (margin + max_shift, max_shift + margin)])

    return jax.jit(prep)


_UPLOAD_CHUNK_BYTES = 3 * 2**20


def _upload_track(wire: np.ndarray, C: int, L: int, margin: int,
                  max_shift: int, sharding=None):
    """Upload ``wire (C, L)`` and pad it into the engine buffer on device.

    The relay's host->device path is latency-dominated per transfer and the
    latency PARALLELIZES: 4-way threaded ~3 MB chunks sustain ~30 MB/s where
    one 10 MB ``device_put`` gets ~3 MB/s (tools/probe_h2d.py). Chunks are
    re-concatenated by the (jitted) prep program, so results are bit-identical
    to a single upload."""
    n = max(1, min(8, -(-wire.nbytes // _UPLOAD_CHUNK_BYTES)))
    step = -(-L // n)
    parts = [np.ascontiguousarray(wire[..., i * step:(i + 1) * step])
             for i in range(n)]
    parts = [p for p in parts if p.shape[-1]]
    put = (jax.device_put if sharding is None
           else functools.partial(jax.device_put, device=sharding))
    if len(parts) == 1:
        devs = [put(parts[0])]
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(min(4, len(parts))) as ex:
            devs = list(ex.map(put, parts))
    prep = _prep_fn(C, L, margin, max_shift, tuple(p.shape[-1] for p in parts))
    return prep(*devs)


def pass_memory_analysis(
    model: tp.Union[Model, BagOfModels],
    length: int,
    *,
    shifts: int = 1,
    overlap: float = 0.25,
    transition_power: float = 1.0,
    segment: tp.Optional[float] = None,
    batch_size: int = 16,
    mesh=None,
) -> tp.Optional[dict]:
    """Compile-time HBM footprint of the main pass executable (GiB fields).

    The reference bench reports runtime peak device memory
    (``tools/bench.py:26-43``); on deployments whose runtime returns no
    ``memory_stats()`` (the relay-attached TPU here) this reports XLA's
    compile-time buffer assignment for the dominant executable instead:
    argument/output/temp bytes and their aliasing discount. ``peak_estimate``
    = args + outputs + temps - aliased (donated accumulators alias their
    output). Returns None when the backend exposes no memory analysis.
    """
    sub = (model.models[0] if isinstance(model, BagOfModels) else model)
    sr = sub.samplerate
    C = sub.audio_channels
    S = len(sub.sources)
    max_shift = int(0.5 * sr) if shifts else 0
    seg_f = segment if segment is not None else sub.segment
    segment_length = int(sr * seg_f)
    stride = int((1 - overlap) * segment_length)
    target = sub.leaf_target(segment_length, segment)
    if mesh is not None:
        batch_size = mesh.devices.size
    fn = _build_pass_fn(sub.kind, sub.cfg, length, max_shift, segment_length,
                        target, stride, batch_size, transition_power, S, C,
                        mesh)
    margin = target
    buf_len = margin + max_shift + length + max_shift + margin
    sds = jax.ShapeDtypeStruct
    params_s = jax.tree.map(lambda a: sds(jnp.shape(a), a.dtype), sub.params)
    try:
        mem = fn.lower(
            params_s,
            sds((C, buf_len), jnp.float32),
            sds((), jnp.int32),
            sds((S, C, length), jnp.float32),
            sds((S,), jnp.float32),
        ).compile().memory_analysis()
        if mem is None:
            return None
        arg = int(mem.argument_size_in_bytes)
        out = int(mem.output_size_in_bytes)
        tmp = int(mem.temp_size_in_bytes)
        ali = int(mem.alias_size_in_bytes)
        code = int(mem.generated_code_size_in_bytes)
    except Exception:
        return None
    gib = float(2**30)
    return {
        "argument_gb": round(arg / gib, 3),
        "output_gb": round(out / gib, 3),
        "temp_gb": round(tmp / gib, 3),
        "alias_gb": round(ali / gib, 3),
        "peak_estimate_gb": round((arg + out + tmp - ali) / gib, 3),
        "generated_code_mb": round(code / 2**20, 2),
    }


def device_apply_model(
    model: tp.Union[Model, BagOfModels],
    mix: np.ndarray,
    *,
    transfer_dtype: tp.Optional[str] = None,
    **kw,
) -> np.ndarray:
    """Separate ``mix (1, C, L)`` fully on device -> ``(1, S, C, L)`` float32.

    Matches ``apply_model(split=True)`` numerics bit-exactly by default for
    ALL kinds — including ragged tail chunks of length-dependent-target
    models (demucs v2 / hdemucs / htdemucs without train segment), which run
    at their exact reference leaf targets (see ``_make_pass_body``'s
    ``exact_tails``). The only approximation is the OPT-IN reduced-precision
    wire format for the single final fetch (``transfer_dtype``), which is
    well below stem PCM quantization.
    """
    pending = _dispatch_track(model, mix, transfer_dtype=transfer_dtype, **kw)
    return _gather_stems(*pending)


def stage_track(
    model: tp.Union[Model, BagOfModels],
    mix: np.ndarray,
    *,
    shifts: int = 1,
    segment: tp.Optional[float] = None,
    input_transfer_dtype: tp.Optional[str] = None,
) -> dict:
    """Pre-upload a track's padded engine buffer(s) to the device.

    Pass the result as ``device_apply_model(..., prestaged=...)`` to take the
    input upload off the dispatch path — for device-resident audio sources
    (on-device evaluation, synthesized input) and for isolating engine time
    from the host link in benchmarks. The staging arguments (``shifts``,
    ``segment``, ``input_transfer_dtype``) must match the apply call's."""
    models = model.models if isinstance(model, BagOfModels) else [model]
    first = models[0]
    assert mix.ndim == 3 and mix.shape[0] == 1, mix.shape
    sr = first.samplerate
    C = first.audio_channels
    L = mix.shape[-1]
    max_shift = int(0.5 * sr) if shifts else 0
    out: dict = {}
    for m in models:
        seg_f = segment if segment is not None else m.segment
        seg_len = int(sr * seg_f)
        target = m.leaf_target(seg_len, segment)
        key = (seg_len, target)
        if key in out:
            continue
        wire = mix[0]
        if input_transfer_dtype == "float16":
            wire = wire.astype(np.float16)
        out[key] = _upload_track(wire, C, L, target, max_shift)
    return out


def device_separate_tracks(
    model: tp.Union[Model, BagOfModels],
    tracks: tp.Iterable[np.ndarray],
    *,
    transfer_dtype: tp.Optional[str] = None,
    **kw,
) -> tp.Iterator[np.ndarray]:
    """Pipelined multi-track separation: yields stems per track, overlapping
    each track's device->host stems fetch with the NEXT track's compute.

    The host link (~20-40 MB/s on this deployment) and the chip work on
    different queues; dispatching track i+1's passes before blocking on track
    i's fetch keeps both busy — the sustained multi-track rate approaches
    max(compute, wire) instead of compute + wire. Numerics are identical to
    per-track ``device_apply_model`` calls (same RNG draw order). Use
    ``length_bucket_seconds`` so variable-length tracks share one executable.
    """
    pending = None
    for mix in tracks:
        state = _dispatch_track(model, mix, transfer_dtype=transfer_dtype, **kw)
        if pending is not None:
            yield _gather_stems(*pending)
        pending = state
    if pending is not None:
        yield _gather_stems(*pending)


def _dispatch_track(
    model: tp.Union[Model, BagOfModels],
    mix: np.ndarray,
    *,
    shifts: int = 1,
    overlap: float = 0.25,
    transition_power: float = 1.0,
    segment: tp.Optional[float] = None,
    batch_size: int = 16,
    rng: tp.Optional[_random.Random] = None,
    transfer_dtype: tp.Optional[str] = None,
    input_transfer_dtype: tp.Optional[str] = "auto",
    progress: bool = False,
    mesh: tp.Optional["jax.sharding.Mesh"] = None,
    length_bucket_seconds: tp.Optional[float] = None,
    prestaged: tp.Optional[dict] = None,
    tail_mode: str = "exact",
    bag_mode: str = "auto",
):
    """Upload + dispatch all device work for one track (asynchronously),
    including the final normalize/wire-format stage; returns the pending
    device results for ``_gather_stems`` to block on. The default serving
    shape (one model, one shift pass, uniform targets) and the stacked bag
    path run as a SINGLE fused program (pass + normalize + wire,
    ``_build_pass_final_fn``); multi-pass/exact-tail/mesh paths accumulate
    across programs and finish with the separate final program.

    ``input_transfer_dtype="auto"`` follows ``transfer_dtype``: a bit-exact
    output request (None) implies a bit-exact (fp32) input upload.

    ``bag_mode`` (homogeneous uniform-target bags on one device): "auto"
    (default) folds the whole bag into ONE stacked-member program — a
    lax.scan over stacked member params around the full per-member pass,
    member-major accumulation (see ``_build_stacked_bag_fn``; measured ~5e-5 TPU /
    ~1.5e-8 CPU deviation vs the sequential per-pass executables — XLA conv
    lowering is program-context-dependent, the same class of noise as the
    default precision itself). "sequential" forces the reference-style
    member loop; "stacked" requires eligibility and raises otherwise.

    ``tail_mode`` (length-dependent-target kinds only): "exact" (default)
    runs each ragged tail chunk at its reference leaf target — bit-exact,
    but every NEW tail shape costs a small executable compile+load (random
    shift offsets make tail lengths vary per track; measured ~75 s first
    load per new tail executable on this deployment's remote relay —
    seconds on a directly-attached TPU — so serving with random shifts can
    stall minutes on unseen offsets; pin offsets, prewarm, or pick
    "uniform"/shifts=0). "uniform" pads every chunk to the uniform
    ``leaf_target(segment_length)`` — one executable total, full chunks
    bit-exact, tail chunks see slightly more real context than the
    reference's per-length padding (apply.py:302-309). Uniform-target
    models (HTDemucs with train segment) are always exact either way."""
    if tail_mode not in ("exact", "uniform"):
        raise ValueError(f"unknown tail_mode {tail_mode!r}")
    if bag_mode not in ("auto", "stacked", "sequential"):
        raise ValueError(f"unknown bag_mode {bag_mode!r}")
    if input_transfer_dtype == "auto":
        bit_exact = transfer_dtype in (None, "float32")
        input_transfer_dtype = None if bit_exact else "float16"
    if rng is None:
        rng = _random
    assert mix.ndim == 3 and mix.shape[0] == 1, mix.shape
    orig_length = mix.shape[-1]
    if length_bucket_seconds is not None and length_bucket_seconds <= 0:
        raise ValueError(
            f"length_bucket_seconds must be positive, got {length_bucket_seconds}")
    if length_bucket_seconds:
        # Quantize track length so one compiled pass serves many tracks
        # (compiles cost 25-70 s on this deployment). The right-zero padding
        # matches the reference's own zero-padding of tail chunks; only the
        # final partial chunk's context differs slightly.
        sr0 = (model.models[0] if isinstance(model, BagOfModels) else model).samplerate
        bucket = int(length_bucket_seconds * sr0)
        target_len = -(-orig_length // bucket) * bucket
        if target_len != orig_length:
            mix = np.pad(mix, [(0, 0), (0, 0), (0, target_len - orig_length)])
    models = model.models if isinstance(model, BagOfModels) else [model]
    weights = (model.weights if isinstance(model, BagOfModels)
               else [[1.0] * len(models[0].sources)])

    first = models[0]
    samplerate = first.samplerate
    n_sources = len(first.sources)
    C = first.audio_channels
    L = mix.shape[-1]
    max_shift = int(0.5 * samplerate) if shifts else 0

    totals = np.zeros(n_sources)

    # Homogeneous bag on a multi-device mesh: fan members out across the mesh
    # (a device GROUP per model) instead of the reference's sequential loop.
    # With more devices than models (evenly divisible), each group also
    # splits its member's segment forwards over the group's `dp` axis
    # (manual all_gather keeps the overlap-add order, so results stay
    # bit-identical to the sequential engine).
    fan_out = (
        mesh is not None
        and len(models) > 1
        and all(m.kind == first.kind and m.cfg == first.cfg for m in models)
        and mesh.devices.size % len(models) == 0
        # fan-out runs the uniform-target pass only; length-dependent-target
        # kinds (exact ragged tails) take the sequential path below, which
        # still shards each member's segment forwards over the dp mesh —
        # unless the caller opted into tail_mode="uniform"
        and (tail_mode == "uniform"
             or (first.kind == "htdemucs"
                 and (first.uses_train_segment or segment is not None)))
    )
    if prestaged and (fan_out or length_bucket_seconds or mesh is not None):
        raise ValueError(
            "prestaged buffers are keyed on exact track length/segment and "
            "committed to a single device; incompatible with length "
            "bucketing, bag fan-out, and meshes (stage_track has no "
            "sharding parameter)")
    if fan_out:
        if progress:
            # All bag members run concurrently in one dispatch — there is no
            # per-model step to animate; emit a single status line instead.
            print(f"fan-out: {len(models)} bag models x {max(1, shifts)} "
                  f"shift pass(es) dispatched concurrently over "
                  f"{mesh.devices.size} devices", flush=True)
        accum, totals = _bag_fanout_passes(
            models, weights, mix, mesh, shifts=shifts, overlap=overlap,
            transition_power=transition_power, segment=segment,
            batch_size=batch_size, rng=rng,
            input_transfer_dtype=input_transfer_dtype, max_shift=max_shift,
        )
        return _dispatch_final(accum, totals, transfer_dtype, n_sources, C, L,
                               orig_length)

    # Single-chip homogeneous bag: fold the whole bag (all members x shift
    # passes) into ONE stacked-member program instead of the reference's
    # sequential member loop (apply.py:208-224) — the flagship htdemucs_ft
    # case the r4 verdict called out. Uniform-target kinds only (the merged
    # batch needs one static leaf target).
    stacked_bag = (
        bag_mode in ("auto", "stacked")
        and len(models) > 1
        and (mesh is None or mesh.devices.size == 1)
        and all(m.kind == first.kind and m.cfg == first.cfg for m in models)
        and (tail_mode == "uniform"
             or (first.kind == "htdemucs"
                 and (first.uses_train_segment or segment is not None)))
    )
    if bag_mode == "stacked" and not stacked_bag:
        raise ValueError(
            "bag_mode='stacked' requires a homogeneous uniform-target bag "
            "(same kind+config members; htdemucs with train segment, an "
            "explicit segment, or tail_mode='uniform') on a single device")
    if stacked_bag:
        seg_f = segment if segment is not None else first.segment
        segment_length = int(samplerate * seg_f)
        stride = int((1 - overlap) * segment_length)
        target = first.leaf_target(segment_length, segment)
        key = (segment_length, target)
        track_dev = dict(prestaged) if prestaged else {}
        if key not in track_dev:
            wire = mix[0]
            if input_transfer_dtype == "float16":
                wire = wire.astype(np.float16)
            track_dev[key] = _upload_track(wire, C, L, target, max_shift)
        n_passes = max(1, shifts)
        # member-major draw order == the sequential engine / host engine
        offs = np.array(
            [[rng.randint(0, max_shift) if shifts else 0
              for _ in range(n_passes)] for _ in models], np.int32)
        if progress:
            print(f"stacked bag: {len(models)} members x {n_passes} shift "
                  f"pass(es) in one program", flush=True)
        bag_fn = _build_stacked_bag_fn(
            first.kind, first.cfg, L, max_shift, segment_length, target,
            stride, batch_size, transition_power, n_sources, C,
            len(models), n_passes, transfer_dtype)
        totals = np.asarray(weights, np.float64).sum(axis=0) * n_passes
        result = bag_fn(
            _stack_member_params(models), track_dev[key], jnp.asarray(offs),
            jnp.asarray(np.asarray(weights, np.float32)),
            jnp.asarray(totals, jnp.float32))
        return result, transfer_dtype, orig_length

    # The DEFAULT serving shape (one model, one shift pass, uniform targets,
    # single device): the whole track is ONE program — pass + normalize +
    # wire-format fused (_build_pass_final_fn) — plus the fetch. Saves a
    # program launch (~24 ms relay RTT) over pass-then-final.
    single_fused = (
        len(models) == 1
        and max(1, shifts) == 1
        and mesh is None
        and (tail_mode == "uniform"
             or (first.kind == "htdemucs"
                 and (first.uses_train_segment or segment is not None)))
    )
    if single_fused:
        sub_model = models[0]
        seg_f = segment if segment is not None else sub_model.segment
        segment_length = int(samplerate * seg_f)
        stride = int((1 - overlap) * segment_length)
        target = sub_model.leaf_target(segment_length, segment)
        key = (segment_length, target)
        track_dev = dict(prestaged) if prestaged else {}
        if key not in track_dev:
            wire = mix[0]
            if input_transfer_dtype == "float16":
                wire = wire.astype(np.float16)
            track_dev[key] = _upload_track(wire, C, L, target, max_shift)
        offset = rng.randint(0, max_shift) if shifts else 0
        if progress:
            print("1 model x 1 shift pass: fused single-program dispatch",
                  flush=True)
        fused = _build_pass_final_fn(
            sub_model.kind, sub_model.cfg, L, max_shift, segment_length,
            target, stride, batch_size, transition_power, n_sources, C,
            transfer_dtype)
        w = np.asarray(weights[0], np.float64)
        result = fused(sub_model.params, track_dev[key], jnp.int32(offset),
                       jnp.asarray(w, jnp.float32),
                       jnp.asarray(w, jnp.float32))
        return result, transfer_dtype, orig_length

    accum = None
    track_dev = dict(prestaged) if prestaged else {}

    iterator = list(zip(models, weights))
    if progress:
        import tqdm

        iterator = tqdm.tqdm(iterator, ncols=120, unit="model")

    padded_mix_np = None  # host copy for exact-tail windows, built lazily

    for sub_model, model_weights in iterator:
        seg_f = segment if segment is not None else sub_model.segment
        segment_length = int(samplerate * seg_f)
        stride = int((1 - overlap) * segment_length)
        target = sub_model.leaf_target(segment_length, segment)
        # Kinds whose leaf target is the same for every chunk run as ONE
        # program per (model, shift); length-dependent-target kinds
        # (apply.py:302-309) additionally run each ragged tail chunk at its
        # exact reference target (bit-exact tails — see _make_pass_body).
        uniform = tail_mode == "uniform" or (
            sub_model.kind == "htdemucs"
            and (sub_model.uses_train_segment or segment is not None))

        key = (segment_length, target)
        if key not in track_dev:
            margin = target
            wire = mix[0]
            if input_transfer_dtype == "float16":
                wire = wire.astype(np.float16)
            track_dev[key] = _upload_track(wire, C, L, margin, max_shift)

        if mesh is not None:
            # segment grid must divide evenly across devices
            batch_size = mesh.devices.size
        if accum is None:
            accum = jnp.zeros((n_sources, C, L), jnp.float32)

        if uniform:
            pass_fn = _build_pass_fn(
                sub_model.kind, sub_model.cfg, L, max_shift, segment_length,
                target, stride, batch_size, transition_power, n_sources, C,
                mesh,
            )
        else:
            full_fn = _build_full_fn(
                sub_model.kind, sub_model.cfg, L, max_shift, segment_length,
                target, stride, batch_size, transition_power, n_sources, C,
                mesh,
            )
            obuf_len = _exact_obuf_len(L, max_shift, segment_length, target,
                                       stride, batch_size)
            norm_fn = _build_norm_fn(L, n_sources, C, target, max_shift)
            if padded_mix_np is None:
                padded_mix_np = np.pad(
                    mix.astype(np.float32, copy=False),
                    [(0, 0), (0, 0), (max_shift, max_shift)])

        n_shift_passes = max(1, shifts)
        for _ in range(n_shift_passes):
            offset = rng.randint(0, max_shift) if shifts else 0
            # Accumulate w*r per pass and fold the shift divisor into the
            # final normalization (totals * n): for a single unit-weight
            # model this reproduces the host's sum-then-divide bit-for-bit
            # at any shift count (w/n per pass would round differently for
            # shifts >= 3); multi-model bags still differ at the ulp level
            # (summation association).
            scale = jnp.asarray(model_weights, jnp.float32)
            if uniform:
                accum = pass_fn(sub_model.params, track_dev[key],
                                jnp.int32(offset), accum, scale)
                continue
            out_buf, wsum_buf = full_fn(sub_model.params, track_dev[key],
                                        jnp.int32(offset))
            # Ragged tails (host knows the offset it just drew): the same
            # chunk/window arithmetic as the host engine, forwarded at the
            # exact per-length leaf target on device.
            from demucs_tpu.inference.apply import Chunk

            view_length = L + max_shift - offset
            for o in range(0, view_length, stride):
                chunk_len = min(view_length - o, segment_length)
                if chunk_len >= segment_length:
                    continue
                tail_target = sub_model.leaf_target(chunk_len, segment)
                chunk = Chunk(padded_mix_np, offset + o, chunk_len)
                window = jnp.asarray(chunk.padded(tail_target)[0])
                tail_fn = _build_tail_fn(
                    sub_model.kind, sub_model.cfg, tail_target,
                    segment_length, transition_power, n_sources, C, obuf_len)
                out_buf, wsum_buf = tail_fn(
                    sub_model.params, window, out_buf, wsum_buf,
                    jnp.int32(target + offset + o), jnp.int32(chunk_len))
            accum = norm_fn(out_buf, wsum_buf, accum, scale)
        totals += np.asarray(model_weights, np.float64) * n_shift_passes

    return _dispatch_final(accum, totals, transfer_dtype, n_sources, C, L,
                           orig_length)


def _dispatch_final(accum, totals, transfer_dtype, n_sources: int, C: int,
                    L: int, orig_length: int):
    """Dispatch the normalize + wire-format program (async); the returned
    tuple is blocked on by ``_gather_stems``."""
    bytes_per = {None: 4, "float32": 4, "float16": 2, "int16": 2, "int8": 1}
    item_bytes = n_sources * C * bytes_per[transfer_dtype]
    final = _final_fn(transfer_dtype, L, item_bytes)
    result = final(accum, jnp.asarray(totals, jnp.float32))
    return result, transfer_dtype, orig_length


def _fetch_pieces(pieces) -> list:
    """Fetch the <=12 MB result slices, 4 at a time: concurrent medium
    transfers sustain ~40% more throughput than sequential ones on this
    relay (34 vs 24 MB/s measured; order preserved)."""
    if len(pieces) <= 1:
        return [np.asarray(p) for p in pieces]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(min(4, len(pieces))) as ex:
        return list(ex.map(np.asarray, pieces))


def _gather_stems(result, transfer_dtype, orig_length: int) -> np.ndarray:
    """Block on the chunked device->host stems fetch -> ``(1, S, C, L)``."""
    if transfer_dtype == "int16":
        pieces, scales = result
        out = np.concatenate(_fetch_pieces(pieces), axis=-1)
        out = out.astype(np.float32) * np.asarray(scales)
    elif transfer_dtype == "int8":
        pieces, scales = result
        q = np.concatenate(_fetch_pieces(pieces), axis=-2)  # (S,C,blocks,blk)
        out = q.astype(np.float32) * np.asarray(scales, np.float32)
        out = out.reshape(*out.shape[:-2], -1)
    else:
        out = np.concatenate(_fetch_pieces(result), axis=-1)
        out = out.astype(np.float32)
    return out[None][..., :orig_length]


def _bag_fanout_passes(models, weights, mix, mesh, *, shifts, overlap,
                       transition_power, segment, batch_size, rng,
                       input_transfer_dtype, max_shift):
    """Run every bag member concurrently: stack params along a ``model`` axis
    sharded over the mesh (shard_map — each member's pass runs as plain local
    code on its device), stems summed with one all-reduce. Shift offsets are
    drawn in the same model-major order as the sequential path (reference
    apply.py:208-224 semantics)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    first = models[0]
    n_models = len(models)
    n_sources = len(first.sources)
    C = first.audio_channels
    L = mix.shape[-1]
    samplerate = first.samplerate

    seg_f = segment if segment is not None else first.segment
    segment_length = int(samplerate * seg_f)
    stride = int((1 - overlap) * segment_length)
    target = first.leaf_target(segment_length, segment)
    margin = target

    mesh2 = Mesh(mesh.devices.reshape(n_models, -1), ("model", "dp"))
    by_model = NamedSharding(mesh2, P("model"))
    repl = NamedSharding(mesh2, P())

    wire = mix[0]
    if input_transfer_dtype == "float16":
        wire = wire.astype(np.float16)
    track_buf = _upload_track(wire, C, L, margin, max_shift, sharding=repl)

    # Stacking pulls every member's params to host and re-uploads the stack
    # (~4x model size over this deployment's 20-40 MB/s relay): cache the
    # stacked DEVICE array across tracks — multi-track bag separation pays
    # the upload once, not per track.
    cache_key = (tuple(id(m.params) for m in models), mesh2)
    stacked = _STACKED_PARAMS_CACHE.get(cache_key)
    if stacked is None:
        stacked = jax.device_put(
            jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]),
                         *[m.params for m in models]),
            by_model,
        )
        _STACKED_PARAMS_CACHE.clear()  # one bag live at a time is the norm
        _STACKED_PARAMS_CACHE[cache_key] = stacked

    n_shift_passes = max(1, shifts)
    # model-major draw order == the sequential engine / host engine
    offs = np.array(
        [[rng.randint(0, max_shift) if shifts else 0
          for _ in range(n_shift_passes)] for _ in models], np.int32)
    # w per pass + shift divisor folded into the final normalization — same
    # rounding policy as the sequential engine loop above.
    scales = jax.device_put(np.asarray(weights, np.float32), by_model)

    pass_fn = _build_bag_pass_fn(
        first.kind, first.cfg, L, max_shift, segment_length, target, stride,
        batch_size, transition_power, n_sources, C, n_models, mesh2)
    accum = jax.device_put(np.zeros((n_sources, C, L), np.float32), repl)
    for s in range(n_shift_passes):
        accum = pass_fn(stacked, track_buf, jax.device_put(offs[:, s], by_model),
                        accum, scales)
    totals = np.asarray(weights, np.float64).sum(axis=0) * n_shift_passes
    return accum, totals
