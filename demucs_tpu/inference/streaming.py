"""Streaming separation: feed audio in arbitrary chunks, get stems back
incrementally — bit-identical to the offline engine.

Beyond-reference capability for live/low-latency serving (the reference and
its browser runtime are strictly offline, ``demucs/apply.py:257-301``): the
same segment grid, triangular transition weights and centered tail padding
as ``apply_model(split=True, shifts=0)``, evaluated incrementally. A sample
is emitted once every segment overlapping it has been processed, so the
concatenated stream equals the offline output EXACTLY (tests/
test_streaming.py), with worst-case algorithmic latency of one segment plus
one stride of audio.

    stream = StreamSeparator(model)            # 7.8 s segments by default
    for block in microphone():                 # any chunk sizes
        stems = stream.feed(block)             # (S, C, n_ready) as available
        ...
    stems_tail = stream.flush()

Memory is O(segment), independent of stream length.
"""

from __future__ import annotations

import typing as tp

import numpy as np

from demucs_tpu.inference.apply import Chunk, _run_batched, _triangle_weight
from demucs_tpu.models.registry import Model

__all__ = ["StreamSeparator"]


class StreamSeparator:
    """Incremental overlap-add separation for a single :class:`Model`.

    Bag ensembles and the random-shift trick are offline concepts (they need
    the whole track); use :func:`demucs_tpu.inference.apply.apply_model` for
    those. Input/output normalization is the caller's business, exactly like
    ``apply_model``.
    """

    def __init__(self, model: Model, segment: tp.Optional[float] = None,
                 overlap: float = 0.25, transition_power: float = 1.0):
        assert isinstance(model, Model), "streaming supports single models"
        self.model = model
        self._segment = segment
        segment_f = model.segment if segment is None else segment
        assert segment_f and segment_f > 0.0
        self.segment_length = int(model.samplerate * segment_f)
        self.stride = int((1 - overlap) * self.segment_length)
        assert self.stride > 0
        self._weight = _triangle_weight(self.segment_length, transition_power)
        self._n_sources = len(model.sources)
        # Kinds whose leaf padding target exceeds the segment (demucs v2
        # valid_length) center-pad with REAL future samples: a full segment
        # only becomes processable once that lookahead is buffered.
        target_full = model.leaf_target(self.segment_length, segment)
        delta_full = target_full - self.segment_length
        self._ahead = delta_full - delta_full // 2
        self._lookback = max(self.segment_length, target_full)

        # absolute positions: [_base, _fed) is buffered mix; [_emitted, ...)
        # accumulates not-yet-final output
        self._mix = np.zeros((1, model.audio_channels, 0), np.float32)
        self._base = 0
        self._fed = 0
        self._next_offset = 0
        self._emitted = 0
        self._acc = np.zeros(
            (self._n_sources, model.audio_channels, 0), np.float32)
        self._wsum = np.zeros((0,), np.float32)
        self._closed = False

    @property
    def latency_samples(self) -> int:
        """Worst-case samples buffered before a sample becomes final."""
        return self.segment_length + self.stride + self._ahead

    # ------------------------------------------------------------- internals

    def _grow_acc(self, upto: int) -> None:
        cur = self._emitted + self._acc.shape[-1]
        if upto > cur:
            pad = upto - cur
            self._acc = np.pad(self._acc, [(0, 0), (0, 0), (0, pad)])
            self._wsum = np.pad(self._wsum, [(0, pad)])

    def _process_segment(self, offset: int, length: int) -> None:
        """Run one segment (absolute ``offset``, ``length`` real samples)."""
        local = Chunk(self._mix, offset - self._base, length)
        target = self.model.leaf_target(local.length, self._segment)
        [out] = _run_batched(self.model, [local], target, 1)
        out = out[0] if out.ndim == 4 else out  # (S, C, length)
        self._grow_acc(offset + local.length)
        sl = slice(offset - self._emitted, offset - self._emitted + local.length)
        self._acc[..., sl] += self._weight[:local.length] * out
        self._wsum[sl] += self._weight[:local.length]

    def _emit_upto(self, upto: int) -> np.ndarray:
        upto = min(upto, self._emitted + self._acc.shape[-1])
        n = upto - self._emitted
        if n <= 0:
            return np.zeros(
                (self._n_sources, self.model.audio_channels, 0), np.float32)
        w = self._wsum[:n]
        assert w.min() > 0, "emitting samples with incomplete coverage"
        out = self._acc[..., :n] / w
        self._acc = self._acc[..., n:]
        self._wsum = self._wsum[n:]
        self._emitted = upto
        # drop mix samples no longer needed: the next segment's centered
        # padding can reach back up to its leaf target before next_offset
        keep_from = max(self._base, self._next_offset - self._lookback)
        if keep_from > self._base:
            self._mix = self._mix[..., keep_from - self._base:]
            self._base = keep_from
        return out

    # --------------------------------------------------------------- surface

    def feed(self, chunk: np.ndarray) -> np.ndarray:
        """Append ``(C, n)`` samples; return all newly-final stems
        ``(S, C, m)`` (possibly m == 0)."""
        assert not self._closed, "stream already flushed"
        chunk = np.asarray(chunk, np.float32)
        assert chunk.ndim == 2 and chunk.shape[0] == self.model.audio_channels
        self._mix = np.concatenate([self._mix, chunk[None]], axis=-1)
        self._fed += chunk.shape[-1]

        while (self._next_offset + self.segment_length + self._ahead
               <= self._fed):
            self._process_segment(self._next_offset, self.segment_length)
            self._next_offset += self.stride
        # a sample t is final once every overlapping offset (<= t) is done
        return self._emit_upto(min(self._next_offset, self._fed))

    def flush(self) -> np.ndarray:
        """End of stream: process the remaining (short) tail segments and
        return the rest of the stems."""
        assert not self._closed, "stream already flushed"
        self._closed = True
        while self._next_offset < self._fed:
            self._process_segment(
                self._next_offset, min(self.segment_length,
                                       self._fed - self._next_offset))
            self._next_offset += self.stride
        return self._emit_upto(self._fed)
