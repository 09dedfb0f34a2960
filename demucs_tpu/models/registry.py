"""Model handles: uniform wrapper over the functional model families.

``Model`` pairs a config dataclass + param pytree with the metadata surface the
reference exposes on its nn.Modules (``sources``, ``samplerate``,
``audio_channels``, ``segment``, ``valid_length``) — see
``demucs/apply.py:26`` ("Model" union) and ``demucs/apply.py:29-79``
(BagOfModels).
"""

from __future__ import annotations

import dataclasses
import functools
import typing as tp

import jax


def _forward_fns():
    # no ImportError guards: all three modules are first-party — swallowing
    # a genuine import failure inside one of them would resurface later as a
    # bare KeyError with the root cause lost
    from demucs_tpu.models import htdemucs as m_ht

    from demucs_tpu.models import demucs as m_d
    from demucs_tpu.models import hdemucs as m_h

    fns = {"htdemucs": m_ht.forward, "hdemucs": m_h.forward,
           "demucs": m_d.forward}
    return fns


@functools.lru_cache(maxsize=None)
def jitted_forward(kind: str, cfg) -> tp.Callable:
    """Jitted eval-mode forward ``(params, mix (B,C,L)) -> (B,S,C,L)``."""
    fwd = _forward_fns()[kind]
    return jax.jit(lambda params, mix: fwd(params, mix, cfg))


@dataclasses.dataclass
class Model:
    kind: str  # "htdemucs" | "hdemucs" | "demucs"
    cfg: tp.Any
    params: tp.Any

    # --- metadata surface matching the reference models ---
    @property
    def sources(self) -> tp.Tuple[str, ...]:
        return tuple(self.cfg.sources)

    @property
    def samplerate(self) -> int:
        return self.cfg.samplerate

    @property
    def audio_channels(self) -> int:
        return self.cfg.audio_channels

    @property
    def segment(self) -> float:
        return float(self.cfg.segment)

    @segment.setter
    def segment(self, value: float) -> None:
        self.cfg = dataclasses.replace(self.cfg, segment=value)

    @property
    def uses_train_segment(self) -> bool:
        return self.kind == "htdemucs" and getattr(self.cfg, "use_train_segment", False)

    def valid_length(self, length: int) -> int:
        """Leaf padding target (apply.py:302-309 dispatch)."""
        if self.kind == "htdemucs":
            if self.cfg.use_train_segment:
                training_length = int(self.cfg.segment * self.cfg.samplerate)
                if training_length < length:
                    raise ValueError(
                        f"Given length {length} is longer than training length "
                        f"{training_length}"
                    )
                return training_length
            return length
        if self.kind == "demucs":
            from demucs_tpu.models.demucs import valid_length as v2_valid_length

            return v2_valid_length(self.cfg, length)
        return length  # hdemucs has no valid_length — processes natural lengths

    def leaf_target(self, length: int, segment: tp.Optional[float]) -> int:
        """Leaf padding target given an optional explicit segment override
        (reference apply.py:303-309): an explicit ``segment`` caps the
        HTDemucs target at ``int(segment*samplerate)`` — the forward then
        right-zero-pads itself to the training length — otherwise
        ``valid_length(length)`` decides."""
        if self.kind == "htdemucs" and segment is not None:
            return int(segment * self.samplerate)
        return self.valid_length(length)

    def forward_fn(self) -> tp.Callable:
        return jitted_forward(self.kind, self.cfg)


class BagOfModels:
    """Weighted ensemble (apply.py:29-79)."""

    def __init__(
        self,
        models: tp.Sequence[Model],
        weights: tp.Optional[tp.Sequence[tp.Sequence[float]]] = None,
        segment: tp.Optional[float] = None,
    ):
        assert len(models) > 0
        first = models[0]
        for other in models:
            assert other.sources == first.sources
            assert other.samplerate == first.samplerate
            assert other.audio_channels == first.audio_channels
            if segment is not None:
                # the reference never overrides ANY HTDemucs (apply.py:53-55
                # checks isinstance, not use_train_segment), so an
                # htdemucs(use_train_segment=False) keeps its own segment
                # and max_allowed_segment stays honest
                if other.kind != "htdemucs" and segment > other.segment:
                    other.segment = segment

        self.audio_channels = first.audio_channels
        self.samplerate = first.samplerate
        self.sources = first.sources
        self.models = list(models)
        if weights is None:
            weights = [[1.0] * len(first.sources) for _ in models]
        else:
            assert len(weights) == len(models)
            for weight in weights:
                assert len(weight) == len(first.sources)
        self.weights = [list(w) for w in weights]

    @property
    def max_allowed_segment(self) -> float:
        out = float("inf")
        for model in self.models:
            if model.kind == "htdemucs":
                out = min(out, float(model.segment))
        return out


AnyModel = tp.Union[Model, BagOfModels]
