"""High-level separation API (behavioral ref: ``demucs/api.py``).

``Separator`` holds a model + separation parameters; arrays are numpy on the
host, device execution handled by the inference engine. The callback protocol
and the ``NotProvided`` update sentinel match the reference.
"""

from __future__ import annotations

import typing as tp
from pathlib import Path

import numpy as np

from demucs_tpu.audio import convert_audio, ffmpeg_available, read_audio, save_audio  # noqa: F401
from demucs_tpu.inference.apply import apply_model, apply_model_tracks
from demucs_tpu.zoo.pretrained import get_model, make_repo


class LoadAudioError(Exception):
    pass


class LoadModelError(Exception):
    pass


class _NotProvided:
    pass


NotProvided = _NotProvided()


def _resolve_device(device: str):
    """Map a reference-style ``device`` name to a JAX device (or None for
    "auto"). "cpu" forces CPU execution via a ``jax.default_device`` scope;
    unavailable backends raise instead of being silently ignored."""
    if device in (None, "auto"):
        return None
    import jax

    platform = {"cuda": "gpu"}.get(device, device)
    try:
        return jax.devices(platform)[0]
    except RuntimeError as err:
        raise ValueError(
            f"device {device!r} is not available in this JAX install: {err}"
        ) from err


def _apply_precision(model, compute_dtype: tp.Optional[str],
                     matmul_precision: tp.Optional[str] = None):
    """Re-config a loaded model (or bag) with a compute-dtype / MXU matmul
    precision policy (the presets ladder, demucs_tpu/presets.py).

    ``matmul_precision`` (balanced/quality presets) applies to every family;
    ``compute_dtype`` (the bf16-storage fast preset) exists only on HTDemucs
    — a loud warning is emitted when it cannot take effect, so the preset
    banner's quality contract is never silently wrong for a family."""
    import dataclasses
    import warnings

    from demucs_tpu.models.registry import BagOfModels, Model

    def one(m):
        delta = {}
        if compute_dtype:
            if hasattr(m.cfg, "compute_dtype"):
                if m.cfg.compute_dtype != compute_dtype:
                    delta["compute_dtype"] = compute_dtype
            else:
                warnings.warn(
                    f"compute_dtype={compute_dtype!r} has no effect on "
                    f"{m.kind!r} models (only HTDemucs has the bf16-storage "
                    "knob); this member keeps its default numerics",
                    stacklevel=3)
        if matmul_precision:
            if hasattr(m.cfg, "matmul_precision"):
                if m.cfg.matmul_precision != matmul_precision:
                    delta["matmul_precision"] = matmul_precision
            else:
                warnings.warn(
                    f"matmul_precision={matmul_precision!r} has no effect on "
                    f"{m.kind!r} models; this member keeps its default "
                    "numerics", stacklevel=3)
        if delta:
            return Model(m.kind, dataclasses.replace(m.cfg, **delta), m.params)
        return m

    if isinstance(model, BagOfModels):
        return BagOfModels([one(m) for m in model.models], model.weights)
    return one(model)


def _device_scope(jax_device):
    if jax_device is None:
        import contextlib

        return contextlib.nullcontext()
    import jax

    return jax.default_device(jax_device)


class Separator:
    # Class-level defaults for the beyond-reference knobs: a Separator built
    # the reference way (object.__new__ + update_parameter with only the
    # reference's parameters — api parity tests do this) stays functional.
    _batch_size = 16
    _engine = "auto"
    _transfer_dtype = None
    _length_bucket_seconds = None
    _tail_mode = "exact"
    _bag_mode = "auto"
    _compute_dtype = None
    _matmul_precision = None
    _shift_offsets = None

    def __init__(
        self,
        model: str = "htdemucs",
        repo: tp.Optional[Path] = None,
        device: str = "auto",
        shifts: int = 1,
        overlap: float = 0.25,
        split: bool = True,
        segment: tp.Optional[int] = None,
        jobs: int = 0,
        progress: bool = False,
        callback: tp.Optional[tp.Callable[[dict], None]] = None,
        callback_arg: tp.Optional[dict] = None,
        batch_size: int = 16,
        engine: str = "auto",
        transfer_dtype: tp.Optional[str] = None,
        length_bucket_seconds: tp.Optional[float] = None,
        tail_mode: str = "exact",
        bag_mode: str = "auto",
        compute_dtype: tp.Optional[str] = None,
        matmul_precision: tp.Optional[str] = None,
        shift_offsets: tp.Optional[tp.Sequence[int]] = None,
    ):
        """Load a model by name and hold separation parameters.

        Parameters mirror ``demucs/api.py:53-122`` (``jobs`` is accepted for
        compatibility; parallelism comes from segment batching, tuned with
        ``batch_size``). ``device``: "auto" (default) lets JAX place work on
        the best available backend; "cpu" forces CPU execution; any other
        name must match an available JAX backend or loading raises.
        ``transfer_dtype`` defaults to bit-exact (None) on every backend;
        pass "float16"/"int16"/"int8" to trade wire bytes for sub-PCM16
        error on slow host links (the CLI's ``--wire auto`` does).
        """
        self._name = model
        self._repo = repo
        self._compute_dtype = compute_dtype
        self._matmul_precision = matmul_precision
        self._load_model()
        self.update_parameter(
            device=device, shifts=shifts, overlap=overlap, split=split,
            segment=segment, jobs=jobs, progress=progress, callback=callback,
            callback_arg=callback_arg, batch_size=batch_size, engine=engine,
            transfer_dtype=transfer_dtype,
            length_bucket_seconds=length_bucket_seconds,
            tail_mode=tail_mode,
            bag_mode=bag_mode,
            shift_offsets=shift_offsets,
        )

    def update_parameter(
        self,
        device=NotProvided,
        shifts=NotProvided,
        overlap=NotProvided,
        split=NotProvided,
        segment=NotProvided,
        jobs=NotProvided,
        progress=NotProvided,
        callback=NotProvided,
        callback_arg=NotProvided,
        batch_size=NotProvided,
        engine=NotProvided,
        transfer_dtype=NotProvided,
        length_bucket_seconds=NotProvided,
        tail_mode=NotProvided,
        bag_mode=NotProvided,
        shift_offsets=NotProvided,
    ):
        """Update separation parameters (api.py:124-201)."""
        if not isinstance(device, _NotProvided):
            self._device = device
            self._jax_device = _resolve_device(device)
        if not isinstance(shifts, _NotProvided):
            self._shifts = shifts
        if not isinstance(overlap, _NotProvided):
            self._overlap = overlap
        if not isinstance(split, _NotProvided):
            self._split = split
        if not isinstance(segment, _NotProvided):
            self._segment = segment
        if not isinstance(jobs, _NotProvided):
            self._jobs = jobs
        if not isinstance(progress, _NotProvided):
            self._progress = progress
        if not isinstance(callback, _NotProvided):
            self._callback = callback
        if not isinstance(callback_arg, _NotProvided):
            self._callback_arg = callback_arg
        if not isinstance(batch_size, _NotProvided):
            self._batch_size = batch_size
        if not isinstance(engine, _NotProvided):
            self._engine = engine
        if not isinstance(transfer_dtype, _NotProvided):
            self._transfer_dtype = transfer_dtype
        if not isinstance(length_bucket_seconds, _NotProvided):
            self._length_bucket_seconds = length_bucket_seconds
        if not isinstance(tail_mode, _NotProvided):
            self._tail_mode = tail_mode
        if not isinstance(bag_mode, _NotProvided):
            self._bag_mode = bag_mode
        if not isinstance(shift_offsets, _NotProvided):
            self._shift_offsets = (tuple(int(o) for o in shift_offsets)
                                   if shift_offsets is not None else None)

    def _load_model(self):
        self._model = get_model(name=self._name, repo=self._repo)
        if self._model is None:
            raise LoadModelError("Failed to load model")
        if (getattr(self, "_compute_dtype", None)
                or getattr(self, "_matmul_precision", None)):
            self._model = _apply_precision(
                self._model, getattr(self, "_compute_dtype", None),
                getattr(self, "_matmul_precision", None))
        self._audio_channels = self._model.audio_channels
        self._samplerate = self._model.samplerate

    def _load_audio(self, track: Path) -> np.ndarray:
        try:
            wav, _sr = read_audio(track, samplerate=self._samplerate,
                                  channels=self._audio_channels)
        except (RuntimeError, OSError, ValueError) as err:
            raise LoadAudioError(f"Could not load file {track}: {err}")
        return wav

    def separate_tensor(
        self, wav: np.ndarray, sr: tp.Optional[int] = None
    ) -> tp.Tuple[np.ndarray, tp.Dict[str, np.ndarray]]:
        """Separate a loaded ``(C, T)`` float32 array (api.py:241-291).

        Returns ``(resampled original, {stem: wav})``.
        """
        wav = np.asarray(wav, dtype=np.float32)
        if sr is not None and sr != self.samplerate:
            wav = convert_audio(wav, sr, self._samplerate, self._audio_channels)
        ref = wav.mean(axis=0)
        mean, std = ref.mean(), ref.std()
        wav = (wav - mean) / (std + 1e-8)
        callback_arg = dict(self._callback_arg or {})
        callback_arg["audio_length"] = wav.shape[1]
        with _device_scope(self._jax_device):
            out = apply_model(
                self._model,
                wav[None],
                segment=self._segment,
                shifts=self._shifts,
                split=self._split,
                overlap=self._overlap,
                callback=self._callback,
                callback_arg=callback_arg,
                progress=self._progress,
                batch_size=self._batch_size,
                engine=self._engine,
                transfer_dtype=self._transfer_dtype,
                length_bucket_seconds=self._length_bucket_seconds,
                tail_mode=self._tail_mode,
                bag_mode=getattr(self, "_bag_mode", "auto"),
                shift_offsets=getattr(self, "_shift_offsets", None),
            )
        out = out * (std + 1e-8) + mean
        wav = wav * (std + 1e-8) + mean
        return (wav, dict(zip(self._model.sources, out[0])))

    def separate_audio_file(self, file: Path):
        """Read + separate a file -> ``(origin, {stem: wav})`` (api.py:293-307)."""
        return self.separate_tensor(self._load_audio(file), self.samplerate)

    def separate_audio_files(self, files: tp.Iterable[Path]):
        """Pipelined multi-file separation: yields ``(file, origin, {stem:
        wav})`` per file, in order.

        On the device engine each track's stems fetch overlaps the next
        track's compute (and the next file's decode happens while the device
        works), so batch separation approaches max(compute, wire) per track
        instead of their sum. Numerics identical to ``separate_audio_file``.
        The per-chunk callback protocol is not threaded through here —
        raises when a callback is configured (use ``separate_audio_file``).
        """
        if self._callback is not None:
            raise ValueError(
                "separate_audio_files does not invoke per-chunk callbacks; "
                "use separate_audio_file per file, or clear the callback via "
                "update_parameter(callback=None)")
        meta: tp.List[tuple] = []
        load_error: tp.List[BaseException] = []

        def _mixes():
            for file in files:
                try:
                    wav = self._load_audio(file)
                except Exception as exc:  # noqa: BLE001 — re-raised below
                    # Stop feeding the pipeline but let already-dispatched
                    # tracks drain (their stems are yielded before the error
                    # surfaces — a mid-batch corrupt file must not discard
                    # finished separations).
                    load_error.append(exc)
                    return
                ref = wav.mean(axis=0)
                mean, std = ref.mean(), ref.std()
                meta.append((file, wav, mean, std))
                yield ((wav - mean) / (std + 1e-8))[None]

        it = apply_model_tracks(
            self._model, _mixes(),
            segment=self._segment, shifts=self._shifts, split=self._split,
            overlap=self._overlap, progress=self._progress,
            batch_size=self._batch_size, engine=self._engine,
            transfer_dtype=self._transfer_dtype,
            length_bucket_seconds=self._length_bucket_seconds,
            tail_mode=self._tail_mode,
            bag_mode=getattr(self, "_bag_mode", "auto"),
            shift_offsets=getattr(self, "_shift_offsets", None),
        )
        # Enter the device scope only around each next(): holding it across
        # `yield` would leak the thread-local default device into whatever
        # JAX work the caller does between tracks (or forever, if they stop
        # iterating early).
        i = 0
        while True:
            with _device_scope(self._jax_device):
                try:
                    out = next(it)
                except StopIteration:
                    break
            file, wav, mean, std = meta[i]
            meta[i] = None  # release the decoded waveform (~85 MB / 4-min track)
            i += 1
            out = out * (std + 1e-8) + mean
            yield file, wav, dict(zip(self._model.sources, out[0]))
        if load_error:
            raise load_error[0]

    def prewarm(self, durations, verbose: bool = False):
        """Compile + load every executable this Separator's configuration
        needs for tracks of the given duration(s), before traffic.

        Serving context (docs/api.md "Serving guidance"): on this TPU
        deployment a NEW executable's first load costs ~25-300 s through the
        relay; exact-tail kinds additionally compile per shift offset, so a
        first request can stall minutes. Configure ``shift_offsets`` (a
        pinned set consumed in order instead of random draws — identical
        exact-tails numerics) plus ``length_bucket_seconds``, then call
        ``prewarm`` with the expected bucket lengths: every pass/tail/
        normalize/wire program loads now, and requests hit only warm
        executables. Returns the per-duration report from
        ``demucs_tpu.inference.prewarm.prewarm`` (``tails_warmed=False``
        flags a configuration whose tail programs cannot be bounded —
        random shifts on exact-tail kinds)."""
        from demucs_tpu.inference.prewarm import prewarm as _prewarm

        with _device_scope(self._jax_device):
            return _prewarm(
                self._model, durations,
                shifts=self._shifts,
                shift_offsets=getattr(self, "_shift_offsets", None),
                overlap=self._overlap, segment=self._segment,
                batch_size=self._batch_size, engine=self._engine,
                transfer_dtype=self._transfer_dtype,
                length_bucket_seconds=self._length_bucket_seconds,
                tail_mode=self._tail_mode,
                bag_mode=getattr(self, "_bag_mode", "auto"), verbose=verbose,
            )

    @property
    def samplerate(self):
        return self._samplerate

    @property
    def audio_channels(self):
        return self._audio_channels

    @property
    def model(self):
        return self._model


def list_models(repo: tp.Optional[Path] = None) -> tp.Dict[str, tp.Dict[str, tp.Any]]:
    """{"single": ..., "bag": ...} model listing (api.py:322-346)."""
    any_repo = make_repo(repo)
    return {
        "single": any_repo.model_repo.list_model(),
        "bag": any_repo.bag_repo.list_model(),
    }


if __name__ == "__main__":
    # API self-test CLI (reference api.py:349-392); two-stem not supported.
    from pathlib import Path

    from demucs_tpu.separate import get_parser

    args = get_parser().parse_args()
    name = args.sig if getattr(args, "sig", None) else args.name
    separator = Separator(
        model=name,
        repo=args.repo,
        device=args.device,
        shifts=args.shifts,
        overlap=args.overlap,
        split=args.split,
        segment=args.segment,
        jobs=args.jobs,
        callback=print,
    )
    out = args.out / name
    out.mkdir(parents=True, exist_ok=True)
    for file in args.tracks:
        separated = separator.separate_audio_file(file)[1]
        ext = "mp3" if args.mp3 else ("flac" if args.flac else "wav")
        kwargs = {
            "samplerate": separator.samplerate,
            "bitrate": args.mp3_bitrate,
            "clip": args.clip_mode,
            "as_float": args.float32,
            "bits_per_sample": 24 if args.int24 else 16,
        }
        for stem, source in separated.items():
            stem_path = out / args.filename.format(
                track=Path(file).name.rsplit(".", 1)[0],
                trackext=Path(file).name.rsplit(".", 1)[-1],
                stem=stem,
                ext=ext,
            )
            stem_path.parent.mkdir(parents=True, exist_ok=True)
            save_audio(source, str(stem_path), **kwargs)
