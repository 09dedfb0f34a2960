"""Wav-folder datasets (MusdbHQ-style), host-side numpy.

Behavioral reference: ``demucs/wav.py`` — per-track folders of
``{source}.wav``; metadata cache with per-track length/samplerate/mean/std
(mixture synthesized by summing stems if missing); (segment, shift)-strided
example indexing; on-the-fly channel/rate conversion and track-level
normalization. torchaudio seek-reads are replaced by the native WAV codec's
frame-window reads (demucs_tpu.audio.read_wav).
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import typing as tp
from collections import OrderedDict
from pathlib import Path

import numpy as np

from demucs_tpu import audio as dta
from demucs_tpu.train import distrib

MIXTURE = "mixture"
EXT = ".wav"


def _synth_mixture(track: Path, sources, ext: str) -> None:
    """Write ``mixture.wav`` as the float sum of the stems (the reference
    synthesizes it when a dataset ships stems only, wav.py:37-46)."""
    total = None
    sr = None
    for source in sources:
        stem, sr = dta.read_wav(track / f"{source}{ext}")
        total = stem if total is None else total + stem
    dta.write_wav(track / f"{MIXTURE}{ext}", total, sr, as_float=True)


def _track_metadata(track: Path, sources, normalize=True, ext=EXT) -> dict:
    """Per-track cache entry: frames / samplerate shared by every stem
    (validated), plus the mixture's mono mean/std for track normalization
    (unbiased std — torch ``.std()`` semantics, wav.py:72)."""
    out = {"length": None, "samplerate": None, "mean": 0.0, "std": 1.0}
    for source in list(sources) + [MIXTURE]:
        file = track / f"{source}{ext}"
        if source == MIXTURE and not file.exists():
            _synth_mixture(track, sources, ext)
        info = dta.wav_info(file)
        if out["length"] is None:
            out["length"] = info["frames"]
            out["samplerate"] = info["samplerate"]
        elif info["frames"] != out["length"]:
            raise ValueError(
                f"stem length mismatch in {file}: {info['frames']} frames "
                f"where the track's other stems have {out['length']}")
        elif info["samplerate"] != out["samplerate"]:
            raise ValueError(
                f"stem sample-rate mismatch in {file}: {info['samplerate']} "
                f"where the track's other stems have {out['samplerate']}")
        if source == MIXTURE and normalize:
            mono = dta.read_wav(file)[0].mean(0)
            out["mean"] = float(mono.mean())
            out["std"] = float(mono.std(ddof=1))
    return out


def _leaf_track_dirs(path: Path) -> tp.Iterator[Path]:
    """Yield track directories: non-hidden LEAF dirs below ``path`` (a track
    folder holds only stem files; symlinks followed, like the reference's
    walk, wav.py:82-90)."""
    for root, folders, _files in os.walk(path, followlinks=True):
        root = Path(root)
        if root == path or folders or root.name.startswith("."):
            continue
        yield root


def build_metadata(path, sources, normalize=True, ext=EXT) -> dict:
    """Scan a dataset dir into the Wavset metadata cache (wav.py:78-104);
    per-track scans run on a thread pool (host IO bound)."""
    from concurrent.futures import ThreadPoolExecutor

    path = Path(path)
    with ThreadPoolExecutor(8) as pool:
        jobs = [(str(d.relative_to(path)),
                 pool.submit(_track_metadata, d, sources, normalize, ext))
                for d in _leaf_track_dirs(path)]
        return {name: job.result() for name, job in jobs}


class Wavset:
    """Folder-of-stems dataset with strided segment windows (wav.py:107-184)."""

    def __init__(self, root, metadata, sources, segment=None, shift=None,
                 normalize=True, samplerate=44100, channels=2, ext=EXT):
        self.root = Path(root)
        self.metadata = OrderedDict(metadata)
        self.segment = segment
        self.shift = shift or segment
        self.normalize = normalize
        self.sources = list(sources)
        self.channels = channels
        self.samplerate = samplerate
        self.ext = ext
        # examples per track: strided (segment, shift) windows; a track
        # shorter than one segment still yields one (padded) example —
        # reference indexing law, wav.py:128-135
        self.num_examples = [
            1 if segment is None or m["length"] / m["samplerate"] < segment
            else int(math.ceil(
                (m["length"] / m["samplerate"] - segment) / self.shift) + 1)
            for m in self.metadata.values()
        ]
        # cumulative bounds let __getitem__ locate the owning track with one
        # searchsorted instead of the reference's subtraction walk
        self._bounds = np.cumsum([0] + self.num_examples)
        self._names = list(self.metadata)

    def __len__(self):
        return int(self._bounds[-1])

    def get_file(self, name, source) -> Path:
        return self.root / name / f"{source}{self.ext}"

    def __getitem__(self, index: int) -> np.ndarray:
        if not 0 <= index < len(self):
            raise IndexError(index)
        track_i = int(np.searchsorted(self._bounds, index, side="right")) - 1
        name = self._names[track_i]
        window = index - int(self._bounds[track_i])
        meta = self.metadata[name]
        num_frames = None
        offset = 0
        if self.segment is not None:
            offset = int(meta["samplerate"] * self.shift * window)
            num_frames = int(math.ceil(meta["samplerate"] * self.segment))
        example = None
        if num_frames is not None and self.ext == EXT:
            # GIL-free C++ decode when the native runtime is built
            # (demucs_tpu/native.py; zero-pads + channel-converts in C++).
            from demucs_tpu import native

            if native.available():
                # Request only the frames that exist: tail padding must
                # happen AFTER normalization (below) so padded samples are
                # true zeros, exactly like the Python path / the
                # reference (demucs/wav.py:163-184).
                avail = max(0, int(meta["length"]) - offset)
                want = min(num_frames, avail)
                parts = [
                    native.read_wav_window(self.get_file(name, source),
                                           offset, want, self.channels)
                    for source in self.sources
                ] if want > 0 else None
                if parts is not None and all(p is not None for p in parts):
                    example = np.stack(parts)
        if example is None:
            wavs = []
            for source in self.sources:
                wav, _ = dta.read_wav(self.get_file(name, source),
                                      frame_offset=offset, num_frames=num_frames)
                wav = dta.convert_audio_channels(wav, self.channels)
                wavs.append(wav)
            example = np.stack(wavs)  # (S, C, T)
        example = dta.resample(example, meta["samplerate"], self.samplerate)
        if self.normalize:
            example = (example - meta["mean"]) / meta["std"]
        if self.segment:
            length = int(self.segment * self.samplerate)
            example = example[..., :length]
            pad = length - example.shape[-1]
            if pad:
                example = np.pad(example, [(0, 0)] * (example.ndim - 1) + [(0, pad)])
        return example.astype(np.float32)


# The MUSDB18 train/valid split, from the musdb package's mus.yaml
# (validation_tracks). Inlined so training works without the musdb package;
# pass `valid_tracks` to override.
MUSDB_VALID_TRACKS = (
    "Actions - One Minute Smile",
    "Clara Berry And Wooldog - Waltz For My Victims",
    "Johnny Lokke - Promises & Lies",
    "Patrick Talbot - A Reason To Leave",
    "Triviul - Angelsaint",
    "Alexander Ross - Goodbye Bolero",
    "Fergessen - Nos Palpitants",
    "Leaf - Summerghost",
    "Skelpolu - Human Mistakes",
    "Young Griffo - Pennies",
    "ANiMAL - Rockshow",
    "James May - On The Line",
    "Meaxic - Take A Step",
    "Traffic Experiment - Sirens",
)


def _get_musdb_valid() -> tp.Sequence[str]:
    try:
        import musdb
        import yaml

        setup_path = Path(musdb.__path__[0]) / "configs" / "mus.yaml"
        setup = yaml.safe_load(open(setup_path))
        return setup["validation_tracks"]
    except ImportError:
        return MUSDB_VALID_TRACKS


def _cached_metadata(metadata_file: Path, root: Path, sources) -> dict:
    if not metadata_file.is_file() and distrib.rank() == 0:
        metadata_file.parent.mkdir(exist_ok=True, parents=True)
        metadata = build_metadata(root, sources)
        json.dump(metadata, open(metadata_file, "w"))
    distrib.barrier()
    return json.load(open(metadata_file))


def get_musdb_wav_datasets(args) -> tp.Tuple[Wavset, Wavset]:
    """MusdbHQ train/valid split (wav.py:224-254)."""
    sig = hashlib.sha1(str(args.musdb).encode()).hexdigest()[:8]
    metadata_file = Path(args.metadata) / ("musdb_" + sig + ".json")
    root = Path(args.musdb) / "train"
    metadata = _cached_metadata(metadata_file, root, args.sources)

    valid_tracks = getattr(args, "valid_tracks", None) or _get_musdb_valid()
    if args.train_valid:
        metadata_train = metadata
    else:
        metadata_train = {n: m for n, m in metadata.items() if n not in valid_tracks}
    metadata_valid = {n: m for n, m in metadata.items() if n in valid_tracks}
    kw_cv = {} if args.full_cv else {"segment": args.segment, "shift": args.shift}
    train_set = Wavset(root, metadata_train, args.sources,
                       segment=args.segment, shift=args.shift,
                       samplerate=args.samplerate, channels=args.channels,
                       normalize=args.normalize)
    valid_set = Wavset(root, metadata_valid, [MIXTURE] + list(args.sources),
                       samplerate=args.samplerate, channels=args.channels,
                       normalize=args.normalize, **kw_cv)
    return train_set, valid_set


def get_wav_datasets(args, name="wav") -> tp.Tuple[Wavset, Wavset]:
    """Extra wav dataset pair (wav.py:187-213)."""
    path = getattr(args, name)
    sig = hashlib.sha1(str(path).encode()).hexdigest()[:8]
    metadata_file = Path(args.metadata) / ("wav_" + sig + ".json")
    train_path = Path(path) / "train"
    valid_path = Path(path) / "valid"
    if not metadata_file.is_file() and distrib.rank() == 0:
        metadata_file.parent.mkdir(exist_ok=True, parents=True)
        train = build_metadata(train_path, args.sources)
        valid = build_metadata(valid_path, args.sources)
        json.dump([train, valid], open(metadata_file, "w"))
    distrib.barrier()
    train, valid = json.load(open(metadata_file))
    kw_cv = {} if args.full_cv else {"segment": args.segment, "shift": args.shift}
    train_set = Wavset(train_path, train, args.sources,
                       segment=args.segment, shift=args.shift,
                       samplerate=args.samplerate, channels=args.channels,
                       normalize=args.normalize)
    valid_set = Wavset(valid_path, valid, [MIXTURE] + list(args.sources),
                       samplerate=args.samplerate, channels=args.channels,
                       normalize=args.normalize, **kw_cv)
    return train_set, valid_set
