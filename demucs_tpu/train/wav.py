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


def _track_metadata(track: Path, sources, normalize=True, ext=EXT) -> dict:
    track_length = None
    track_samplerate = None
    mean = 0.0
    std = 1.0
    for source in list(sources) + [MIXTURE]:
        file = track / f"{source}{ext}"
        if source == MIXTURE and not file.exists():
            # Synthesize mixture by summing stems (wav.py:37-46).
            audio = None
            sr = None
            for sub_source in sources:
                sub_audio, sr = dta.read_wav(track / f"{sub_source}{ext}")
                audio = sub_audio if audio is None else audio + sub_audio
            dta.write_wav(file, audio, sr, as_float=True)

        info = dta.wav_info(file)
        length = info["frames"]
        if track_length is None:
            track_length = length
            track_samplerate = info["samplerate"]
        elif track_length != length:
            raise ValueError(
                f"Invalid length for file {file}: "
                f"expecting {track_length} but got {length}.")
        elif info["samplerate"] != track_samplerate:
            raise ValueError(
                f"Invalid sample rate for file {file}: "
                f"expecting {track_samplerate} but got {info['samplerate']}.")
        if source == MIXTURE and normalize:
            wav, _ = dta.read_wav(file)
            mono = wav.mean(0)
            mean = float(mono.mean())
            # torch .std() is unbiased (ddof=1, wav.py:72) — the cached
            # metadata normalization must match the reference's
            std = float(mono.std(ddof=1))
    return {"length": track_length, "mean": mean, "std": std,
            "samplerate": track_samplerate}


def build_metadata(path, sources, normalize=True, ext=EXT) -> dict:
    """Walk a dataset dir and build the Wavset metadata (wav.py:78-104)."""
    meta = {}
    path = Path(path)
    pendings = []
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(8) as pool:
        for root, folders, files in os.walk(path, followlinks=True):
            root = Path(root)
            if root.name.startswith(".") or folders or root == path:
                continue
            name = str(root.relative_to(path))
            pendings.append((name, pool.submit(_track_metadata, root, sources, normalize, ext)))
        for name, pending in pendings:
            meta[name] = pending.result()
    return meta


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
        self.num_examples = []
        for name, meta in self.metadata.items():
            track_duration = meta["length"] / meta["samplerate"]
            if segment is None or track_duration < segment:
                examples = 1
            else:
                examples = int(math.ceil((track_duration - self.segment) / self.shift) + 1)
            self.num_examples.append(examples)

    def __len__(self):
        return sum(self.num_examples)

    def get_file(self, name, source) -> Path:
        return self.root / name / f"{source}{self.ext}"

    def __getitem__(self, index: int) -> np.ndarray:
        for name, examples in zip(self.metadata, self.num_examples):
            if index >= examples:
                index -= examples
                continue
            meta = self.metadata[name]
            num_frames = None
            offset = 0
            if self.segment is not None:
                offset = int(meta["samplerate"] * self.shift * index)
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
        raise IndexError(index)


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
