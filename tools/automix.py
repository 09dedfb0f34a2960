"""Automix: build realistic training mixes from stems of different songs.

Behavioral reference: ``tools/automix.py`` in the reference — beat-track each
track (librosa), build chroma pitch histograms from the bass line, match
stems across songs within 15% tempo / 3 semitones, repitch/retempo
(soundstretch), align first beats on a 5 ms gaussian grid, and write remixed
track folders usable by the Wavset layer.

Host-side numpy throughout. librosa / soundstretch are used when installed
(matching the reference); otherwise the native fallbacks take over
(demucs_tpu.ops.beats for beat tracking + chroma, demucs_tpu.ops.timestretch
WSOLA for repitch/retempo) so the tool runs with zero extra dependencies.

Usage:
    python tools/automix.py --musdb /path/to/musdbhq --out /path/to/automix
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import argparse
import hashlib
import pickle
import random
import shutil
from collections import namedtuple
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import numpy as np

from demucs_tpu.audio import save_audio
from demucs_tpu.train.repitch import repitch
from demucs_tpu.train.wav import MUSDB_VALID_TRACKS, Wavset, build_metadata
from demucs_tpu.zoo.pretrained import SOURCES

CHANNELS = 2
SR = 44100
MAX_PITCH = 3   # semitones
MAX_TEMPO = 0.15

Spec = namedtuple("Spec", "tempo onsets kr track index")


def rms(wav: np.ndarray, window: int = 10000) -> np.ndarray:
    """Windowed RMS per sample (automix.py:50-56)."""
    half = window // 2
    window = 2 * half + 1
    wav = np.pad(wav, (half, half))
    tot = np.cumsum(wav**2, axis=-1)
    return np.sqrt((tot[..., window - 1 :] - tot[..., : -window + 1]) / window)


def analyse_track(dset, index, cache_dir: Path):
    """Extract BPM + bass chroma histogram (automix.py:59-101).

    Uses librosa when installed (reference behavior), else the native beat
    tracker / STFT chroma (demucs_tpu.ops.beats)."""
    try:
        from librosa.beat import beat_track
        from librosa.feature import chroma_cqt
    except ImportError:
        from demucs_tpu.ops.beats import beat_track as _bt, chroma_stft

        def beat_track(y, units, sr):
            return _bt(y, sr, units=units)

        def chroma_cqt(y, sr):
            return chroma_stft(y, sr)

    track = dset[index]
    mix = track.sum(0).mean(0)
    ref = mix.std()
    starts = int(np.argmax(np.abs(mix) >= 1e-2 * ref))
    track = track[..., starts:]

    cache = cache_dir / dset.sig
    cache.mkdir(exist_ok=True, parents=True)
    cache_file = cache / f"{index}.pkl"
    if cache_file.exists():
        tempo, events, hist_kr = pickle.load(open(cache_file, "rb"))
    else:
        drums = track[0].mean(0)
        if drums.std() > 1e-2 * ref:
            tempo, events = beat_track(y=drums, units="time", sr=SR)
        else:
            return None, track
        bass = track[1].mean(0)
        r = rms(bass)
        mask = r >= 0.05 * r.max()
        bass = bass[mask]
        if bass.std() > 1e-2 * ref:
            kr = chroma_cqt(y=bass, sr=SR)
            hist_kr = (kr.max(axis=0, keepdims=True) == kr).astype(np.float32).mean(1)
        else:
            return None, track
        pickle.dump([tempo, events, hist_kr], open(cache_file, "wb"))
    return Spec(float(np.atleast_1d(tempo)[0]), events, hist_kr, track, index), None


def best_pitch_shift(kr_a: np.ndarray, kr_b: np.ndarray) -> int:
    """Best circular chroma alignment (automix.py:104-114)."""
    deltas = []
    for _ in range(12):
        deltas.append(float(np.abs(kr_a - kr_b).mean()))
        kr_b = np.roll(kr_b, 1, axis=0)
    ps = int(np.argmin(deltas))
    return ps - 12 if ps > 6 else ps


def align_stems(stems):
    """Align first beats on a 5 ms gaussian grid (automix.py:117-171)."""
    sources = len(stems)
    width = 5e-3
    limit = 5
    std = 2
    x = np.arange(-limit, limit + 1, dtype=np.float64)
    gauss = np.exp(-(x**2) / (2 * std**2))

    grids = []
    for wav, onsets in stems:
        le = wav.shape[-1]
        dur = le / SR
        grid = np.zeros(int(le / width / SR))
        for onset in np.atleast_1d(onsets):
            pos = int(onset / width)
            if onset >= dur - 1 or onset < 1:
                continue
            grid[pos - limit : pos + limit + 1] += gauss[: len(grid[pos - limit:pos + limit + 1])]
        grids.append(grid)

    shifts = [0]
    for s in range(1, sources):
        max_shift = int(4 / width)
        dots = []
        for shift in range(-max_shift, max_shift):
            other = grids[s]
            ref = grids[0]
            if shift >= 0:
                other = other[shift:]
            else:
                ref = ref[shift:]
            le = min(len(other), len(ref))
            dots.append((float(ref[:le] @ other[:le]), int(shift * width * SR)))
        _, shift = max(dots)
        shifts.append(-shift)

    outs = []
    new_zero = min(shifts)
    for (wav, _), shift in zip(stems, shifts):
        offset = shift - new_zero
        wav = np.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(offset, 0)])
        outs.append(wav)
    le = min(w.shape[-1] for w in outs)
    return np.stack([w[..., :le] for w in outs])


def find_candidate(spec_ref, catalog, pitch_match=True):
    """Find a tempo/pitch-compatible track (automix.py:174-201)."""
    candidates = list(catalog)
    random.shuffle(candidates)
    for spec in candidates:
        ok = False
        delta_tempo = 0.0
        for scale in (1 / 4, 1 / 2, 1, 2, 4):
            tempo = spec.tempo * scale
            delta_tempo = spec_ref.tempo / tempo - 1
            if abs(delta_tempo) < MAX_TEMPO:
                ok = True
                break
        if not ok:
            continue
        spec = spec._replace(tempo=tempo)
        ps = 0
        if pitch_match:
            ps = best_pitch_shift(spec_ref.kr, spec.kr)
            if abs(ps) > MAX_PITCH:
                continue
        return spec, delta_tempo, ps
    raise RuntimeError("no candidate found")


def get_part(spec, source, dt, dp):
    wav = spec.track[source]
    if dt or dp:
        wav = repitch(wav, dp, dt * 100, samplerate=SR, voice=source == 3)
        spec = spec._replace(onsets=np.asarray(spec.onsets) / (1 + dt))
    return wav, spec


def build_track(ref_index, catalog):
    """Mix one kept source with matched sources from other songs
    (automix.py:213-250)."""
    order = list(range(len(SOURCES)))
    random.shuffle(order)
    stems = [None] * len(order)
    first = order[0]
    spec_ref = catalog[ref_index]
    stems[first] = (spec_ref.track[first], spec_ref.onsets)
    pitch_match = order != 0
    for src in order[1:]:
        spec, dt, dp = find_candidate(spec_ref, catalog, pitch_match=pitch_match)
        if not pitch_match:
            spec_ref = spec_ref._replace(kr=spec.kr)
        pitch_match = True
        wav, spec = get_part(spec, src, dt, dp)
        stems[src] = (wav, spec.onsets)
    return align_stems(stems)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--musdb", type=Path, required=True)
    parser.add_argument("--out", type=Path, required=True)
    parser.add_argument("--cache", type=Path, default=Path.home() / ".cache/automix")
    parser.add_argument("--copies", type=int, default=6)
    parser.add_argument("--workers", type=int, default=4)
    args = parser.parse_args()

    # librosa and soundstretch are used when installed; otherwise the native
    # fallbacks (demucs_tpu.ops.beats / demucs_tpu.ops.timestretch) kick in.

    random.seed(4321)
    if args.out.exists():
        shutil.rmtree(args.out)
    out = args.out / "train"
    out.mkdir(parents=True)

    root = args.musdb / "train"
    metadata = build_metadata(root, SOURCES, normalize=False)
    metadata = {n: m for n, m in metadata.items() if n not in MUSDB_VALID_TRACKS}
    dset = Wavset(root, metadata, SOURCES, samplerate=SR, channels=CHANNELS,
                  normalize=False)
    dset.sig = hashlib.sha1(str(root).encode()).hexdigest()[:8]

    catalog = []
    with ProcessPoolExecutor(args.workers) as pool:
        pendings = [pool.submit(analyse_track, dset, i, args.cache)
                    for i in range(len(dset))]
        for pending in pendings:
            spec, _track = pending.result()
            if spec is not None:
                catalog.append(spec)

    for copy in range(args.copies):
        for index in range(len(catalog)):
            track = build_track(index, catalog)
            mix = track.sum(0)
            scale = max(1, 1.01 * np.abs(mix).max())
            mix = mix / scale
            track = track / scale
            folder = out / f"{copy}_{index}"
            folder.mkdir()
            save_audio(mix, folder / "mixture.wav", SR)
            for stem, source in zip(track, SOURCES):
                save_audio(stem, folder / f"{source}.wav", SR, clip="clamp")


if __name__ == "__main__":
    main()
