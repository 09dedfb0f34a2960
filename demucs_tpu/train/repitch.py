"""CPU-side repitch/tempo augmentation.

Behavioral reference: ``demucs/repitch.py`` — with probability ``proba``,
random pitch in ±2 semitones (±`max_pitch`) and tempo change N(0,5)% clamped
to ±``max_tempo``%; vocals processed with ``-speech``; all outputs cropped to
``(1 - 0.01 * max_tempo)`` of the input so batch shapes stay static.

Backends: the ``soundstretch`` binary (SoundTouch, as the reference) when
installed, otherwise the native WSOLA implementation
(demucs_tpu.ops.timestretch) — same ``-pitch``/``-tempo`` parameterization,
no external dependency. The ``-speech`` nuance (transient detection tuning)
has no native equivalent and is ignored by the native backend.
"""

from __future__ import annotations

import random
import shutil
import subprocess as sp
import tempfile
import typing as tp

import numpy as np

from demucs_tpu import audio as dta


def soundstretch_available() -> bool:
    return shutil.which("soundstretch") is not None


def repitch(wav: np.ndarray, pitch: float, tempo: float, voice: bool = False,
            quick: bool = False, samplerate: int = 44100,
            backend: str = "auto") -> np.ndarray:
    """Repitch ``(C, T)`` float32 audio (repitch.py:59-86 parameterization).

    ``backend``: "soundstretch" (the reference binary), "native" (WSOLA,
    demucs_tpu.ops.timestretch), or "auto" = soundstretch when installed.
    """
    if backend not in ("auto", "soundstretch", "native"):
        raise ValueError(backend)
    if backend == "auto":
        backend = "soundstretch" if soundstretch_available() else "native"
    if backend == "native":
        from demucs_tpu.ops.timestretch import repitch_native

        return repitch_native(wav, pitch, tempo, samplerate=samplerate)
    if not soundstretch_available():
        raise RuntimeError("soundstretch binary is not installed")
    infile = tempfile.NamedTemporaryFile(suffix=".wav")
    outfile = tempfile.NamedTemporaryFile(suffix=".wav")
    with infile, outfile:
        dta.write_wav(infile.name, wav, samplerate, bits_per_sample=16)
        command = [
            "soundstretch", infile.name, outfile.name,
            f"-pitch={pitch}", f"-tempo={tempo:.6f}",
        ]
        if quick:
            command += ["-quick"]
        if voice:
            command += ["-speech"]
        try:
            sp.run(command, capture_output=True, check=True)
        except sp.CalledProcessError as error:
            raise RuntimeError(
                f"Could not change bpm because {error.stderr.decode('utf-8')}"
            )
        out, sr = dta.read_wav(outfile.name)
        assert sr == samplerate
    return out


class RepitchedWrapper:
    """Dataset wrapper applying random repitch/tempo (repitch.py:18-56)."""

    def __init__(self, dataset, proba: float = 0.2, max_pitch: int = 2,
                 max_tempo: float = 12, tempo_std: float = 5, vocals: tp.Sequence[int] = (3,),
                 same: bool = True, samplerate: int = 44100):
        self.dataset = dataset
        self.proba = proba
        self.max_pitch = max_pitch
        self.max_tempo = max_tempo
        self.tempo_std = tempo_std
        self.same = same
        self.vocals = list(vocals)
        self.samplerate = samplerate

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, index):
        streams = self.dataset[index]
        in_length = streams.shape[-1]
        out_length = int((1 - 0.01 * self.max_tempo) * in_length)

        if random.random() < self.proba:
            outs = []
            delta_pitch = delta_tempo = 0.0
            for idx, stream in enumerate(streams):
                if idx == 0 or not self.same:
                    # same=False redraws per source (repitch.py:42-45)
                    delta_pitch = random.randint(-self.max_pitch, self.max_pitch)
                    delta_tempo = random.gauss(0, self.tempo_std)
                    delta_tempo = min(max(-self.max_tempo, delta_tempo),
                                      self.max_tempo)
                stream = repitch(
                    stream, delta_pitch, delta_tempo,
                    voice=idx in self.vocals, samplerate=self.samplerate,
                )
                outs.append(stream[:, :out_length])
            streams = np.stack(outs)
        else:
            streams = streams[..., :out_length]
        return streams
