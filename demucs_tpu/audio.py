"""Host-side audio I/O: any-format read via ffmpeg, native WAV/FLAC/mp3
codecs, clip handling.

Behavioral reference: ``demucs/audio.py``. Differences by design:
- torch/torchaudio are replaced by numpy + an in-repo WAV codec
  (16/24/32-bit PCM + float32) so the framework has zero torch dependency at
  inference time; FLAC is the first-party ``flacio`` codec and mp3 binds
  libmp3lame/libmpg123 directly (``mp3io`` — the same LAME library the
  reference's lameenc wraps); non-WAV/FLAC/mp3 decode shells out to ffmpeg
  when the binary is present (audio.py:20-126 does the same for decode).
- Resampling uses the julius-equivalent sinc resampler (ops/resample.py).
"""

from __future__ import annotations

import json
import shutil
import struct
import subprocess as sp
import tempfile
import typing as tp
from pathlib import Path

import numpy as np

__all__ = [
    "AudioFile",
    "read_audio",
    "save_audio",
    "convert_audio",
    "convert_audio_channels",
    "prevent_clip",
    "ffmpeg_available",
]


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None and shutil.which("ffprobe") is not None


def _read_info(path) -> dict:
    stdout_data = sp.check_output([
        "ffprobe", "-loglevel", "panic",
        str(path), "-print_format", "json", "-show_format", "-show_streams",
    ])
    return json.loads(stdout_data.decode("utf-8"))


class AudioFile:
    """Read audio from any ffmpeg-supported format, multi-stream aware
    (audio.py:28-140). Uses the ffmpeg/ffprobe binaries when installed,
    otherwise the in-process libavcodec shim (``demucs_tpu.avio``) — same
    codec implementations, no subprocess. One semantic difference in shim
    mode: ``seek_time`` is sample-exact (decode + trim) where ffmpeg's
    ``-ss`` seeks to the nearest syncpoint."""

    def __init__(self, path):
        self.path = Path(path)
        self._info: tp.Optional[dict] = None
        self._probe: tp.Optional[tuple] = None

    @property
    def _use_ffmpeg(self) -> bool:
        return ffmpeg_available()

    def _avio_probe(self) -> tuple:
        if self._probe is None:
            from demucs_tpu import avio

            self._probe = avio.probe(self.path)
        return self._probe

    def __repr__(self):
        return (
            f"AudioFile(path={self.path}, samplerate={self.samplerate()}, "
            f"channels={self.channels()}, streams={len(self)})"
        )

    @property
    def info(self) -> dict:
        if self._info is None:
            self._info = _read_info(self.path)
        return self._info

    @property
    def duration(self) -> float:
        if not self._use_ffmpeg:
            streams, dur = self._avio_probe()
            if dur > 0:
                return dur
            # container didn't state a duration: derive from the longest
            # stream's frame count instead of leaking the -1 sentinel
            return max((s["frames"] / s["samplerate"] for s in streams
                        if s["samplerate"] > 0 and s["frames"] > 0),
                       default=-1.0)
        return float(self.info["format"]["duration"])

    @property
    def _audio_streams(self):
        return [
            index
            for index, stream in enumerate(self.info["streams"])
            if stream["codec_type"] == "audio"
        ]

    def __len__(self):
        if not self._use_ffmpeg:
            return len(self._avio_probe()[0])
        return len(self._audio_streams)

    def channels(self, stream=0) -> int:
        if not self._use_ffmpeg:
            return self._avio_probe()[0][stream]["channels"]
        return int(self.info["streams"][self._audio_streams[stream]]["channels"])

    def samplerate(self, stream=0) -> int:
        if not self._use_ffmpeg:
            return self._avio_probe()[0][stream]["samplerate"]
        return int(self.info["streams"][self._audio_streams[stream]]["sample_rate"])

    def read(self, seek_time=None, duration=None, streams=slice(None),
             samplerate=None, channels=None) -> np.ndarray:
        """Extract stream(s) as float32 ``(S, C, T)`` (or ``(C, T)`` for an int
        stream index); optional on-the-fly seek/resample (audio.py:71-140).

        Shim mode decodes each selected stream in full and trims (sample-
        exact seek, O(track length) per call even for small windows); the
        ffmpeg backend seeks to the nearest syncpoint before decoding."""
        streams_arr = np.array(range(len(self)))[streams]
        single = not isinstance(streams_arr, np.ndarray)
        if single:
            streams_arr = [streams_arr]

        if duration is None:
            target_size = None
            query_duration = None
        else:
            target_size = int((samplerate or self.samplerate()) * duration)
            query_duration = float((target_size + 1) / (samplerate or self.samplerate()))

        if not self._use_ffmpeg:
            from demucs_tpu import avio

            wavs = []
            for stream in streams_arr:
                wav = avio.read_pcm(self.path, int(stream))[0]
                native_sr = self.samplerate(int(stream))
                if seek_time:
                    wav = wav[..., int(seek_time * native_sr):]
                if samplerate is not None and samplerate != native_sr:
                    wav = np.asarray(resample(wav, native_sr, samplerate))
                if channels is not None:
                    wav = convert_audio_channels(wav, channels)
                if target_size is not None:
                    wav = wav[..., :target_size]
                wavs.append(wav)
            wav = np.stack(wavs, axis=0)
            if single:
                wav = wav[0]
            return wav

        wavs = []
        with tempfile.TemporaryDirectory() as tmp:
            command = ["ffmpeg", "-y", "-loglevel", "panic"]
            if seek_time:
                command += ["-ss", str(seek_time)]
            command += ["-i", str(self.path)]
            filenames = [f"{tmp}/{i}.f32" for i in range(len(streams_arr))]
            for stream, filename in zip(streams_arr, filenames):
                command += ["-map", f"0:{self._audio_streams[stream]}"]
                if query_duration is not None:
                    command += ["-t", str(query_duration)]
                command += ["-threads", "1", "-f", "f32le"]
                if samplerate is not None:
                    command += ["-ar", str(samplerate)]
                command += [filename]
            sp.run(command, check=True)
            for filename in filenames:
                wav = np.fromfile(filename, dtype=np.float32)
                wav = wav.reshape(-1, self.channels()).T
                if channels is not None:
                    wav = convert_audio_channels(wav, channels)
                if target_size is not None:
                    wav = wav[..., :target_size]
                wavs.append(wav)
        wav = np.stack(wavs, axis=0)
        if single:
            wav = wav[0]
        return wav


# ---------------------------------------------------------------------------
# Native WAV codec (no torchaudio): PCM 16/24/32 + IEEE float32
# ---------------------------------------------------------------------------


def wav_info(path) -> dict:
    """Parse WAV header -> {samplerate, channels, frames, bits, format}."""
    fmt, offset, size = _parse_wav_header(path)
    audio_format, n_channels, samplerate, _br, block_align, bits = fmt
    return {
        "samplerate": samplerate,
        "channels": n_channels,
        "frames": size // block_align,
        "bits": bits,
        "format": audio_format,
    }


def _parse_wav_header(path) -> tp.Tuple[tuple, int, int]:
    """Return (fmt tuple, data byte offset, data byte size)."""
    with open(path, "rb") as f:
        riff, _size, wave_id = struct.unpack("<4sI4s", f.read(12))
        if riff != b"RIFF" or wave_id != b"WAVE":
            raise ValueError(f"{path} is not a RIFF/WAVE file")
        fmt = None
        data_off = data_size = None
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            chunk_id, chunk_size = struct.unpack("<4sI", header)
            if chunk_id == b"fmt ":
                fmt = struct.unpack("<HHIIHH", f.read(16))
                rest = f.read(chunk_size + (chunk_size & 1) - 16)
                if fmt[0] == 0xFFFE and len(rest) >= 24:
                    # WAVE_FORMAT_EXTENSIBLE: the real format code is the
                    # first two bytes of the 16-byte SubFormat GUID (after
                    # cbSize(2) + validBits(2) + channelMask(4)) — guessing
                    # it from the bit depth misreads 32-bit int PCM as
                    # IEEE float (garbage decode).
                    sub = struct.unpack_from("<H", rest, 8)[0]
                    fmt = (sub,) + fmt[1:]
            elif chunk_id == b"data":
                data_off = f.tell()
                data_size = chunk_size
                f.seek(chunk_size + (chunk_size & 1), 1)
            else:
                f.seek(chunk_size + (chunk_size & 1), 1)
        if fmt is None or data_off is None:
            raise ValueError(f"{path}: missing fmt/data chunk")
    return fmt, data_off, data_size


def read_wav(path, frame_offset: int = 0,
             num_frames: tp.Optional[int] = None) -> tp.Tuple[np.ndarray, int]:
    """Read a WAV file (optionally a frame window) -> (float32 ``(C, T)``, sr).

    ``frame_offset``/``num_frames`` allow seek-reads for the dataset layer
    (the torchaudio ``ta.load(frame_offset, num_frames)`` equivalent,
    demucs/wav.py:163-167) without decoding the whole file.
    """
    fmt, data_off, data_size = _parse_wav_header(path)
    audio_format, n_channels, samplerate, _byte_rate, block_align, bits = fmt
    total_frames = data_size // block_align
    if num_frames is None:
        num_frames = total_frames - frame_offset
    num_frames = max(0, min(num_frames, total_frames - frame_offset))
    with open(path, "rb") as f:
        f.seek(data_off + frame_offset * block_align)
        data = f.read(num_frames * block_align)
    if audio_format == 3 and bits == 32:
        arr = np.frombuffer(data, dtype="<f4").astype(np.float32)
    elif audio_format == 1 and bits == 16:
        arr = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif audio_format == 1 and bits == 24:
        raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        ints = (
            raw[:, 0].astype(np.int32)
            | (raw[:, 1].astype(np.int32) << 8)
            | (raw[:, 2].astype(np.int32) << 16)
        )
        ints = (ints << 8) >> 8  # sign-extend
        arr = ints.astype(np.float32) / (2**23)
    elif audio_format == 1 and bits == 32:
        arr = np.frombuffer(data, dtype="<i4").astype(np.float32) / (2**31)
    else:
        raise ValueError(f"{path}: unsupported wav format {audio_format}/{bits}bit")
    return arr.reshape(-1, n_channels).T.copy(), samplerate


def write_wav(path, wav: np.ndarray, samplerate: int, *, bits_per_sample: int = 16,
              as_float: bool = False) -> None:
    """Write float32 ``(C, T)`` as WAV (PCM_S 16/24/32 or PCM_F 32)."""
    wav = np.asarray(wav, dtype=np.float32)
    assert wav.ndim == 2, wav.shape
    C, T = wav.shape
    interleaved = wav.T  # (T, C)
    if as_float:
        payload = interleaved.astype("<f4").tobytes()
        fmt_code, bits = 3, 32
    elif bits_per_sample == 16:
        ints = np.clip(interleaved, -1, 1) * (2**15 - 1)
        payload = ints.astype("<i2").tobytes()
        fmt_code, bits = 1, 16
    elif bits_per_sample == 24:
        ints = (np.clip(interleaved, -1, 1) * (2**23 - 1)).astype(np.int32)
        raw = np.zeros((ints.size, 3), dtype=np.uint8)
        flat = ints.reshape(-1)
        raw[:, 0] = flat & 0xFF
        raw[:, 1] = (flat >> 8) & 0xFF
        raw[:, 2] = (flat >> 16) & 0xFF
        payload = raw.tobytes()
        fmt_code, bits = 1, 24
    elif bits_per_sample == 32:
        ints = np.clip(interleaved, -1, 1) * (2**31 - 1)
        payload = ints.astype("<i4").tobytes()
        fmt_code, bits = 1, 32
    else:
        raise ValueError(f"unsupported bits_per_sample {bits_per_sample}")
    block_align = C * bits // 8
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(payload)))
        f.write(b"WAVE")
        f.write(struct.pack("<4sIHHIIHH", b"fmt ", 16, fmt_code, C, samplerate,
                            samplerate * block_align, block_align, bits))
        f.write(struct.pack("<4sI", b"data", len(payload)))
        f.write(payload)


def read_audio(path, samplerate: tp.Optional[int] = None,
               channels: tp.Optional[int] = None) -> tp.Tuple[np.ndarray, int]:
    """Read any audio file -> (float32 ``(C, T)``, sr). Uses ffmpeg when
    available, native WAV decode otherwise."""
    path = Path(path)
    if path.suffix.lower() == ".wav" and not ffmpeg_available():
        wav, sr = read_wav(path)
    elif path.suffix.lower() == ".flac" and not ffmpeg_available():
        from demucs_tpu.flacio import read_flac

        wav, sr = read_flac(path)
    elif ffmpeg_available():
        af = AudioFile(path)
        wav = af.read(streams=0)
        sr = af.samplerate()
    else:
        from demucs_tpu import avio, mp3io

        if path.suffix.lower() == ".mp3" and mp3io.mpg123_available():
            wav, sr = mp3io.read_mp3(path)
        elif avio.available():
            # hermetic any-format fallback: the ffmpeg *libraries* without
            # the binary (ogg/m4a/... — what the reference needs the CLI for)
            wav, sr = avio.read_pcm(path)
        else:
            raise RuntimeError(
                f"Cannot read {path}: ffmpeg is not installed and the file is "
                "not WAV/FLAC/mp3."
            )
    if channels is not None:
        wav = convert_audio_channels(wav, channels)
    if samplerate is not None and samplerate != sr:
        wav = resample(wav, sr, samplerate)
        sr = samplerate
    return wav, sr


def resample(wav: np.ndarray, from_sr: int, to_sr: int) -> np.ndarray:
    if from_sr == to_sr:
        return wav
    import jax.numpy as jnp

    from demucs_tpu.ops.resample import resample_frac

    return np.asarray(resample_frac(jnp.asarray(wav), from_sr, to_sr))


def convert_audio_channels(wav: np.ndarray, channels: int = 2) -> np.ndarray:
    """Channel conversion (audio.py:143-166)."""
    *shape, src_channels, length = wav.shape
    if src_channels == channels:
        return wav
    if channels == 1:
        return wav.mean(axis=-2, keepdims=True)
    if src_channels == 1:
        return np.broadcast_to(wav, (*shape, channels, length)).copy()
    if src_channels >= channels:
        return wav[..., :channels, :]
    raise ValueError("The audio file has less channels than requested but is not mono.")


def convert_audio(wav: np.ndarray, from_samplerate: int, to_samplerate: int,
                  channels: int) -> np.ndarray:
    """Rate + channel conversion (audio.py:169-172)."""
    wav = convert_audio_channels(wav, channels)
    return resample(wav, from_samplerate, to_samplerate)


def prevent_clip(wav: np.ndarray, mode: str = "rescale") -> np.ndarray:
    """Clipping strategies (audio.py:218-233)."""
    if mode is None or mode == "none":
        return wav
    assert np.issubdtype(wav.dtype, np.floating), "too late for clipping"
    if mode == "rescale":
        return wav / max(1.01 * np.abs(wav).max(), 1)
    if mode == "clamp":
        return np.clip(wav, -0.99, 0.99)
    if mode == "tanh":
        return np.tanh(wav)
    raise ValueError(f"Invalid mode {mode}")


def _encode_with_ffmpeg(wav: np.ndarray, path, samplerate: int, suffix: str,
                        bitrate: int = 320, bits_per_sample: int = 16) -> None:
    if not ffmpeg_available():
        raise RuntimeError(
            f"Saving {suffix} requires the ffmpeg binary (not installed). "
            "Use .wav output instead."
        )
    with tempfile.NamedTemporaryFile(suffix=".wav") as tmp:
        write_wav(tmp.name, wav, samplerate, as_float=True)
        cmd = ["ffmpeg", "-y", "-loglevel", "panic", "-i", tmp.name]
        if suffix == ".mp3":
            cmd += ["-b:a", f"{bitrate}k"]
        elif suffix == ".flac":
            sample_fmts = {16: "s16", 24: "s32", 32: "s32"}
            cmd += ["-sample_fmt", sample_fmts[bits_per_sample]]
        cmd += [str(path)]
        sp.run(cmd, check=True)


def save_audio(wav: np.ndarray, path, samplerate: int, bitrate: int = 320,
               clip: str = "rescale", bits_per_sample: int = 16,
               as_float: bool = False, preset: int = 2) -> None:
    """Save audio with clip prevention (audio.py:236-265). ``.wav``/``.flac``
    are first-party codecs; ``.mp3`` encodes through libmp3lame — the same
    library the reference's ``lameenc`` wraps (audio.py:199-215) — honoring
    the ``preset`` quality knob (2 best .. 7 fastest), with an ffmpeg-CLI
    fallback when LAME is absent."""
    wav = prevent_clip(np.asarray(wav, dtype=np.float32), mode=clip)
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix == ".wav":
        write_wav(path, wav, samplerate,
                  bits_per_sample=32 if as_float else bits_per_sample,
                  as_float=as_float)
    elif suffix == ".flac":
        from demucs_tpu.flacio import write_flac

        write_flac(path, wav, samplerate, bits_per_sample=bits_per_sample)
    elif suffix == ".mp3":
        from demucs_tpu import mp3io

        if mp3io.lame_available():
            mp3io.write_mp3(path, wav, samplerate, bitrate, quality=preset)
        else:
            _encode_with_ffmpeg(wav, path, samplerate, suffix, bitrate,
                                bits_per_sample)
    else:
        raise ValueError(f"Invalid suffix for path: {suffix}")
