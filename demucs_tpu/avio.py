"""ctypes binding for the libavformat/libavcodec oracle (native/avio.cpp).

This image ships the ffmpeg *libraries* (libavcodec 59 et al.) without the
ffmpeg binary, so the shim provides two things the subprocess path cannot:

- an EXECUTING external oracle for the first-party codecs — the FLAC/mp3
  cross-validation matrix (tests/test_flac_crossval.py) runs here instead of
  skipping like the binary-gated matrix (tests/test_external_binaries.py);
- a hermetic any-format decode fallback for ``read_audio`` (ogg/m4a/…)
  when the ffmpeg binary is absent (the reference needs the CLI for these,
  demucs/audio.py:28-140).

Built on demand with g++ against the system headers; degrades to None when
the toolchain or the ffmpeg dev libraries are unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
import typing as tp
from pathlib import Path

import numpy as np

__all__ = ["available", "decode_file", "read_pcm", "probe", "encode_flac",
           "encode", "encode_multi"]

_SRC = Path(__file__).resolve().parent.parent / "native" / "avio.cpp"
_LIB = _SRC.with_suffix(".so")
_lib: tp.Optional[ctypes.CDLL] = None
_tried = False

_LINK = ["-lavformat", "-lavcodec", "-lavutil"]


def _build() -> bool:
    # Build to a temp path and rename: writing the .so in place truncates
    # an inode other processes may have mmap'd (instant SIGSEGV for them);
    # rename leaves their mapping on the old inode.
    import os

    tmp = _LIB.with_suffix(f".tmp{os.getpid()}.so")
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(_SRC),
             *_LINK, "-o", str(tmp)],
            check=True, capture_output=True,
        )
        tmp.replace(_LIB)
        return True
    except (OSError, subprocess.CalledProcessError):
        tmp.unlink(missing_ok=True)
        return False


def _get_lib() -> tp.Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _SRC.exists():
        return None
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None
    lib.avio_decode_stream.restype = ctypes.c_int
    lib.avio_decode_stream.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_longlong), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_char_p, ctypes.c_int]
    lib.avio_probe.restype = ctypes.c_int
    lib.avio_probe.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_longlong), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_char_p, ctypes.c_int]
    lib.avio_encode_flac.restype = ctypes.c_int
    lib.avio_encode_flac.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_longlong,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int]
    lib.avio_encode.restype = ctypes.c_int
    lib.avio_encode.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_longlong, ctypes.c_int, ctypes.c_int, ctypes.c_longlong,
        ctypes.c_char_p, ctypes.c_int]
    lib.avio_encode_multi.restype = ctypes.c_int
    lib.avio_encode_multi.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_longlong, ctypes.c_int, ctypes.c_int,
        ctypes.c_longlong, ctypes.c_char_p, ctypes.c_int]
    lib.avio_free.restype = None
    lib.avio_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _get_lib() is not None


def decode_file(path, stream: int = -1) -> tp.Tuple[np.ndarray, int, int, int]:
    """Decode a libavcodec-supported audio file (``stream``: 0-based ordinal
    among the file's AUDIO streams, -1 = libavformat's best pick).

    Returns ``(samples, samplerate, bits, container)`` where ``samples`` is
    ``(C, T)``: int32 with VERBATIM decoder values for integer codecs
    (exactness for cross-validation), float32 for float codecs (e.g. mp3).
    Integer decoders left-justify raw samples in their container
    (``container`` = 8/16/32), e.g. 24-bit FLAC arrives as values << 8.
    """
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("avio (libavcodec shim) is unavailable")
    out = ctypes.c_void_p()
    frames = ctypes.c_longlong()
    channels = ctypes.c_int()
    samplerate = ctypes.c_int()
    fmt = ctypes.c_int()
    bits = ctypes.c_int()
    container = ctypes.c_int()
    err = ctypes.create_string_buffer(256)
    rc = lib.avio_decode_stream(str(path).encode(), int(stream),
                                ctypes.byref(out),
                                ctypes.byref(frames), ctypes.byref(channels),
                                ctypes.byref(samplerate), ctypes.byref(fmt),
                                ctypes.byref(bits), ctypes.byref(container),
                                err, len(err))
    if rc != 0:
        raise RuntimeError(f"avio_decode({path}): {err.value.decode()}")
    try:
        n = frames.value * channels.value
        raw = ctypes.cast(out, ctypes.POINTER(ctypes.c_int32 * n)).contents
        arr = np.frombuffer(
            bytearray(raw), dtype=np.float32 if fmt.value else np.int32)
    finally:
        lib.avio_free(out)
    return (arr.reshape(frames.value, channels.value).T.copy(),
            samplerate.value, bits.value, container.value)


def read_pcm(path, stream: int = -1) -> tp.Tuple[np.ndarray, int]:
    """Decode to normalized float32 ``(C, T)`` in [-1, 1] + samplerate —
    the ``read_audio`` fallback contract."""
    arr, sr, _bits, container = decode_file(path, stream)
    if arr.dtype == np.float32:
        return arr, sr
    return (arr.astype(np.float32) / float(1 << (container - 1))), sr


def probe(path) -> tp.Tuple[tp.List[dict], float]:
    """Container metadata without decoding: a list of per-audio-stream dicts
    ``{channels, samplerate, frames}`` (frames 0 if the container doesn't
    say) plus the container duration in seconds (-1 if unknown)."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("avio (libavcodec shim) is unavailable")
    max_streams = 64
    meta = (ctypes.c_longlong * (3 * max_streams))()
    dur = ctypes.c_double(-1.0)
    err = ctypes.create_string_buffer(256)
    n = lib.avio_probe(str(path).encode(), meta, max_streams,
                       ctypes.byref(dur), err, len(err))
    if n < 0:
        raise RuntimeError(f"avio_probe({path}): {err.value.decode()}")
    streams = [{"channels": int(meta[3 * k]),
                "samplerate": int(meta[3 * k + 1]),
                "frames": int(meta[3 * k + 2])}
               for k in range(min(n, max_streams))]
    return streams, float(dur.value)


def encode_flac(path, pcm: np.ndarray, samplerate: int,
                bits_per_sample: int = 16, compression_level: int = 5) -> None:
    """Encode int PCM ``(C, T)`` (16- or 24-bit values in int32) to FLAC via
    libavcodec — the external encoder oracle for flacio's decoder."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("avio (libavcodec shim) is unavailable")
    pcm = np.asarray(pcm)
    assert pcm.ndim == 2, pcm.shape
    channels, frames = pcm.shape
    inter = np.ascontiguousarray(pcm.T.astype(np.int32))
    err = ctypes.create_string_buffer(256)
    rc = lib.avio_encode_flac(
        str(path).encode(),
        inter.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        frames, channels, int(samplerate), int(bits_per_sample),
        int(compression_level), err, len(err))
    if rc != 0:
        raise RuntimeError(f"avio_encode_flac({path}): {err.value.decode()}")


def encode(path, wav: np.ndarray, samplerate: int, codec: str,
           bitrate: int = 0) -> None:
    """Encode normalized float32 ``(C, T)`` with any named libavcodec
    encoder (muxer from the file extension): synthesizes ogg/m4a/... inputs
    for testing read_audio's any-format fallback. ``bitrate`` 0 = encoder
    default."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("avio (libavcodec shim) is unavailable")
    wav = np.asarray(wav, dtype=np.float32)
    assert wav.ndim == 2, wav.shape
    channels, frames = wav.shape
    inter = np.ascontiguousarray(wav.T)
    err = ctypes.create_string_buffer(256)
    rc = lib.avio_encode(
        str(path).encode(), codec.encode(),
        inter.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        frames, channels, int(samplerate), int(bitrate), err, len(err))
    if rc != 0:
        raise RuntimeError(f"avio_encode({path}, {codec}): {err.value.decode()}")


def encode_multi(path, wavs: np.ndarray, samplerate: int, codec: str,
                 bitrate: int = 0) -> None:
    """Encode ``(S, C, T)`` float32 as S parallel audio streams in one
    container (e.g. 5 alac streams in .mp4 — the reference's .stem.mp4
    shape), each stream addressable via ``decode_file(path, stream=k)`` or
    ``AudioFile.read(streams=...)``."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("avio (libavcodec shim) is unavailable")
    wavs = np.asarray(wavs, dtype=np.float32)
    assert wavs.ndim == 3, wavs.shape
    nstreams, channels, frames = wavs.shape
    inter = np.ascontiguousarray(wavs.transpose(0, 2, 1))
    err = ctypes.create_string_buffer(256)
    rc = lib.avio_encode_multi(
        str(path).encode(), codec.encode(),
        inter.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nstreams, frames, channels, int(samplerate), int(bitrate),
        err, len(err))
    if rc != 0:
        raise RuntimeError(
            f"avio_encode_multi({path}, {codec}): {err.value.decode()}")
