"""ctypes bindings for the native (C++) data-loading runtime.

``native/wavio.cpp`` provides GIL-free WAV window decoding and a
multi-threaded batch prefetcher — our counterpart of the reference's native
input pipeline (torchaudio C++ readers + DataLoader workers). The library is
built on demand with g++ (no pybind11 dependency) and cached next to the
source; everything degrades gracefully to the pure-Python codec in
``demucs_tpu.audio`` when a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
import typing as tp
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "native" / "wavio.cpp"
_LIB = _SRC.with_suffix(".so")
_lib: tp.Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    # Build to a temp path and rename: writing the .so in place truncates
    # an inode other processes may have mmap'd (instant SIGSEGV for them);
    # rename leaves their mapping on the old inode.
    import os

    tmp = _LIB.with_suffix(f".tmp{os.getpid()}.so")
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
             str(_SRC), "-o", str(tmp)],
            check=True, capture_output=True,
        )
        tmp.replace(_LIB)
        return True
    except (OSError, subprocess.CalledProcessError):
        tmp.unlink(missing_ok=True)
        return False


def get_lib() -> tp.Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
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
    lib.wavio_info.restype = ctypes.c_int64
    lib.wavio_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64)]
    lib.wavio_read.restype = ctypes.c_int64
    lib.wavio_read.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                               ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
    lib.prefetch_create.restype = ctypes.c_void_p
    lib.prefetch_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int64,
                                    ctypes.c_int64]
    lib.prefetch_add_job.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_double, ctypes.c_double]
    lib.prefetch_start.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.prefetch_get.restype = ctypes.c_int
    lib.prefetch_get.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                 ctypes.POINTER(ctypes.c_float)]
    lib.prefetch_destroy.argtypes = [ctypes.c_void_p]
    try:  # stale pre-FLAC .so builds lack these symbols
        lib.flac_crc8.restype = ctypes.c_uint32
        lib.flac_crc8.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.flac_crc16.restype = ctypes.c_uint32
        lib.flac_crc16.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.flac_rice_decode.restype = ctypes.c_int64
        lib.flac_rice_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int64)]
        lib.flac_lpc_restore.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
    except AttributeError:
        pass
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def wav_info(path) -> tp.Optional[dict]:
    lib = get_lib()
    if lib is None:
        return None
    out = (ctypes.c_int64 * 5)()
    if lib.wavio_info(str(path).encode(), out) != 0:
        return None
    return {"samplerate": int(out[0]), "channels": int(out[1]),
            "frames": int(out[2]), "bits": int(out[3]), "format": int(out[4])}


def read_wav_window(path, frame_offset: int, num_frames: int,
                    channels: int) -> tp.Optional[np.ndarray]:
    """Decode a frame window -> float32 ``(channels, num_frames)`` (zero-padded
    past EOF), or None if the native lib is unavailable/fails."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.zeros((channels, num_frames), dtype=np.float32)
    got = lib.wavio_read(str(path).encode(), frame_offset, num_frames, channels,
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if got < 0:
        return None
    return out


class NativePrefetcher:
    """Thread-pool stem-group loader: jobs of (stem files, offset) produce
    stacked ``(S, C, frames)`` float32 examples, decoded off-GIL in C++."""

    def __init__(self, channels: int, frames: int, sources: int,
                 num_threads: int = 4):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native wavio library unavailable")
        self._lib = lib
        self.channels = channels
        self.frames = frames
        self.sources = sources
        self.num_threads = num_threads
        self._handle = lib.prefetch_create(num_threads, channels, frames, sources)
        self._n_jobs = 0
        self._started = False

    def add_job(self, files: tp.Sequence[tp.Union[str, Path]], offset: int,
                mean: float = 0.0, std: float = 1.0) -> int:
        assert not self._started
        arr = (ctypes.c_char_p * len(files))(*[str(f).encode() for f in files])
        self._lib.prefetch_add_job(self._handle, arr, len(files), offset, mean, std)
        self._n_jobs += 1
        return self._n_jobs - 1

    def start(self) -> None:
        self._lib.prefetch_start(self._handle, self.num_threads)
        self._started = True

    def get(self, i: int) -> np.ndarray:
        out = np.empty((self.sources, self.channels, self.frames), np.float32)
        rc = self._lib.prefetch_get(
            self._handle, i, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            raise IndexError(i)
        return out

    def __len__(self):
        return self._n_jobs

    def close(self) -> None:
        if self._handle:
            self._lib.prefetch_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
