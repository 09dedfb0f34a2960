"""HTTP serving surface: a stdlib-only stem-separation server.

The production analog of the CLI (``demucs/separate.py``) for long-running
deployments: the model loads and compiles ONCE at startup (first-request
latency is the usual 25-70 s TPU compile; everything after reuses the cached
executables), and every request runs through the same device-resident engine
as the CLI — one dispatch per (model, shift) pass, pipelined stems fetch.
The reference has no serving runtime (its ``web/`` folder is a browser-side
TS runtime); this module plus ``tools/run_stablehlo.py`` are the TPU-native
deployment story.

    python -m demucs_tpu.serve -n htdemucs --port 8355
    curl -s -X POST --data-binary @track.wav \
        "http://127.0.0.1:8355/separate?shifts=0&float32=1" -o stems.zip

Endpoints:
    GET  /healthz       -> {"status": "ok", model, samplerate, sources}
    GET  /models        -> the model zoo listing (api.list_models)
    POST /separate      -> zip of per-stem audio files. Body: an audio file
                           (wav/flac/mp3 first-party; ogg/m4a/... through
                           the libavcodec shim or ffmpeg). Query: shifts,
                           overlap, stem (two_stems mode), float32=1,
                           int24=1, clip=rescale|clamp|tanh|none,
                           format=wav|flac|mp3 (the CLI's --flac/--mp3),
                           bitrate=320, mp3_preset=2..7.

Requests are processed one at a time (a lock guards the single chip);
parallelism comes from segment batching inside a request, exactly like the
CLI. Run one server process per chip and load-balance in front for fleets.
"""

from __future__ import annotations

import io
import json
import tempfile
import threading
import typing as tp
import zipfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

import numpy as np

__all__ = ["SeparationService", "make_server", "main"]


class SeparationService:
    """Owns one Separator and serializes access to the device."""

    def __init__(self, model: str = "htdemucs", repo: tp.Optional[Path] = None,
                 **separator_kwargs):
        from demucs_tpu.api import Separator

        self.separator = Separator(model=model, repo=repo, progress=False,
                                   **separator_kwargs)
        self.model_name = model
        self._lock = threading.Lock()

    def info(self) -> dict:
        sep = self.separator
        return {
            "status": "ok",
            "model": self.model_name,
            "samplerate": sep.samplerate,
            "sources": list(sep.model.sources),
        }

    def separate_bytes(self, payload: bytes, *, shifts: tp.Optional[int] = None,
                       overlap: tp.Optional[float] = None,
                       stem: tp.Optional[str] = None,
                       float32: bool = False, int24: bool = False,
                       clip: str = "rescale", fmt: str = "wav",
                       bitrate: int = 320, mp3_preset: int = 2) -> bytes:
        """Audio file bytes -> zip of stem files (two_stems when ``stem``).

        ``fmt`` mirrors the CLI's output-format flags: wav (default), flac
        (first-party codec), mp3 (libmp3lame at ``bitrate`` kb/s, quality
        ``mp3_preset`` 2 best .. 7 fastest)."""
        from demucs_tpu.audio import ffmpeg_available, read_audio, save_audio

        sep = self.separator
        if stem is not None and stem not in sep.model.sources:
            raise ValueError(
                f"unknown stem {stem!r}; available: {list(sep.model.sources)}")
        if fmt not in ("wav", "flac", "mp3"):
            raise ValueError(f"unknown format {fmt!r}; use wav/flac/mp3")
        if fmt == "mp3":
            from demucs_tpu import mp3io

            if not (mp3io.lame_available() or ffmpeg_available()):
                raise ValueError(
                    "mp3 output needs libmp3lame or ffmpeg on the server")
            if not 2 <= mp3_preset <= 7:
                raise ValueError(f"mp3_preset must be 2..7, got {mp3_preset}")
        with tempfile.TemporaryDirectory() as td:
            # read_audio's first-party codecs key on the suffix, so sniff the
            # container magic: RIFF (wav), fLaC, ID3/frame-sync (mp3). Other
            # payloads ride the ffmpeg/libavcodec paths, which sniff content.
            if payload[:4] == b"RIFF":
                suffix = ".wav"
            elif payload[:4] == b"fLaC":
                suffix = ".flac"
            elif payload[:3] == b"ID3" or (
                    len(payload) > 1 and payload[0] == 0xFF
                    and (payload[1] & 0xE0) == 0xE0):
                suffix = ".mp3"
            else:
                suffix = ".audio"
            src = Path(td) / f"input{suffix}"
            src.write_bytes(payload)
            wav, _sr = read_audio(src, samplerate=sep.samplerate,
                                  channels=sep.model.audio_channels)
            with self._lock:
                # Per-request overrides are scoped to THIS request: restore
                # the server's configured defaults afterwards so one client's
                # ?shifts=0 never leaks into later parameterless requests.
                restore = {}
                try:
                    if shifts is not None:
                        restore["shifts"] = sep._shifts
                    if overlap is not None:
                        restore["overlap"] = sep._overlap
                    if restore:
                        kw = {}
                        if shifts is not None:
                            kw["shifts"] = shifts
                        if overlap is not None:
                            kw["overlap"] = overlap
                        sep.update_parameter(**kw)
                    _origin, stems = sep.separate_tensor(wav)
                finally:
                    if restore:
                        sep.update_parameter(**restore)

            if stem is not None:
                # two-stems mode (separate.py:194-202): the complement is the
                # sum of every other source.
                rest = sum(v for k, v in stems.items() if k != stem)
                stems = {stem: stems[stem], f"no_{stem}": rest}

            buf = io.BytesIO()
            # wav: float32 means PCM_F; flac/mp3 follow the CLI's law
            # (bits = 24 if int24 else 16, as_float wav-only)
            if fmt == "wav":
                bits = 32 if float32 else 24 if int24 else 16
            else:
                bits = 24 if int24 else 16
            kwargs = dict(clip=clip, bits_per_sample=bits,
                          as_float=float32 and fmt == "wav")
            if fmt == "mp3":
                kwargs.update(bitrate=bitrate, preset=mp3_preset)
            with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
                for name, audio in stems.items():
                    dest = Path(td) / f"{name}.{fmt}"
                    save_audio(np.asarray(audio), dest, sep.samplerate, **kwargs)
                    zf.write(dest, f"{name}.{fmt}")
            return buf.getvalue()


def make_server(service: SeparationService, host: str = "127.0.0.1",
                port: int = 8355) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _json(self, code: int, obj: dict) -> None:
            data = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/healthz":
                return self._json(200, service.info())
            if path == "/models":
                from demucs_tpu.api import list_models

                listing = list_models()
                names = sorted(set(listing["single"]) | set(listing["bag"]))
                return self._json(200, {"models": names})
            return self._json(404, {"error": f"unknown path {path}"})

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/separate":
                return self._json(404, {"error": f"unknown path {url.path}"})
            try:
                length = int(self.headers.get("Content-Length", 0))
            except (TypeError, ValueError):
                return self._json(400, {"error": "bad Content-Length"})
            if length <= 0:
                return self._json(400, {"error": "empty body"})
            payload = self.rfile.read(length)
            q = {k: v[-1] for k, v in parse_qs(url.query).items()}
            try:
                blob = service.separate_bytes(
                    payload,
                    shifts=int(q["shifts"]) if "shifts" in q else None,
                    overlap=float(q["overlap"]) if "overlap" in q else None,
                    stem=q.get("stem"),
                    float32=q.get("float32") in ("1", "true"),
                    int24=q.get("int24") in ("1", "true"),
                    clip=q.get("clip", "rescale"),
                    fmt=q.get("format", "wav"),
                    bitrate=int(q["bitrate"]) if "bitrate" in q else 320,
                    mp3_preset=(int(q["mp3_preset"])
                                if "mp3_preset" in q else 2),
                )
            except ValueError as err:
                return self._json(400, {"error": str(err)})
            except Exception as err:  # noqa: BLE001 — survive bad inputs
                return self._json(500, {"error": f"{type(err).__name__}: {err}"})
            self.send_response(200)
            self.send_header("Content-Type", "application/zip")
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    import argparse

    from demucs_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(
        description="demucs_tpu separation server (one process per chip)")
    parser.add_argument("-n", "--name", default="htdemucs")
    parser.add_argument("--repo", type=Path, default=None)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8355)
    parser.add_argument("--shifts", type=int, default=1)
    parser.add_argument("--overlap", type=float, default=0.25)
    parser.add_argument("--segment", type=float, default=None)
    parser.add_argument("--engine", default="auto",
                        choices=["auto", "host", "device"])
    parser.add_argument("--wire", default=None,
                        choices=[None, "float32", "float16", "int16", "int8"],
                        help="stems transfer dtype (default: bit-exact)")
    parser.add_argument("--preset", default="default",
                        choices=["default", "fast", "balanced", "quality"],
                        help="quality/speed ladder (demucs_tpu/presets.py): "
                        "fast = bf16 + int8 wire; balanced = 3-pass MXU "
                        "(~82 dB vs true fp32); quality = 6-pass true fp32 "
                        "+ bit-exact wire; explicit --wire still wins")
    parser.add_argument("--warmup-seconds", type=float, default=None,
                        help="compile the engine on a silent track of this "
                        "length before accepting requests")
    parser.add_argument("--tail-mode", default="exact",
                        choices=["exact", "uniform"],
                        help="ragged-tail policy for hdemucs/demucs-era "
                        "models (see the CLI's --tail-mode)")
    parser.add_argument("--shift-offsets", default=None,
                        help="comma-separated pinned shift offsets (samples) "
                        "consumed in order instead of random draws — same "
                        "exact-tails numerics, bounded executable set "
                        "(docs/api.md 'Serving guidance')")
    parser.add_argument("--prewarm", default=None,
                        help="comma-separated track lengths (seconds) to "
                        "compile+load before accepting requests; with "
                        "--shift-offsets this warms every tail program too "
                        "(supersedes --warmup-seconds)")
    args = parser.parse_args(argv)

    from demucs_tpu.presets import resolve_preset

    compute_dtype, matmul_precision, args.wire, banner = resolve_preset(
        args.preset, args.wire)
    if banner:
        print(banner, flush=True)
    shift_offsets = (tuple(int(x) for x in args.shift_offsets.split(","))
                     if args.shift_offsets else None)
    service = SeparationService(
        model=args.name, repo=args.repo, shifts=args.shifts,
        overlap=args.overlap, segment=args.segment, engine=args.engine,
        transfer_dtype=args.wire, compute_dtype=compute_dtype,
        matmul_precision=matmul_precision, shift_offsets=shift_offsets,
        tail_mode=args.tail_mode,
    )
    if args.prewarm:
        durations = [float(x) for x in args.prewarm.split(",")]
        report = service.separator.prewarm(durations, verbose=True)
        if not all(r["tails_warmed"] for r in report):
            print("prewarm: WARNING — random shifts on an exact-tail model "
                  "leave tail executables cold; pin --shift-offsets, use "
                  "--tail-mode uniform, or serve shifts=0", flush=True)
    elif args.warmup_seconds:
        sep = service.separator
        silent = np.zeros(
            (sep.model.audio_channels, int(args.warmup_seconds * sep.samplerate)),
            np.float32)
        sep.separate_tensor(silent)
        print(f"warmup done ({args.warmup_seconds:.0f}s track)", flush=True)

    server = make_server(service, args.host, args.port)
    print(f"serving {args.name} on http://{args.host}:{args.port} "
          f"(sources: {', '.join(service.separator.model.sources)})", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
