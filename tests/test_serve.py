"""HTTP serving surface (demucs_tpu/serve.py): the service produces the same
stems as the API, two-stems mode composes the complement, and the server
round-trips requests (healthz / models / separate / error paths) over real
HTTP."""

import io
import json
import threading
import urllib.error
import urllib.request
import zipfile

import numpy as np
import pytest

from common import SOURCES, random_mix, small_htdemucs_kwargs


@pytest.fixture(scope="module")
def local_repo(tmp_path_factory):
    """Tiny htdemucs in a local .dmx repo -> (repo_dir, sig)."""
    from demucs_tpu.models import htdemucs as jht
    from demucs_tpu.models.registry import Model
    from demucs_tpu.zoo.native import save_with_checksum

    cfg = jht.HTDemucsConfig(sources=tuple(SOURCES), **small_htdemucs_kwargs())
    model = Model("htdemucs", cfg, jht.init_htdemucs(cfg, seed=0))
    repo = tmp_path_factory.mktemp("repo")
    path = save_with_checksum(model, repo / "serve0000.dmx", half=False)
    return repo, path.stem.split("-")[0]


@pytest.fixture(scope="module")
def service(local_repo):
    from demucs_tpu.serve import SeparationService

    repo, sig = local_repo
    return SeparationService(model=sig, repo=repo, shifts=0, engine="host")


def _wav_bytes(wav: np.ndarray, sr: int, tmp_path) -> bytes:
    from demucs_tpu.audio import save_audio

    path = tmp_path / "in.wav"
    save_audio(wav, path, sr, bits_per_sample=32, as_float=True, clip="none")
    return path.read_bytes()


def test_service_matches_api(service, tmp_path):
    sep = service.separator
    sr = sep.samplerate
    wav = random_mix((2, int(1.3 * sr)), seed=11, scale=0.05)
    blob = service.separate_bytes(_wav_bytes(wav, sr, tmp_path),
                                  float32=True, clip="none")

    from demucs_tpu.audio import read_audio

    _origin, want = sep.separate_tensor(
        read_audio(tmp_path / "in.wav", samplerate=sr, channels=2)[0])

    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        names = sorted(zf.namelist())
        assert names == sorted(f"{s}.wav" for s in sep.model.sources)
        for source in sep.model.sources:
            out = tmp_path / f"out_{source}.wav"
            out.write_bytes(zf.read(f"{source}.wav"))
            stem, _ = read_audio(out, samplerate=sr, channels=2)
            np.testing.assert_allclose(stem, want[source], atol=1e-5, rtol=0)


def test_per_request_overrides_do_not_leak(service, tmp_path):
    """A request's ?shifts/?overlap apply to that request only; the next
    parameterless request runs with the server's configured defaults."""
    sep = service.separator
    sr = sep.samplerate
    wav = random_mix((2, int(1.1 * sr)), seed=13, scale=0.05)
    def _stems(blob):
        # compare decoded payloads, not raw zip bytes (zip entries embed
        # per-second mtimes, so byte comparison is wall-clock-flaky)
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            return {n: zf.read(n)[44:] for n in sorted(zf.namelist())}

    blob_default = service.separate_bytes(_wav_bytes(wav, sr, tmp_path),
                                          float32=True, clip="none")
    before = (sep._shifts, sep._overlap)
    service.separate_bytes(_wav_bytes(wav, sr, tmp_path), overlap=0.5,
                           shifts=0, float32=True, clip="none")
    assert (sep._shifts, sep._overlap) == before
    blob_after = service.separate_bytes(_wav_bytes(wav, sr, tmp_path),
                                        float32=True, clip="none")
    assert _stems(blob_after) == _stems(blob_default)


def test_service_two_stems_and_validation(service, tmp_path):
    sep = service.separator
    sr = sep.samplerate
    wav = random_mix((2, sr), seed=12, scale=0.05)
    payload = _wav_bytes(wav, sr, tmp_path)
    blob = service.separate_bytes(payload, stem="vocals", float32=True,
                                  clip="none")
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        assert sorted(zf.namelist()) == ["no_vocals.wav", "vocals.wav"]

    with pytest.raises(ValueError, match="unknown stem"):
        service.separate_bytes(payload, stem="karaoke")


def test_http_round_trip(service, tmp_path):
    from demucs_tpu.serve import make_server

    server = make_server(service, "127.0.0.1", 0)  # port 0: pick a free one
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{port}"
    try:
        health = json.loads(urllib.request.urlopen(f"{base}/healthz").read())
        assert health["status"] == "ok"
        assert health["sources"] == list(service.separator.model.sources)

        models = json.loads(urllib.request.urlopen(f"{base}/models").read())
        assert "htdemucs" in models["models"]

        sr = service.separator.samplerate
        wav = random_mix((2, sr), seed=13, scale=0.05)
        payload = _wav_bytes(wav, sr, tmp_path)
        req = urllib.request.Request(
            f"{base}/separate?shifts=0&float32=1&clip=none", data=payload,
            method="POST")
        resp = urllib.request.urlopen(req)
        assert resp.headers["Content-Type"] == "application/zip"
        with zipfile.ZipFile(io.BytesIO(resp.read())) as zf:
            assert len(zf.namelist()) == 4

        # error paths: 404 route, 400 empty body, 400 bad stem
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(f"{base}/nope")
        assert err.value.code == 404
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(urllib.request.Request(
                f"{base}/separate", data=b"", method="POST"))
        assert err.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(urllib.request.Request(
                f"{base}/separate?stem=karaoke", data=payload, method="POST"))
        assert err.value.code == 400
    finally:
        server.shutdown()
        thread.join(timeout=10)


def test_service_fast_preset(local_repo):
    """The serve-side fast preset re-configs the model's compute dtype (the
    CLI --preset fast analog for long-lived servers)."""
    from demucs_tpu.serve import SeparationService

    repo, sig = local_repo
    svc = SeparationService(model=sig, repo=repo, shifts=0, engine="host",
                            compute_dtype="bfloat16")
    assert svc.separator._model.cfg.compute_dtype == "bfloat16"


def test_serve_main_prewarm_flags(local_repo, monkeypatch, capsys):
    """`serve.py --shift-offsets ... --prewarm ...` configures the pinned
    set on the Separator and runs prewarm for every listed duration before
    binding the server (the operator warm path, docs/api.md)."""
    from demucs_tpu import serve

    repo, sig = local_repo
    calls = {}

    class _FakeServer:
        def __init_subclass__(cls):
            pass

        def serve_forever(self):
            calls["served"] = True
            raise KeyboardInterrupt  # unwind main() after "binding"

    def fake_make_server(service, host, port):
        calls["service"] = service
        return _FakeServer()

    monkeypatch.setattr(serve, "make_server", fake_make_server)

    real_prewarm = None

    def spy_prewarm(self, durations, verbose=False):
        calls["durations"] = list(durations)
        calls["offsets"] = self._shift_offsets
        return [{"seconds": d, "samples": 0, "warm_time_s": 0.0,
                 "shift_offsets": self._shift_offsets, "tails_warmed": True}
                for d in durations]

    from demucs_tpu.api import Separator

    monkeypatch.setattr(Separator, "prewarm", spy_prewarm)
    with pytest.raises(KeyboardInterrupt):
        serve.main(["-n", sig, "--repo", str(repo), "--shifts", "1",
                    "--engine", "host", "--shift-offsets", "120,360",
                    "--prewarm", "0.8,1.6"])
    assert calls["durations"] == [0.8, 1.6]
    assert calls["offsets"] == (120, 360)
    assert calls["service"].separator._shift_offsets == (120, 360)
    assert calls["served"] is True


def test_service_output_formats(service, tmp_path):
    """?format=flac|mp3 mirrors the CLI's --flac/--mp3: stems come back in
    the requested codec (flac decodes bit-consistently with the wav path,
    mp3 at codec-typical fidelity)."""
    from demucs_tpu import mp3io
    from demucs_tpu.audio import read_audio

    sep = service.separator
    sr = sep.samplerate
    wav = random_mix((2, sr), seed=21, scale=0.05)
    payload = _wav_bytes(wav, sr, tmp_path)

    blob = service.separate_bytes(payload, clip="none", fmt="flac")
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        names = sorted(zf.namelist())
        assert names == sorted(f"{s}.flac" for s in sep.model.sources)
        out = tmp_path / "stem.flac"
        out.write_bytes(zf.read(names[0]))
        stem, got_sr = read_audio(out)
        assert got_sr == sr and stem.shape == wav.shape

    if mp3io.lame_available() and mp3io.mpg123_available():
        blob = service.separate_bytes(payload, clip="none", fmt="mp3",
                                      bitrate=192, mp3_preset=7)
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            names = sorted(zf.namelist())
            assert names == sorted(f"{s}.mp3" for s in sep.model.sources)
            out = tmp_path / "stem.mp3"
            out.write_bytes(zf.read(names[0]))
            stem, got_sr = read_audio(out)
            assert got_sr == sr and stem.shape == wav.shape

    with pytest.raises(ValueError, match="unknown format"):
        service.separate_bytes(payload, fmt="ogg")
    with pytest.raises(ValueError, match="mp3_preset"):
        service.separate_bytes(payload, fmt="mp3", mp3_preset=9)


def test_service_compressed_input_bodies(service, tmp_path):
    """POST bodies in flac and mp3 are sniffed by magic and decoded by the
    first-party codecs (no ffmpeg binary, no avio shim required)."""
    from demucs_tpu import mp3io
    from demucs_tpu.audio import save_audio

    sep = service.separator
    sr = sep.samplerate
    wav = random_mix((2, sr), seed=23, scale=0.05)

    flac_path = tmp_path / "in.flac"
    save_audio(wav, flac_path, sr, clip="none")
    blob = service.separate_bytes(flac_path.read_bytes(), clip="none")
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        assert sorted(zf.namelist()) == sorted(
            f"{s}.wav" for s in sep.model.sources)

    if mp3io.lame_available() and mp3io.mpg123_available():
        mp3_bytes = mp3io.encode_mp3(wav, sr, 192)
        blob = service.separate_bytes(mp3_bytes, clip="none")
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            assert sorted(zf.namelist()) == sorted(
                f"{s}.wav" for s in sep.model.sources)
