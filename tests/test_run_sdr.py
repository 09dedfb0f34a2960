"""Dry run of the SDR quality-gate runbook (tools/run_sdr.py).

The real gate (MUSDB-HQ SDR within 0.05 dB of the published 9.00 dB,
/root/reference/README.md:23-24) needs network egress; this test exercises
the COMPLETE plumbing offline against a forged released-format checkpoint:

  forged ``{klass,args,kwargs,state(fp16)}`` .th with sha256-suffixed name
  -> loopback-HTTP "remote zoo" download (urllib, like the AWS bucket)
  -> checksum verify + cache install (torch.hub check_hash semantics)
  -> hermetic unpickle through the zoo bridge -> bag resolution
  -> MusdbHQ-folder eval (nsdr + native BSS-eval) -> verdict JSON.

On a networked machine the identical code path runs the real thing:
``python tools/run_sdr.py --musdb /path/to/musdbhq`` (or ``make sdr``).
"""

import hashlib
import io
import json
import sys
import threading
from functools import partial
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from common import make_htdemucs_pair, import_reference  # noqa: E402

import run_sdr  # noqa: E402


@pytest.fixture()
def forged_zoo(tmp_path, monkeypatch):
    """A released-format checkpoint served over loopback HTTP, wired into the
    remote zoo as the htdemucs signature; returns (sig, served_requests)."""
    import_reference()
    from demucs.states import serialize_model

    tmodel, _, _ = make_htdemucs_pair()
    pkg = serialize_model(tmodel, {"forged": True}, half=True)
    buf = io.BytesIO()
    torch.save(pkg, buf)
    data = buf.getvalue()
    checksum = hashlib.sha256(data).hexdigest()[:8]

    sig = "955717e8"  # the real htdemucs signature (remote/files.txt)
    http_root = tmp_path / "bucket"
    http_root.mkdir()
    (http_root / f"{sig}-{checksum}.th").write_bytes(data)

    served = []

    class Handler(SimpleHTTPRequestHandler):
        def log_message(self, *a):
            served.append(self.path)

    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), partial(Handler, directory=str(http_root)))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    port = server.server_address[1]

    from demucs_tpu.zoo import repo as zrepo

    monkeypatch.setitem(
        zrepo.REMOTE_FILES, sig,
        f"http://127.0.0.1:{port}/{sig}-{checksum}.th")
    # cache under tmp, not the real ~/.cache
    monkeypatch.setenv("HOME", str(tmp_path / "home"))
    yield sig, served
    server.shutdown()


@pytest.fixture()
def forged_musdb(tmp_path):
    """A MusdbHQ-style test subset: stems + mixture = sum(stems), at the tiny
    model's 8 kHz samplerate."""
    from demucs_tpu.audio import save_audio

    sr, seconds = 8000, 1.3
    rng = np.random.default_rng(11)
    root = tmp_path / "musdbhq"
    for name in ("songA", "songB"):
        track = root / "test" / name
        track.mkdir(parents=True)
        stems = rng.standard_normal(
            (4, 2, int(sr * seconds))).astype(np.float32) * 0.1
        for src, wav in zip(("drums", "bass", "other", "vocals"), stems):
            save_audio(wav, track / f"{src}.wav", sr)
        save_audio(stems.sum(axis=0), track / "mixture.wav", sr)
    return root


def test_runbook_end_to_end(forged_zoo, forged_musdb, tmp_path, capsys):
    sig, served = forged_zoo
    out = tmp_path / "verdict.json"
    verdict = run_sdr.main([
        "-n", "htdemucs",  # bag name -> sig 955717e8 -> loopback download
        "--musdb", str(forged_musdb),
        "--gate", "-100",  # random weights: plumbing only, not quality
        "--shifts", "1", "--workers", "0",
        "--out", str(out),
    ])
    assert any(sig in p for p in served), served  # really went over HTTP

    on_disk = json.loads(out.read_text())
    assert on_disk == verdict
    assert verdict["pass"] is True
    assert verdict["metric"] == "sdr_med"
    assert verdict["model"] == "htdemucs"
    assert verdict["gate_db"] == -100
    assert np.isfinite(verdict["value"])
    # full per-source score table rides along for the report
    for src in ("drums", "bass", "other", "vocals"):
        assert f"nsdr_{src}" in verdict["scores"]
        assert f"sdr_med_{src}" in verdict["scores"]
    # the printed line is machine-readable JSON (the runbook contract)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line) == verdict

    # second run: served from the local cache, no new HTTP request
    n = len(served)
    scores = run_sdr.run(run_sdr.build_parser().parse_args([
        "-n", "htdemucs", "--musdb", str(forged_musdb),
        "--nsdr-only", "--shifts", "0", "--workers", "0",
        "--out", str(tmp_path / "verdict2.json")]))
    assert len(served) == n
    assert scores["metric"] == "nsdr"
    # default gate comes from the published table; random weights fail it
    assert scores["gate_db"] == run_sdr.PUBLISHED_SDR["htdemucs"]
    assert scores["pass"] is False


def test_gate_failure_exits_nonzero(forged_zoo, forged_musdb, tmp_path):
    with pytest.raises(SystemExit) as exc:
        run_sdr.main([
            "-n", "htdemucs", "--musdb", str(forged_musdb),
            "--gate", "100", "--nsdr-only", "--shifts", "0", "--workers", "0",
            "--out", str(tmp_path / "v.json"),
        ])
    assert exc.value.code == 1
    assert json.loads((tmp_path / "v.json").read_text())["pass"] is False
