"""Legacy XP migration tool (tools/convert.py): dev->release argv rewrites,
recursive continue_from remap, re-signing in our XP system, and checkpoint
re-export round-trip. Reference: /root/reference/tools/convert.py."""

import json
import sys
from pathlib import Path

import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from common import make_htdemucs_pair  # noqa: E402

import convert as cv  # noqa: E402


def _write_argv(xps, sig, argv):
    d = xps / sig
    d.mkdir(parents=True)
    (d / ".argv.json").write_text(json.dumps(argv))


def test_transform_rewrites_dev_tokens():
    argv = [
        "model=wdemucs",
        "wdemucs.nice=True",
        "wdemucs.freq_emb=-0.2",
        "power.penalty=0.1",
        "hdemucs.hybrid=True",
        "special=True",
    ]
    out = cv.transform(argv)
    # removes dev-only flags, renames power->svd / wdemucs->hdemucs,
    # injects the hdemucs compat overrides (convert.py:23-50)
    assert "special=True" not in out
    assert "wdemucs.nice=True" not in out
    assert "svd.penalty=0.1" in out
    assert "model=hdemucs" in out
    assert "hdemucs.hybrid_old=True" in out
    # injections prepend in rule order, so the later rule lands first
    assert out[0] == "hdemucs.norm_starts=999"
    assert out[1] == "hdemucs.cac=False"


def test_convert_remaps_continue_from(tmp_path):
    xps = tmp_path / "xps"
    _write_argv(xps, "oldbase1", ["model=wdemucs", "wdemucs.nice=True",
                                  "epochs=100"])
    _write_argv(xps, "oldft002", ["model=wdemucs", 'continue_from="oldbase1"',
                                  "optim.lr=1e-4"])
    mappings = {}
    new_sig, args = cv.convert("oldft002", xps, mappings)
    assert set(mappings) == {"oldbase1", "oldft002"}
    assert args.continue_from == mappings["oldbase1"]
    assert args.optim.lr == 1e-4
    assert args.model == "hdemucs"
    # injected compat tokens land in model_args
    assert args.model_args["cac"] is False
    assert args.model_args["norm_starts"] == 999
    # signatures are stable (pure function of the delta)
    again = {}
    sig2, _ = cv.convert("oldft002", xps, again)
    assert sig2 == new_sig


def test_inactive_family_tokens_dropped(tmp_path):
    xps = tmp_path / "xps"
    _write_argv(xps, "oldmix01", ["model=htdemucs", "demucs.channels=32",
                                  "htdemucs.t_layers=3"])
    mappings = {}
    _, args = cv.convert("oldmix01", xps, mappings)
    assert args.model_args == {"t_layers": 3}


def test_dump_and_compare_roundtrip(tmp_path, capsys):
    from torchref import import_reference

    import_reference()
    from demucs.states import serialize_model

    xps = tmp_path / "xps"
    _write_argv(xps, "oldht001", ["model=htdemucs"])
    tmodel, _cfg, _params = make_htdemucs_pair()
    pkg = serialize_model(tmodel, {"dummy": 1}, half=True)
    torch.save(pkg, xps / "oldht001" / "best.th")

    rc = cv.main(["oldht001", "--xps", str(xps), "-o", str(tmp_path / "rel"),
                  "--dump", "--compare"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "dumped oldht001" in out
    assert "FINAL MAPPINGS" in out
    delta_line = [l for l in out.splitlines() if l.startswith("Delta for")][0]
    delta = float(delta_line.split()[-2])
    # the native .dmx re-export (fp16) reproduces the bridge-loaded forward
    assert delta < -40.0, delta_line
