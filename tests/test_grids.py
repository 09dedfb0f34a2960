"""Grids: every entry must resolve cleanly onto TrainArgs (catching unknown
keys), dset presets expand with explicit-key priority, and the --run launcher
round-trips overrides through the CLI token format."""

import pytest

from demucs_tpu import grids
from demucs_tpu.train.config import (
    DSET_PRESETS, TrainArgs, apply_overrides, expand_presets, xp_signature,
)


@pytest.mark.parametrize("name", sorted(grids.GRIDS))
def test_grid_entries_apply_cleanly(name):
    entries = grids.resolve(name)
    assert entries, name
    sigs = []
    for overrides in entries:
        assert "dset" not in overrides  # presets expanded
        args = apply_overrides(TrainArgs(), dict(overrides))
        sigs.append(xp_signature(args))
    assert len(set(sigs)) == len(sigs), f"{name}: duplicate XP signatures"


def test_grid_counts_match_reference_recipes():
    # mdx: 4 bases x (plain + 2 diffq) — grids/mdx.py:28-33
    assert len(grids.resolve("mdx")) == 12
    # mdx_extra: 4 bases x (extra44 + extra_test + 2 diffq on extra_test)
    assert len(grids.resolve("mdx_extra")) == 16
    # sdx23: bleeding + labelnoise — grids/sdx23.py:16-18
    assert len(grids.resolve("sdx23")) == 2
    # mdx_refine: 4 sigs x (plain + 2 diffq) — grids/mdx_refine.py:24-33
    assert len(grids.resolve("mdx_refine")) == 12


def test_signature_strings_survive_cli_roundtrip():
    """A released sig like 955717e8 matches the CLI's exponent-float regex:
    the grid launcher must quote strings and the parser must respect the
    quoting, or continue_pretrained turns into the float 9.55717e13."""
    from demucs_tpu.grids import _yaml_value
    from demucs_tpu.train.config import parse_cli_overrides

    token = f"continue_pretrained={_yaml_value('955717e8')}"
    parsed = parse_cli_overrides([token])
    assert parsed["continue_pretrained"] == "955717e8"
    # unquoted scientific notation still coerces (YAML 1.1 keeps it a str)
    assert parse_cli_overrides(["optim.lr=1e-4"])["optim.lr"] == 1e-4


def test_mmi_ft_rebinds_base_model_args():
    """The fine-tune entries must carry the base XP's model args (the
    reference rebinds the full argv via get_xp_from_sig): fine-tuning
    955717e8 weights into a default-config model silently disables the
    decoder DConv branches."""
    for entry in grids.resolve("mmi_ft"):
        assert entry["model_args"]["dconv_mode"] == 3
        assert entry["model_args"]["t_layers"] == 5
        assert entry["dset.wav2_valid"] is True


def test_dset_presets_all_resolve():
    for name in DSET_PRESETS:
        overrides = expand_presets({"dset": name})
        args = apply_overrides(TrainArgs(), overrides)
        assert args.dset.samplerate == 44100


def test_expand_presets_explicit_wins():
    out = expand_presets({"dset": "extra44", "epochs": 7})
    assert out["epochs"] == 7 and out["dset.wav"] == "<ALLSTEMS_44>"
    with pytest.raises(KeyError, match="unknown dset preset"):
        expand_presets({"dset": "nope"})


def test_launcher_run_invokes_train(monkeypatch, capsys):
    captured = {}

    def fake_train_main(argv):
        from demucs_tpu.train.config import parse_cli_overrides

        captured["overrides"] = expand_presets(parse_cli_overrides(argv))

    import demucs_tpu.train.train as train_mod

    monkeypatch.setattr(train_mod, "main", fake_train_main)
    grids.main(["sdx23", "--run", "1", "dset.musdb=/data/musdb"])
    got = captured["overrides"]
    assert got["dset.use_musdb"] is False
    assert got["dset.wav"] == "<MOISESDB23_LABELNOISE>"
    assert got["dset.musdb"] == "/data/musdb"
    assert "launching grid entry [1]" in capsys.readouterr().out


def test_launcher_run_out_of_range():
    with pytest.raises(SystemExit, match="out of range"):
        grids.main(["sdx23", "--run", "5"])


def test_launcher_run_all_with_jobs(capsys):
    launched = []

    def fake_runner(overrides):
        launched.append(dict(overrides))
        return 0

    grids.main(["sdx23", "--run", "all", "--jobs", "2"], runner=fake_runner)
    assert len(launched) == 2
    assert {ov["dset.wav"] for ov in launched} == {
        "<MOISESDB23_BLEEDING>", "<MOISESDB23_LABELNOISE>"}
    assert "2/2 ok" in capsys.readouterr().out


def test_launcher_run_all_reports_failures(capsys):
    def flaky_runner(overrides):
        return 1 if overrides["dset.wav"] == "<MOISESDB23_BLEEDING>" else 0

    with pytest.raises(SystemExit):
        grids.main(["sdx23", "--run", "all"], runner=flaky_runner)
    captured = capsys.readouterr()
    assert "1/2 ok" in captured.out
    assert "FAILED [0]" in captured.err


def test_launcher_status(tmp_path, capsys):
    """--status reads each XP folder's history.json (dora grid monitor)."""
    import json

    # materialize one XP folder with two epochs of history
    entries = grids.resolve("sdx23", {"out_dir": str(tmp_path)})
    args = apply_overrides(TrainArgs(), dict(entries[0]))
    sig = xp_signature(args)
    folder = tmp_path / "xps" / sig
    folder.mkdir(parents=True)
    (folder / "history.json").write_text(json.dumps([
        {"train": {"loss": 0.5}, "valid": {"loss": 0.4, "best": 0.4}},
        {"train": {"loss": 0.3}, "valid": {"loss": 0.35, "best": 0.35}},
    ]))

    grids.main(["sdx23", "--status", f"out_dir={tmp_path}"])
    out = capsys.readouterr().out.splitlines()
    assert len(out) == 2
    assert sig in out[0]
    assert "epoch 2/320" in out[0] and "train 0.3000" in out[0] \
        and "best 0.3500" in out[0]
    assert "not started" in out[1]


def test_sbatch_emission(tmp_path, capsys):
    """--sbatch writes one submittable script per XP with the overrides,
    signature-stamped job name, and slurm.key=value directive overrides
    (the reference's dora/submitit grid submission role,
    conf/config.yaml:294-297)."""
    from demucs_tpu.train.config import parse_cli_overrides

    grids.main(["mmi", "--sbatch", str(tmp_path),
                "slurm.partition=tpu", "slurm.nodes=4",
                "dset.musdb=/data/musdbhq"])
    out = capsys.readouterr().out
    scripts = sorted(tmp_path.glob("mmi_*.sbatch"))
    grid = grids.resolve("mmi", parse_cli_overrides(["dset.musdb=/data/musdbhq"]))
    assert len(scripts) == len(grid)
    assert "sbatch" in out
    for i, (path, overrides) in enumerate(zip(scripts, grid)):
        text = path.read_text()
        args = apply_overrides(TrainArgs(), dict(overrides))
        sig = xp_signature(args)
        assert f"--job-name=demucs_mmi_{sig}" in text
        assert "#SBATCH --partition=tpu" in text
        assert "#SBATCH --nodes=4" in text
        assert f"#SBATCH --time={grids.SBATCH_DEFAULTS['time']}" in text
        assert "srun python -m demucs_tpu.train" in text
        assert "dset.musdb" in text
        assert path.stat().st_mode & 0o100  # executable
        # every override token round-trips through the train CLI parser
        import shlex
        tokens = shlex.split(text.split("srun python -m demucs_tpu.train")[1])
        parsed = parse_cli_overrides([t for t in tokens if "=" in t])
        re_args = apply_overrides(TrainArgs(), parsed)
        assert xp_signature(re_args) == sig
