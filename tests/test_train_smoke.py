"""Micro end-to-end training smoke test — our version of the reference's
``make test_train`` (SURVEY.md §4): synthesize a tiny MusdbHQ-style dataset,
run 2 epochs of a tiny model through the full solver (augment -> jitted train
step -> valid with overlap-add apply -> nsdr -> checkpoint), then resume."""

import numpy as np
import pytest

from demucs_tpu import audio as dta

SR = 8000
SOURCES = ("drums", "bass", "other", "vocals")


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("musdb")
    rng = np.random.default_rng(0)
    for subset, names in [("train", ["TrackA", "TrackB", "ValTrack"]),
                          ("test", ["TestTrack"])]:
        for name in names:
            tdir = root / subset / name
            tdir.mkdir(parents=True)
            T = 4 * SR
            stems = []
            for source in SOURCES:
                wav = (rng.standard_normal((2, T)) * 0.05).astype(np.float32)
                dta.write_wav(tdir / f"{source}.wav", wav, SR, as_float=True)
                stems.append(wav)
            dta.write_wav(tdir / "mixture.wav", sum(stems), SR, as_float=True)
    return root


def _make_args(dataset_root, tmp_path, **over):
    from demucs_tpu.train.config import TrainArgs, apply_overrides

    args = TrainArgs()
    overrides = {
        "model": "demucs",
        "model_args": {"channels": 4, "depth": 2, "resample": False,
                       "dconv_mode": 0, "lstm_layers": 0},
        "dset.musdb": str(dataset_root),
        "dset.metadata": str(tmp_path / "metadata"),
        "dset.samplerate": SR,
        "dset.segment": 2,
        "dset.shift": 0.25,
        "dset.valid_tracks": ("ValTrack",),
        "epochs": 2,
        "batch_size": 4,
        "max_batches": 2,
        "augment.repitch.proba": 0.0,
        "augment.remix.group_size": 2,
        "test.every": 2,
        "test.sdr": False,
        "test.workers": 0,
        "test.shifts": 0,
        "ema.batch": (0.95,),
        "ema.epoch": (0.9,),
        "out_dir": str(tmp_path / "outputs"),
        "misc.num_workers": 0,
    }
    overrides.update(over)
    return apply_overrides(args, overrides)


def test_train_two_epochs_and_resume(dataset_root, tmp_path):
    from demucs_tpu.train.train import get_solver
    from demucs_tpu.train.config import xp_signature

    args = _make_args(dataset_root, tmp_path)
    solver = get_solver(args)
    solver.train()

    # history has 2 epochs of train+valid (+test at epoch 2)
    assert len(solver.history) == 2
    for m in solver.history:
        assert np.isfinite(m["train"]["loss"])
        assert np.isfinite(m["valid"]["loss"])
        assert "nsdr" in m["valid"]
    assert "test" in solver.history[-1]
    assert "nsdr" in solver.history[-1]["test"]

    sig = xp_signature(args)
    folder = tmp_path / "outputs" / "xps" / sig
    assert (folder / "checkpoint.tpk").exists()
    assert (folder / "history.json").exists()
    assert (folder / "best.dmx").exists()

    # Resume: new solver picks up the checkpoint and skips completed epochs.
    solver2 = get_solver(args)
    assert len(solver2.history) == 2
    solver2.train()  # no epochs left, returns immediately
    assert len(solver2.history) == 2


def test_best_model_loadable(dataset_root, tmp_path):
    from demucs_tpu.train.train import get_solver
    from demucs_tpu.train.config import xp_signature
    from demucs_tpu.zoo.native import load_native_model
    from demucs_tpu.inference.apply import apply_model

    args = _make_args(dataset_root, tmp_path, epochs=1)
    solver = get_solver(args)
    solver.train()
    sig = xp_signature(args)
    best = load_native_model(tmp_path / "outputs" / "xps" / sig / "best.dmx")
    assert best.kind == "demucs"
    mix = np.zeros((1, 2, SR), dtype=np.float32)
    out = apply_model(best, mix, shifts=0, split=False)
    assert out.shape == (1, 4, 2, SR)


def test_xp_signature_stability():
    from demucs_tpu.train.config import TrainArgs, apply_overrides, xp_signature

    a = TrainArgs()
    b = TrainArgs()
    assert xp_signature(a) == xp_signature(b)
    apply_overrides(b, {"optim.lr": 1e-4})
    assert xp_signature(a) != xp_signature(b)
    # same override -> same signature (Dora-style reproducibility)
    c = apply_overrides(TrainArgs(), {"optim.lr": 1e-4})
    assert xp_signature(b) == xp_signature(c)


def test_remat_train_step(dataset_root, tmp_path):
    """jax.checkpoint remat path produces finite losses (memory/FLOPs trade)."""
    from demucs_tpu.train.train import get_solver

    args = _make_args(dataset_root, tmp_path, epochs=1, remat=True)
    solver = get_solver(args)
    solver.train()
    assert np.isfinite(solver.history[-1]["train"]["loss"])


def test_export_tool(dataset_root, tmp_path, monkeypatch):
    """tools/export.py: XP checkpoint -> release .dmx with checksum + pinned
    segment, loadable for separation."""
    import runpy
    import sys

    from demucs_tpu.train.train import get_solver
    from demucs_tpu.train.config import xp_signature
    from demucs_tpu.zoo.native import load_native_model

    args = _make_args(dataset_root, tmp_path, epochs=1)
    solver = get_solver(args)
    solver.train()
    sig = xp_signature(args)

    out_dir = tmp_path / "release"
    monkeypatch.setattr(sys, "argv", [
        "export.py", sig, "--out", str(out_dir),
        "--outdir", str(tmp_path / "outputs"),
    ])
    runpy.run_path("tools/export.py", run_name="__main__")
    files = list(out_dir.glob(f"{sig}-*.dmx"))
    assert len(files) == 1
    released = load_native_model(files[0])
    assert released.kind == "demucs"
    assert released.cfg.segment == float(args.dset.segment)


def test_evaluate_pretrained_flow(dataset_root, tmp_path):
    """tools/test_pretrained-style eval: local-repo model + MusdbHQ test dir
    -> per-source nsdr + mean/median-of-medians aggregation keys
    (evaluate.py:157-174)."""
    from demucs_tpu.evaluate import evaluate
    from demucs_tpu.models import demucs as m_d
    from demucs_tpu.models.registry import Model
    from demucs_tpu.train.config import TrainArgs, apply_overrides
    from demucs_tpu.zoo.native import save_with_checksum
    from demucs_tpu.zoo.repo import LocalRepo

    cfg = m_d.DemucsConfig(sources=SOURCES, channels=4, depth=2, resample=False,
                           dconv_mode=0, samplerate=SR, segment=2.0)
    model = Model("demucs", cfg, m_d.init_demucs(cfg))
    repo_dir = tmp_path / "repo"
    repo_dir.mkdir()
    path = save_with_checksum(model, repo_dir / "tinysig.dmx")
    loaded = LocalRepo(repo_dir).get_model("tinysig")

    targs = apply_overrides(TrainArgs(), {
        "dset.musdb": str(dataset_root),
        "test.shifts": 0,
        "test.workers": 0,
        "misc.num_workers": 0,
    })

    class _Shim:
        pass

    solver = _Shim()
    solver.args = targs
    solver.model = loaded
    solver.folder = tmp_path / "evalout"
    result = evaluate(solver, compute_sdr=False)
    for source in SOURCES:
        assert f"nsdr_{source}" in result
        assert f"nsdr_med_{source}" in result
    assert "nsdr" in result and "nsdr_med" in result
    assert np.isfinite(result["nsdr"])

    # full BSS-eval (museval absent -> native ops/bsseval.py fallback)
    result_sdr = evaluate(solver, compute_sdr=True)
    for metric in ("sdr", "sir", "isr", "sar"):
        assert metric in result_sdr and f"{metric}_med" in result_sdr
        for source in SOURCES:
            assert f"{metric}_{source}" in result_sdr
    assert np.isfinite(result_sdr["sdr"])


def test_solver_train_step_is_sharded(dataset_root, tmp_path):
    """On a multi-device host the solver's jitted train step shards the batch
    over a dp mesh (the DDP replacement) — and produces the same training
    trajectory as the single-device step."""
    import jax

    from demucs_tpu.train.train import get_solver

    args = _make_args(dataset_root, tmp_path / "sharded", **{"epochs": 1})
    solver = get_solver(args)
    assert solver._mesh is not None, "expected a dp mesh on the 8-device host"
    assert solver._mesh.devices.size == 4  # largest divisor of batch 4
    solver.train()
    sharded_loss = solver.history[-1]["train"]["loss"]

    # force the single-device path and compare
    args2 = _make_args(dataset_root, tmp_path / "single", **{"epochs": 1})
    solver2 = get_solver(args2)
    solver2._mesh = None
    solver2._train_step = solver2._build_train_step()
    solver2.train()
    single_loss = solver2.history[-1]["train"]["loss"]
    assert abs(sharded_loss - single_loss) < 1e-4 * max(1.0, abs(single_loss)), (
        sharded_loss, single_loss)


def test_async_checkpoint_same_trajectory(dataset_root, tmp_path):
    """misc.async_checkpoint serializes in a background thread (overlapping
    the relay fetch with the next epoch — BENCHMARKS.md Training): the
    training trajectory is IDENTICAL to the sync path, the writer is joined
    before train() returns, files are atomic/complete, and resume works."""
    from demucs_tpu.train.train import get_solver
    from demucs_tpu.train.config import xp_signature

    sync_args = _make_args(dataset_root, tmp_path / "sync")
    solver = get_solver(sync_args)
    solver.train()
    sync_losses = [m["train"]["loss"] for m in solver.history]

    args = _make_args(dataset_root, tmp_path / "async",
                      **{"misc.async_checkpoint": True})
    solver2 = get_solver(args)
    solver2.train()
    assert getattr(solver2, "_ckpt_thread", None) is None  # joined at exit
    async_losses = [m["train"]["loss"] for m in solver2.history]
    assert async_losses == sync_losses  # serialization strategy != numerics

    folder = tmp_path / "async" / "outputs" / "xps" / xp_signature(args)
    assert (folder / "checkpoint.tpk").exists()
    assert not (folder / "checkpoint.tmp").exists()
    assert (folder / "best.dmx").exists()

    # resume from the async-written checkpoint
    solver3 = get_solver(args)
    assert len(solver3.history) == args.epochs
    solver3.train()  # no-op replay
    assert [m["train"]["loss"] for m in solver3.history] == async_losses


def test_evaluate_nonhq_stems(tmp_path):
    """The reference's `test.nonhq` path (evaluate.py:81-85 — compressed
    MUSDB via musdb+stempeg+ffmpeg) evaluated natively: .stem.mp4 files read
    through the multi-stream AudioFile (stream 0 = mixture, 1-4 = SigSep
    stem order), no external package or binary."""
    from demucs_tpu import avio
    from demucs_tpu.evaluate import evaluate
    from demucs_tpu.models import demucs as m_d
    from demucs_tpu.models.registry import Model
    from demucs_tpu.train.config import TrainArgs, apply_overrides

    if not avio.available():
        pytest.skip("libavcodec shim unavailable")
    if dta.ffmpeg_available():
        pytest.skip("AudioFile prefers the ffmpeg backend when installed")

    rng = np.random.default_rng(3)
    nonhq = tmp_path / "musdb18"
    (nonhq / "test").mkdir(parents=True)
    T = 3 * SR
    originals = {}
    for name in ("StemTrackA", "StemTrackB"):
        stems = (rng.standard_normal((4, 2, T)) * 0.05).astype(np.float32)
        streams = np.concatenate([stems.sum(0, keepdims=True), stems])
        avio.encode_multi(nonhq / "test" / f"{name}.stem.mp4",
                          streams, SR, "alac")
        originals[name] = stems

    cfg = m_d.DemucsConfig(sources=SOURCES, channels=4, depth=2,
                           resample=False, dconv_mode=0, samplerate=SR,
                           segment=2.0)
    model = Model("demucs", cfg, m_d.init_demucs(cfg))

    targs = apply_overrides(TrainArgs(), {
        "dset.musdb": str(tmp_path / "unused_hq"),
        "test.nonhq": str(nonhq),
        "test.shifts": 0,
        "test.workers": 0,
        "misc.num_workers": 0,
    })

    class _Shim:
        pass

    solver = _Shim()
    solver.args = targs
    solver.model = model
    solver.folder = tmp_path / "evalout"
    result = evaluate(solver, compute_sdr=False)
    for source in SOURCES:
        assert f"nsdr_{source}" in result
    assert np.isfinite(result["nsdr"])
