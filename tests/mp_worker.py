"""Worker for the real multi-process (multi-host-style) test.

Launched by tests/test_multiprocess.py with env:
  MP_COORD (host:port), MP_RANK, MP_WORLD
Runs on CPU with 2 virtual devices per process; exercises distrib helpers and
one global data-parallel train step, printing "WORKER_OK <rank>" on success.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ["JAX_PLATFORMS"] = "cpu"
# exactly 2 virtual devices per process (replace any inherited count)
_flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
          if "host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(
    _flags + ["--xla_force_host_platform_device_count=2"])

import jax  # noqa: E402

jax.config.update("jax_cpu_collectives_implementation", "gloo")
rank = int(os.environ["MP_RANK"])
world = int(os.environ["MP_WORLD"])
jax.distributed.initialize(os.environ["MP_COORD"], num_processes=world,
                           process_id=rank)
jax.config.update("jax_default_device", jax.local_devices(backend="cpu")[0])

import time as _time  # noqa: E402

_T0 = _time.time()


def _mark(msg):
    print(f"[rank {rank} +{_time.time()-_T0:7.1f}s] {msg}", flush=True)


import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from demucs_tpu.train import distrib  # noqa: E402


def main():
    assert distrib.world_size() == world, distrib.world_size()
    assert distrib.rank() == rank

    # metric averaging (weighted all-reduce; distrib.py:32-42 equivalent)
    avg = distrib.average({"loss": float(rank)}, count=rank + 1)
    want = sum(r * (r + 1) for r in range(world)) / sum(r + 1 for r in range(world))
    assert abs(avg["loss"] - want) < 1e-9, (avg, want)

    # object share from each src (evaluate.py:153-155 pattern)
    merged = {}
    for src in range(world):
        merged.update(distrib.share({f"track{rank}": rank}, src))
    assert merged == {f"track{r}": r for r in range(world)}, merged

    # disjoint rank-sharded indices (share is a broadcast FROM src: every
    # process calls it with the same src, like evaluate.py:153-155)
    mine = set(distrib.shard_indices(7))
    all_sets = [distrib.share(mine, src=r) for r in range(world)]
    others = set().union(*(s for i, s in enumerate(all_sets) if i != rank))
    assert all_sets[rank] == mine
    assert not (mine & others) and len(mine | others) == 7

    _mark("distrib helpers done")
    distrib.barrier()

    # ONE global DP train step over the 2x2 (procs x local devices) mesh
    from demucs_tpu.models import htdemucs as ht
    from demucs_tpu.train.step import (
        TrainConfig, data_parallel_shardings, make_optimizer,
        make_sharded_train_step, put_global_batch,
    )

    cfg = ht.HTDemucsConfig(channels=8, nfft=1024, depth=4, t_layers=2,
                            t_heads=4, segment=0.25, samplerate=8000,
                            use_train_segment=True)
    tcfg = TrainConfig()
    params = ht.init_htdemucs(cfg, seed=0)
    optimizer = make_optimizer(tcfg)
    opt_state = optimizer.init(params)

    devices = np.array(jax.devices()).reshape(-1)  # 4 global devices
    mesh = Mesh(devices, axis_names=("dp",))
    replicated, batch_sharded = data_parallel_shardings(mesh)

    S, C, T = len(cfg.sources), cfg.audio_channels, cfg.training_length
    local = (np.random.default_rng(rank).standard_normal(
        (2, S, C, T)).astype(np.float32) * 0.1)  # 2 local examples -> global 4
    sources = put_global_batch(batch_sharded, local)
    params = jax.device_put(params, replicated)
    opt_state = jax.device_put(opt_state, replicated)
    key = jax.device_put(jax.random.PRNGKey(0), replicated)

    _mark("step-level: compiling")
    step = make_sharded_train_step(ht.forward, cfg, tcfg, optimizer, mesh)
    params, opt_state, metrics = step(params, opt_state, sources, key)
    loss = float(np.asarray(jax.device_get(metrics["loss"])))
    assert np.isfinite(loss), loss

    # every process must agree on the (replicated) loss
    losses = distrib.share([loss], src=0)
    assert abs(losses[0] - loss) < 1e-6

    _mark("step-level done; starting solver epoch")
    solver_loss = run_solver_epoch()

    print(f"WORKER_OK {rank} loss={loss:.5f} solver={solver_loss:.6f}",
          flush=True)


def run_solver_epoch() -> float:
    """Full Solver for one epoch across both processes: rank-0 metadata build
    + barrier, rank-sharded loaders, globally-sharded train step, all-reduced
    epoch metrics. Returns the epoch train loss (must agree across ranks)."""
    from demucs_tpu import audio as dta
    from demucs_tpu.train.config import TrainArgs, apply_overrides
    from demucs_tpu.train.train import get_solver

    sr = 8000
    sources = ("drums", "bass", "other", "vocals")
    shared = Path(os.environ["MP_SHARED"])
    root = shared / "musdb"
    if rank == 0:
        rng = np.random.default_rng(0)
        for subset, name in [("train", "TrackA"), ("train", "TrackB"),
                             ("train", "ValTrack"), ("test", "TestTrack")]:
            tdir = root / subset / name
            tdir.mkdir(parents=True, exist_ok=True)
            T = 4 * sr
            stems = []
            for source in sources:
                wav = (rng.standard_normal((2, T)) * 0.05).astype(np.float32)
                dta.write_wav(tdir / f"{source}.wav", wav, sr, as_float=True)
                stems.append(wav)
            dta.write_wav(tdir / "mixture.wav", sum(stems), sr, as_float=True)
    distrib.barrier()

    args = TrainArgs()
    args = apply_overrides(args, {
        "model": "demucs",
        "model_args": {"channels": 4, "depth": 2, "resample": False,
                       "dconv_mode": 0, "lstm_layers": 0},
        "dset.musdb": str(root),
        "dset.metadata": str(shared / "metadata"),
        "dset.samplerate": sr,
        "dset.segment": 2,
        "dset.shift": 0.25,
        "dset.valid_tracks": ("ValTrack",),
        "epochs": 1,
        "batch_size": 4,  # global; 2 per process, 2 local devices each
        "max_batches": 2,
        "augment.repitch.proba": 0.0,
        "augment.remix.group_size": 2,
        "test.every": 99,
        "test.sdr": False,
        "test.workers": 0,
        "test.shifts": 0,
        "misc.num_workers": 0,
        "out_dir": str(shared / "outputs"),
    })
    solver = get_solver(args)
    assert solver._mesh is not None and solver._mesh.devices.size == 4, (
        solver._mesh)
    _mark("solver built; training")
    solver.train()
    _mark("solver.train done")
    loss = float(solver.history[-1]["train"]["loss"])
    all_losses = [distrib.share([loss], src=r)[0] for r in range(world)]
    assert abs(all_losses[0] - all_losses[1]) < 1e-6, all_losses
    return loss


if __name__ == "__main__":
    main()
    sys.exit(0)
