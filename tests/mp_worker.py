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

    step = make_sharded_train_step(ht.forward, cfg, tcfg, optimizer, mesh)
    params, opt_state, metrics = step(params, opt_state, sources, key)
    loss = float(np.asarray(jax.device_get(metrics["loss"])))
    assert np.isfinite(loss), loss

    # every process must agree on the (replicated) loss
    losses = distrib.share([loss], src=0)
    assert abs(losses[0] - loss) < 1e-6

    print(f"WORKER_OK {rank} loss={loss:.5f}", flush=True)


if __name__ == "__main__":
    main()
    sys.exit(0)
