"""Cheap distributed-cluster self-test: ``python -m demucs_tpu.launcher
-n N --platform cpu --module demucs_tpu.distprobe``.

Each rank initializes the cluster through ``distrib.init`` (the same path the
trainer takes), runs one global psum over the full device mesh, checks the
result, and prints ``DISTPROBE_OK <rank>/<world> devices=<n>``. Any mismatch
exits nonzero, which makes the launcher tear the job down — a 10-second
answer to "is this multi-host setup wired correctly?" before committing to a
training run.
"""

from __future__ import annotations

import sys


def main() -> int:
    from demucs_tpu.train import distrib

    distrib.init()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    rank = distrib.rank()
    world = distrib.world_size()

    devs = np.array(jax.devices())
    mesh = Mesh(devs, ("dp",))
    sharding = NamedSharding(mesh, P("dp"))
    n = devs.size

    # One row per device, filled with the owning rank (device ids are not
    # contiguous across processes); the global sum proves the reduction saw
    # every process's shards.
    ldevs = jax.local_devices()
    local = [jnp.full((1, 4), float(rank), jnp.float32) for _ in ldevs]
    x = jax.make_array_from_single_device_arrays(
        (n, 4), sharding, [jax.device_put(v, d)
                           for v, d in zip(local, ldevs)])

    @jax.jit
    def total(a):
        return jnp.sum(a)

    got = float(total(x))
    want = 4.0 * len(ldevs) * sum(range(world))
    if abs(got - want) > 1e-6:
        print(f"DISTPROBE_FAIL rank {rank}: psum {got} != {want}",
              flush=True)
        return 1

    # Cross-process object share (evaluate.py:153-155 pattern).
    merged = {}
    for src in range(world):
        merged.update(distrib.share({f"r{rank}": rank}, src))
    if merged != {f"r{r}": r for r in range(world)}:
        print(f"DISTPROBE_FAIL rank {rank}: share {merged}", flush=True)
        return 1

    print(f"DISTPROBE_OK {rank}/{world} devices={n}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
