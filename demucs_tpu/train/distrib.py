"""Multi-host coordination for training.

Behavioral reference: ``demucs/distrib.py`` (torch.distributed/NCCL) replaced
by JAX-native primitives per SURVEY.md §2.10:

- world size / rank come from ``jax.process_count()`` / ``jax.process_index()``
- metric averaging is a weighted psum over a global mesh
  (distrib.py:32-42 all_reduce equivalent)
- object share uses ``multihost_utils`` broadcast
- data sharding strides the dataset by process (distrib.py:84-100)

Every helper keeps the reference's ``world_size == 1`` fast path so the whole
suite runs single-process.
"""

from __future__ import annotations

import typing as tp

import numpy as np


def init() -> None:
    """Initialize multi-host JAX if launched distributed (dora-style init,
    distrib.py:24-29). No-op single-process.

    Two trigger paths:

    * explicit env — ``JAX_COORDINATOR_ADDRESS`` (+ optional
      ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``), as set per-rank by
      ``python -m demucs_tpu.launcher``;
    * managed cluster — Slurm/OpenMPI/k8s/TPU-pod allocations are
      auto-detected by ``jax.distributed`` (the reference's dora+submitit
      Slurm integration, conf/config.yaml:294-297, collapses to
      ``srun python -m demucs_tpu.train ...``). Only multi-task *srun steps*
      trigger this (SLURM_STEP_NUM_TASKS is set by srun per step), so a
      plain ``python ...`` in an sbatch batch script — which still inherits
      SLURM_NTASKS from the allocation — stays single-process instead of
      blocking on peers that will never start.
    """
    import os

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    step_tasks = int(os.environ.get("SLURM_STEP_NUM_TASKS", "1") or 1)
    if not coord and step_tasks <= 1:
        return
    import jax

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        # CPU multi-process collectives need the gloo backend.
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    num = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    jax.distributed.initialize(
        coord,
        num_processes=int(num) if num else None,
        process_id=int(pid) if pid else None,
    )


def world_size() -> int:
    import jax

    return jax.process_count()


def rank() -> int:
    import jax

    return jax.process_index()


def _allgather_obj(obj: tp.Any) -> tp.List[tp.Any]:
    """Allgather one picklable object per process (fixed-size collectives:
    a sizes allgather, then a padded-payload allgather — consistent across
    ranks even when the objects differ in size/keys)."""
    import pickle

    from jax.experimental import multihost_utils

    data = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    sizes = multihost_utils.process_allgather(
        np.array([len(data)], dtype=np.int64))
    max_size = int(sizes.max())
    padded = np.zeros(max_size, dtype=np.uint8)
    padded[: len(data)] = data
    all_payloads = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(all_payloads[r][: int(sizes[r][0])].tobytes())
        for r in range(world_size())
    ]


def average(metrics: tp.Mapping[str, float], count: float = 1.0) -> tp.Dict[str, float]:
    """Weighted average of metrics across processes (distrib.py:32-42).

    Robust to ranks carrying different key sets (e.g. a rank that drew zero
    valid batches contributes nothing): each key averages over the ranks
    that have it."""
    if world_size() == 1:
        return dict(metrics)
    sums: tp.Dict[str, float] = {}
    counts: tp.Dict[str, float] = {}
    for m, c in _allgather_obj((dict(metrics), float(count))):
        for k, v in m.items():
            sums[k] = sums.get(k, 0.0) + v * c
            counts[k] = counts.get(k, 0.0) + c
    return {k: sums[k] / counts[k] for k in sums}


def barrier() -> None:
    if world_size() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("demucs_tpu_barrier")


def share(obj: tp.Any = None, src: int = 0) -> tp.Any:
    """Broadcast a picklable object from ``src`` to all processes
    (distrib.py:61-81). Every process must call with the same ``src``."""
    if world_size() == 1:
        return obj
    return _allgather_obj(obj if rank() == src else None)[src]


def shard_indices(n: int) -> range:
    """Round-robin shard ``range(n)`` by rank (evaluate.py:94 pattern)."""
    return range(rank(), n, world_size())


class DataLoader:
    """Minimal batched loader over a map-style dataset, rank-sharded.

    The reference uses torch DataLoader + DistributedSampler
    (distrib.py:84-100); here a deterministic shuffle (seeded per epoch)
    strides examples across processes and yields stacked numpy batches.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = True, num_workers: int = 0, seed: int = 42):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _per_rank(self) -> int:
        # DistributedSampler semantics: pad to ceil(n/world)*world with
        # wrapped-around indices so EVERY rank draws the same example count.
        # Unequal counts would deadlock multi-host training: the rank with
        # an extra batch blocks in the train step's cross-process gradient
        # all-reduce while the others have moved on to the metric allgather.
        return -(-len(self.dataset) // world_size())

    def __len__(self):
        n = self._per_rank()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        n = len(self.dataset)
        if self.shuffle:
            order = np.random.default_rng(self.seed + self.epoch).permutation(n)
        else:
            order = np.arange(n)
        world = world_size()
        if world > 1:
            total = self._per_rank() * world
            if total > n:
                order = np.concatenate([order, order[: total - n]])
        mine = order[rank()::world]
        if self.num_workers > 0:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(self.num_workers) as pool:
                batch_ids = [
                    mine[i : i + self.batch_size]
                    for i in range(0, len(mine), self.batch_size)
                ]
                for ids in batch_ids:
                    if self.drop_last and len(ids) < self.batch_size:
                        continue
                    items = list(pool.map(self.dataset.__getitem__, [int(j) for j in ids]))
                    yield np.stack(items)
        else:
            batch = []
            for idx in mine:
                batch.append(self.dataset[int(idx)])
                if len(batch) == self.batch_size:
                    yield np.stack(batch)
                    batch = []
            if batch and not self.drop_last:
                yield np.stack(batch)


def loader(dataset, batch_size: int, shuffle: bool = False, klass=DataLoader, **kw):
    """Create a rank-sharded loader (distrib.py:84-100)."""
    return klass(dataset, batch_size, shuffle=shuffle, **kw)
