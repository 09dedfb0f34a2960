"""distrib helpers (single-process fast paths + loader semantics) and the
config system (yaml load, overrides, signatures)."""

import numpy as np

from demucs_tpu.train import distrib
from demucs_tpu.train.config import (
    TrainArgs, apply_overrides, load_yaml_config, parse_cli_overrides, xp_signature,
)


class _RangeSet:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.full((2, 3), float(i), dtype=np.float32)


def test_single_process_fast_paths():
    assert distrib.world_size() == 1
    assert distrib.rank() == 0
    assert distrib.average({"a": 1.0}) == {"a": 1.0}
    distrib.barrier()
    assert distrib.share({"x": 2}) == {"x": 2}
    assert list(distrib.shard_indices(5)) == [0, 1, 2, 3, 4]


def test_loader_batching_and_epochs():
    ds = _RangeSet(10)
    loader = distrib.loader(ds, batch_size=3, shuffle=True, drop_last=True)
    assert len(loader) == 3
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0].shape == (3, 2, 3)
    loader.set_epoch(1)
    batches2 = list(loader)
    assert not all(np.array_equal(a, b) for a, b in zip(batches, batches2))
    # deterministic per epoch
    loader.set_epoch(1)
    batches3 = list(loader)
    assert all(np.array_equal(a, b) for a, b in zip(batches2, batches3))


def test_loader_pads_ranks_to_equal_batch_counts(monkeypatch):
    """DistributedSampler semantics: with n not divisible by world, index
    lists are padded (wrap-around) so every rank yields the SAME number of
    batches — unequal counts would deadlock the cross-process gradient
    all-reduce (one rank in the train step, the others in the metric
    allgather)."""
    ds = _RangeSet(7)
    monkeypatch.setattr(distrib, "world_size", lambda: 2)
    counts, seen = [], []
    for r in (0, 1):
        monkeypatch.setattr(distrib, "rank", lambda r=r: r)
        loader = distrib.loader(ds, batch_size=2, shuffle=False,
                                drop_last=True)
        batches = list(loader)
        assert len(batches) == len(loader)
        counts.append(len(batches))
        seen.extend(b for batch in batches for b in batch[:, 0, 0].tolist())
    assert counts[0] == counts[1] == 2
    # all 7 originals appear at least once across ranks (wrap duplicates ok)
    assert set(int(v) for v in seen) == set(range(7))


def test_loader_workers_match_serial():
    ds = _RangeSet(8)
    serial = list(distrib.loader(ds, batch_size=2))
    threaded = list(distrib.loader(ds, batch_size=2, num_workers=3))
    assert all(np.array_equal(a, b) for a, b in zip(serial, threaded))


def test_cli_override_parsing():
    ov = parse_cli_overrides(["optim.lr=1e-4", "epochs=2", "weights=[0,1,0,0]",
                             "dset.musdb=/x", "continue_from=null"])
    assert ov["optim.lr"] == 1e-4
    assert ov["epochs"] == 2
    assert ov["weights"] == [0, 1, 0, 0]
    assert ov["continue_from"] is None
    args = apply_overrides(TrainArgs(), ov)
    assert args.optim.lr == 1e-4
    assert args.weights == (0, 1, 0, 0)


def test_yaml_config_roundtrip(tmp_path):
    cfg_file = tmp_path / "exp.yaml"
    cfg_file.write_text("optim:\n  lr: 0.0001\nbatch_size: 16\n")
    flat = load_yaml_config(cfg_file)
    args = apply_overrides(TrainArgs(), flat)
    assert args.optim.lr == 1e-4 and args.batch_size == 16


def test_signature_ignores_default_restating():
    a = apply_overrides(TrainArgs(), {"optim.lr": 3e-4})  # restates the default
    assert xp_signature(a) == xp_signature(TrainArgs())


def test_grids_produce_distinct_signatures():
    from demucs_tpu.grids import GRIDS, resolve

    for name in GRIDS:
        sigs = [xp_signature(apply_overrides(TrainArgs(), ov))
                for ov in resolve(name)]
        assert len(sigs) == len(set(sigs)), name
