"""Training entry point: config -> model/optimizer/datasets -> Solver.

Behavioral reference: ``demucs/train.py``. Hydra/Dora are replaced by the
dataclass config tree + XP signature hashing in ``demucs_tpu.train.config``;
XP folders live under ``{out_dir}/xps/{sig}`` and auto-resume from their
checkpoint, Dora-style.

Usage:
    python -m demucs_tpu.train model=htdemucs dset.musdb=/path epochs=2 ...
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

from demucs_tpu.models.registry import Model
from demucs_tpu.train import distrib
from demucs_tpu.train.config import (
    TrainArgs,
    apply_overrides,
    expand_presets,
    parse_cli_overrides,
    xp_signature,
)
from demucs_tpu.train.solver import Solver, make_optimizer
from demucs_tpu.train.wav import get_musdb_wav_datasets, get_wav_datasets

logger = logging.getLogger(__name__)


def get_model(args: TrainArgs) -> Model:
    """Model dispatch with common extras (train.py:57-72)."""
    extra = {
        "sources": tuple(args.dset.sources),
        "audio_channels": args.dset.channels,
        "samplerate": args.dset.samplerate,
        "segment": args.model_segment or 4 * args.dset.segment,
    }
    kw = dict(args.model_args)
    kw.update(extra)
    if args.model == "htdemucs":
        from demucs_tpu.models import htdemucs as m

        cfg = m.HTDemucsConfig(**kw)
        params = m.init_htdemucs(cfg, seed=args.seed)
    elif args.model == "hdemucs":
        from demucs_tpu.models import hdemucs as m

        cfg = m.HDemucsConfig(**kw)
        params = m.init_hdemucs(cfg, seed=args.seed)
    elif args.model == "demucs":
        from demucs_tpu.models import demucs as m

        cfg = m.DemucsConfig(**kw)
        params = m.init_demucs(cfg, seed=args.seed)
    else:
        raise ValueError(f"Unknown model {args.model}")
    return Model(args.model, cfg, params)


class ConcatDataset:
    def __init__(self, datasets):
        self.datasets = [d for d in datasets if len(d)]
        self.lengths = [len(d) for d in self.datasets]

    def __len__(self):
        return sum(self.lengths)

    def __getitem__(self, index):
        for d, n in zip(self.datasets, self.lengths):
            if index < n:
                return d[index]
            index -= n
        raise IndexError(index)


class Subset:
    """Lazy index view (torch Subset): items load at iteration time, not at
    dataset construction — full-cv valid items are whole tracks (~hundreds
    of MB each), so materializing them up front would blow host RAM."""

    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, index):
        return self.dataset[self.indices[index]]


def random_subset(dataset, max_samples: int, seed: int = 42):
    """utils.py:113-119 equivalent (numpy rng instead of torch.Generator)."""
    if max_samples >= len(dataset):
        return dataset
    import numpy as np

    perm = np.random.default_rng(seed).permutation(len(dataset))
    return Subset(dataset, [int(i) for i in perm[:max_samples]])


def get_datasets(args: TrainArgs):
    """Dataset composition (train.py:109-148)."""
    train_set: list = []
    valid_set: list = []
    if args.dset.use_musdb and args.dset.musdb:
        train_set, valid_set = get_musdb_wav_datasets(args.dset)
    if args.dset.wav:
        extra_train, extra_valid = get_wav_datasets(args.dset)
        if len(args.dset.sources) <= 4 and train_set:
            train_set = ConcatDataset([train_set, extra_train])
            valid_set = ConcatDataset([valid_set, extra_valid])
        else:
            train_set, valid_set = extra_train, extra_valid
    if args.dset.wav2:
        extra_train, extra_valid = get_wav_datasets(args.dset, "wav2")
        weight = args.dset.wav2_weight
        if weight is not None:
            b, e = len(train_set), len(extra_train)
            reps = max(1, round(e / b * (1 / weight - 1)))
        else:
            reps = 1
        train_set = ConcatDataset([train_set] * reps + [extra_train])
        if args.dset.wav2_valid:
            if weight is not None:
                # the reference keeps only a weighted random subset of the
                # extra valid set (train.py:136-142), so wav2 can't dominate
                # validation/best-model selection
                b = len(valid_set)
                n_kept = int(round(weight * b / (1 - weight)))
                valid_set = ConcatDataset(
                    [valid_set, random_subset(extra_valid, n_kept)])
            else:
                valid_set = ConcatDataset([valid_set, extra_valid])
    if args.dset.valid_samples is not None:
        valid_set = random_subset(valid_set, args.dset.valid_samples)
    assert len(train_set)
    assert len(valid_set)
    return train_set, valid_set


def get_solver(args: TrainArgs, model_only: bool = False) -> Solver:
    """(train.py:151-204)."""
    distrib.init()
    model = get_model(args)
    if args.misc.show:
        from demucs_tpu.zoo.torch_load import flatten_state
        import numpy as np

        flat = flatten_state(model.params)
        mb = sum(int(np.prod(v.shape)) for v in flat.values()) * 4 / 2**20
        logger.info("Size: %.1f MB", mb)
        sys.exit(0)

    optimizer = make_optimizer(args, model)
    assert args.batch_size % distrib.world_size() == 0
    per_process_batch = args.batch_size // distrib.world_size()

    sig = xp_signature(args)
    folder = Path(args.out_dir) / "xps" / sig

    if model_only:
        return Solver({}, model, optimizer, args, folder)

    train_set, valid_set = get_datasets(args)

    if args.augment.repitch.proba:
        from demucs_tpu.train.repitch import RepitchedWrapper

        vocals = []
        if "vocals" in args.dset.sources:
            vocals.append(list(args.dset.sources).index("vocals"))
        train_set = RepitchedWrapper(
            train_set, proba=args.augment.repitch.proba,
            max_tempo=args.augment.repitch.max_tempo, vocals=vocals,
            samplerate=args.dset.samplerate,
        )

    logger.info("train/valid set size: %d %d", len(train_set), len(valid_set))
    train_loader = distrib.loader(
        train_set, batch_size=per_process_batch, shuffle=True,
        num_workers=args.misc.num_workers, drop_last=True)
    if args.dset.full_cv:
        valid_loader = distrib.loader(
            valid_set, batch_size=1, shuffle=False, drop_last=False,
            num_workers=args.misc.num_workers)
    else:
        valid_loader = distrib.loader(
            valid_set, batch_size=per_process_batch, shuffle=False,
            num_workers=args.misc.num_workers, drop_last=True)
    loaders = {"train": train_loader, "valid": valid_loader}
    return Solver(loaders, model, optimizer, args, folder)


def main(argv=None) -> None:
    from demucs_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    argv = sys.argv[1:] if argv is None else argv
    bad = [a for a in argv if "=" not in a]
    if bad:
        # Dora/Hydra reject unknown arguments; silently ignoring a typo'd
        # token would train the default config under the default signature.
        raise SystemExit(
            f"arguments must be key=value overrides, got: {bad}")
    args = TrainArgs()
    overrides = expand_presets(parse_cli_overrides(argv))
    apply_overrides(args, overrides)
    sig = xp_signature(args)
    logger.info("XP signature: %s", sig)
    solver = get_solver(args)
    solver.train()


if __name__ == "__main__":
    main()
