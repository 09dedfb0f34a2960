"""Experiment grids: declarative hyperparameter sweeps.

Behavioral reference: ``demucs/grids/*.py`` (Dora explorers). Here a grid is a
pure function returning a list of override dicts for
``demucs_tpu.train.config.TrainArgs``; the launcher is external (each entry
maps to one ``python -m demucs_tpu.train key=value ...`` invocation, one XP
signature each). ``python -m demucs_tpu.grids NAME`` prints the override sets
and their signatures.
"""

from __future__ import annotations

import typing as tp

Grid = tp.List[tp.Dict[str, tp.Any]]


def _merged(*dicts: dict) -> dict:
    out: dict = {}
    for d in dicts:
        out.update(d)
    return out


def mmi() -> Grid:
    """htdemucs training grid (grids/mmi.py): the recipe that produced the
    released hybrid-transformer models."""
    base = {
        "test.shifts": 0,
        "model": "htdemucs",
        "model_args": {"dconv_mode": 3, "depth": 4, "t_dropout": 0.02, "t_layers": 5},
        "max_batches": 800,
        "ema.epoch": (0.9, 0.95),
        "ema.batch": (0.9995, 0.9999),
        "dset.segment": 10,
        "batch_size": 32,
    }
    grid: Grid = []
    for t_layers in (5, 7):
        for bottom_channels in (0, 512):
            args = dict(base)
            args["model_args"] = _merged(
                base["model_args"], {"t_layers": t_layers, "bottom_channels": bottom_channels})
            grid.append(args)
    # hdemucs baselines from the same grid
    grid.append(_merged(base, {"model": "hdemucs", "model_args": {}}))
    return grid


def mmi_ft() -> Grid:
    """Per-source fine-tuning grid (grids/mmi_ft.py) — the htdemucs_ft recipe:
    one model per source with weights [0,..,1,..,0], lower lr, adamw+wd,
    grad clip, 50 epochs."""
    ft = {
        "optim.lr": 1e-4,
        "augment.remix.proba": 0,
        "augment.scale.proba": 0,
        "augment.shift_same": True,
        "model_args": {"t_weight_decay": 0.05},
        "batch_size": 8,
        "optim.clip_grad": 5,
        "optim.optim": "adamw",
        "epochs": 50,
        "ema.epoch": (),
        "continue_pretrained": "955717e8",
        "continue_best": True,
    }
    grid: Grid = []
    for segment in (10, 15):
        for source in range(4):
            w = [0.0] * 4
            w[source] = 1.0
            grid.append(_merged(ft, {"weights": tuple(w), "dset.segment": segment}))
    return grid


def repro() -> Grid:
    """Hybrid Demucs v3 paper reproduction (grids/repro.py): time-only,
    hybrid, and hybrid+CaC variants at 600 epochs."""
    base = {"ema.epoch": (0.9995,), "ema.batch": (0.9995,), "epochs": 600}
    demucs_base = _merged(base, {"model": "demucs", "model_args": {"dconv_mode": 3}})
    hdemucs_base = _merged(base, {"model": "hdemucs", "model_args": {}})
    return [
        demucs_base,
        _merged(hdemucs_base, {"model_args": {"cac": False, "wiener_iters": 0,
                                              "end_iters": 0}}),
        hdemucs_base,  # CaC
    ]


def mdx() -> Grid:
    """MDX competition track A recipe skeleton (grids/mdx.py)."""
    base = {
        "epochs": 360,
        "model": "hdemucs",
        "dset.segment": 11,
        "ema.batch": (0.9995,),
    }
    return [base, _merged(base, {"model": "demucs", "model_args": {"dconv_mode": 3}})]


def repro_ft(continue_from: str = "<REPRO_SIG>",
             automix_wav: str = "<AUTOMIX_OUT>") -> Grid:
    """Fine-tune a completed ``repro`` XP (grids/repro_ft.py): widened EMA
    banks, 4 epochs on the automix set (tools/automix.py output passed as
    the extra wav set — the reference binds dset=auto_mus) at segment 28,
    lr 1e-4, model_segment 44 (the released mdx_extra-era bag segment)."""
    return [{
        "continue_from": continue_from,
        "dset.wav": automix_wav,
        "ema.epoch": (0.9, 0.95),
        "ema.batch": (0.9995, 0.9999),
        "test.every": 1,
        "test.sdr": True,
        "epochs": 4,
        "dset.segment": 28,
        "dset.shift": 2,
        "augment.remix.proba": 0,
        "augment.scale.proba": 0,
        "augment.shift_same": True,
        "batch_size": 16,
        "optim.lr": 1e-4,
        "model_segment": 44,
    }]


# Not ported (documented gaps): grids/mdx_refine.py and grids/mdx_extra.py
# re-launch completed MDX XPs with diffq quantization (diffq is gated — no
# installable package/spec, COVERAGE.md §2.5) and the `extra44`/`extra_test`
# private datasets; grids/sdx23.py targets the SDX23 private data.


GRIDS: tp.Dict[str, tp.Callable[[], Grid]] = {
    "mmi": mmi,
    "mmi_ft": mmi_ft,
    "repro": repro,
    "repro_ft": repro_ft,
    "mdx": mdx,
}


def main(argv=None) -> None:
    import sys

    from demucs_tpu.train.config import TrainArgs, apply_overrides, xp_signature

    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] not in GRIDS:
        print(f"usage: python -m demucs_tpu.grids {{{','.join(GRIDS)}}}")
        raise SystemExit(1)
    for overrides in GRIDS[argv[0]]():
        args = apply_overrides(TrainArgs(), overrides)
        print(xp_signature(args), overrides)
