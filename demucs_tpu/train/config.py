"""Training configuration tree + XP signatures.

Behavioral reference: ``conf/config.yaml`` (Hydra/OmegaConf) and Dora's
config-delta hashing (docs/training.md:45-83). Here: plain dataclasses with
YAML/dotted-key overrides and an XP signature that hashes only the delta from
defaults, so signatures are stable when defaults gain new fields — the same
property Dora provides.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import typing as tp
from pathlib import Path


@dataclasses.dataclass
class DsetConfig:
    musdb: str = ""
    musdb_samplerate: int = 44100
    use_musdb: bool = True
    wav: tp.Optional[str] = None
    wav2: tp.Optional[str] = None
    wav2_weight: tp.Optional[float] = None
    wav2_valid: bool = False
    segment: float = 11
    shift: float = 1
    train_valid: bool = False
    full_cv: bool = True
    samplerate: int = 44100
    channels: int = 2
    normalize: bool = True
    metadata: str = "./metadata"
    sources: tp.Tuple[str, ...] = ("drums", "bass", "other", "vocals")
    valid_samples: tp.Optional[int] = None
    valid_tracks: tp.Optional[tp.Tuple[str, ...]] = None


@dataclasses.dataclass
class TestConfig:
    save: bool = False
    best: bool = True
    # Path to the non-HQ (compressed .stem.mp4) MUSDB for evaluation
    # (conf/config.yaml:38); read natively via the multi-stream AudioFile.
    nonhq: tp.Optional[str] = None
    workers: int = 2
    every: int = 20
    split: bool = True
    shifts: int = 1
    overlap: float = 0.25
    sdr: bool = True
    metric: str = "loss"
    # Quantize track lengths on the device engine so variable-length test
    # tracks share compiled executables (deviation confined to the final
    # chunk; see device_apply_model). None = exact lengths.
    length_bucket_seconds: tp.Optional[float] = None


@dataclasses.dataclass
class OptimConfig:
    lr: float = 3e-4
    momentum: float = 0.9
    beta2: float = 0.999
    loss: str = "l1"
    optim: str = "adam"
    weight_decay: float = 0.0
    clip_grad: float = 0.0


@dataclasses.dataclass
class RepitchConfig:
    proba: float = 0.2
    max_tempo: float = 12


@dataclasses.dataclass
class RemixConfig:
    proba: float = 1.0
    group_size: int = 4


@dataclasses.dataclass
class ScaleConfig:
    proba: float = 1.0
    min: float = 0.25
    max: float = 1.25


@dataclasses.dataclass
class AugmentTreeConfig:
    shift_same: bool = False
    repitch: RepitchConfig = dataclasses.field(default_factory=RepitchConfig)
    remix: RemixConfig = dataclasses.field(default_factory=RemixConfig)
    scale: ScaleConfig = dataclasses.field(default_factory=ScaleConfig)
    flip: bool = True


@dataclasses.dataclass
class EmaConfig:
    batch: tp.Tuple[float, ...] = ()
    epoch: tp.Tuple[float, ...] = ()


@dataclasses.dataclass
class SvdConfig:
    penalty: float = 0.0
    min_size: float = 0.1
    dim: int = 1
    niters: int = 2
    powm: bool = False
    proba: float = 1.0
    conv_only: bool = False
    convtr: bool = False
    bs: int = 1


@dataclasses.dataclass
class QuantConfig:
    diffq: tp.Optional[float] = None
    qat: tp.Optional[int] = None
    min_size: float = 0.2
    group_size: int = 8


@dataclasses.dataclass
class MiscConfig:
    num_workers: int = 2
    num_prints: int = 4
    show: bool = False
    verbose: bool = False
    # Serialize checkpoints in a background thread: the device->host fetch
    # of params/optimizer/EMA banks (~538 MB at released width) overlaps
    # the next epoch's compute instead of stalling it — measured 20-30 s
    # per epoch over this deployment's relay (BENCHMARKS.md Training,
    # r5 overfit run). JAX arrays are immutable, so capturing the epoch's
    # pytree references is snapshot-safe; writes stay atomic
    # (tmp + rename) and the loop joins the writer before the next
    # checkpoint and at exit.
    async_checkpoint: bool = False


@dataclasses.dataclass
class TrainArgs:
    """Root config — conf/config.yaml equivalents."""

    dset: DsetConfig = dataclasses.field(default_factory=DsetConfig)
    test: TestConfig = dataclasses.field(default_factory=TestConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    augment: AugmentTreeConfig = dataclasses.field(default_factory=AugmentTreeConfig)
    ema: EmaConfig = dataclasses.field(default_factory=EmaConfig)
    svd: SvdConfig = dataclasses.field(default_factory=SvdConfig)
    quant: QuantConfig = dataclasses.field(default_factory=QuantConfig)
    misc: MiscConfig = dataclasses.field(default_factory=MiscConfig)

    epochs: int = 360
    batch_size: int = 64
    # Rematerialize the forward during backprop (jax.checkpoint): trades
    # FLOPs for HBM, for long-segment fine-tuning (mmi_ft: segments 15-18 s).
    remat: bool = False
    max_batches: tp.Optional[int] = None
    seed: int = 42
    debug: bool = False
    valid_apply: bool = True
    flag: tp.Optional[str] = None
    save_every: tp.Optional[int] = None
    weights: tp.Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    continue_from: tp.Optional[str] = None
    continue_pretrained: tp.Optional[str] = None
    pretrained_repo: tp.Optional[str] = None
    continue_best: bool = True
    continue_opt: bool = False

    model: str = "htdemucs"
    model_segment: tp.Optional[float] = None
    # Per-model hyperparameter overrides (merged into the model config
    # dataclass), e.g. {"channels": 48, "t_layers": 5}.
    model_args: tp.Dict[str, tp.Any] = dataclasses.field(default_factory=dict)

    out_dir: str = "./outputs"


def _to_plain(obj):
    if dataclasses.is_dataclass(obj):
        return {f.name: _to_plain(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [_to_plain(v) for v in obj]
    if isinstance(obj, dict):
        return {k: _to_plain(v) for k, v in obj.items()}
    return obj


def _set_dotted(args, key: str, value):
    parts = key.split(".")
    node = args
    for part in parts[:-1]:
        if not hasattr(node, part):
            raise KeyError(f"unknown config section {part!r} in override {key!r}")
        node = getattr(node, part)
    name = parts[-1]
    # Reject typos: a silently-created attribute would train with the default
    # value AND hash to the default XP signature (xp_signature only walks
    # dataclass fields), resuming/overwriting the wrong experiment.
    if dataclasses.is_dataclass(node) and name not in {
        f.name for f in dataclasses.fields(node)
    }:
        raise KeyError(f"unknown config key {key!r}")
    current = getattr(node, name, None)
    if isinstance(current, tuple) and isinstance(value, list):
        value = tuple(value)
    setattr(node, name, value)


def apply_overrides(args: TrainArgs, overrides: tp.Mapping[str, tp.Any]) -> TrainArgs:
    """Apply dotted-key overrides, e.g. {"optim.lr": 1e-4, "model": "demucs"}."""
    for key, value in overrides.items():
        _set_dotted(args, key, value)
    return args


def parse_cli_overrides(tokens: tp.Sequence[str]) -> tp.Dict[str, tp.Any]:
    """Parse Hydra-style ``key=value`` CLI tokens with YAML value parsing."""
    import re

    import yaml

    out = {}
    for token in tokens:
        if "=" not in token:
            raise ValueError(f"Override {token!r} must be key=value")
        key, value = token.split("=", 1)
        quoted = len(value) >= 2 and value[0] in "\"'" and value[-1] == value[0]
        parsed = yaml.safe_load(value) if value != "" else None
        # YAML 1.1 keeps "1e-4" a string (no mantissa dot); treat it as
        # float — but never for explicitly quoted values: a released
        # signature like continue_from="955717e8" must stay a string.
        if (not quoted and isinstance(parsed, str) and re.fullmatch(
                r"[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+", parsed)):
            parsed = float(parsed)
        out[key] = parsed
    return out


# Dataset presets, mirroring the reference's Hydra config group
# ``conf/dset/*.yaml`` (selected with ``dset=NAME``). The reference yamls pin
# FAIR-internal dataset paths; here the structural knobs (rates, epochs,
# augment policy, musdb usage) are inlined and the wav roots are placeholders
# to override (``dset.wav=/path``).
DSET_PRESETS: tp.Dict[str, tp.Dict[str, tp.Any]] = {
    # conf/dset/musdb44.yaml
    "musdb44": {"dset.samplerate": 44100, "dset.channels": 2},
    # conf/dset/extra44.yaml — musdb + extra stems
    "extra44": {"dset.wav": "<ALLSTEMS_44>", "dset.samplerate": 44100,
                "dset.channels": 2, "epochs": 320},
    # conf/dset/extra_test.yaml — + musdb test as training data
    "extra_test": {"dset.wav": "<ALLSTEMS_TEST_44>", "dset.samplerate": 44100,
                   "dset.channels": 2, "epochs": 320, "max_batches": 700,
                   "test.sdr": False, "test.every": 500},
    # conf/dset/extra_mmi_goodclean.yaml — the htdemucs training set
    "extra_mmi_goodclean": {
        "dset.wav": "<ALLSTEMS_44>", "dset.wav2": "<MMI44_GOODCLEAN>",
        "dset.wav2_weight": None, "dset.wav2_valid": False,
        "dset.valid_samples": 100, "dset.samplerate": 44100,
        "dset.channels": 2, "epochs": 1200},
    # conf/dset/auto_mus.yaml — automix over musdb train (tools/automix.py)
    "auto_mus": {
        "dset.wav": "<AUTOMIX_MUSDB>", "dset.samplerate": 44100,
        "dset.channels": 2, "epochs": 360, "max_batches": 300,
        "test.every": 4, "augment.shift_same": True,
        "augment.scale.proba": 0.5, "augment.remix.proba": 0,
        "augment.repitch.proba": 0},
    # conf/dset/auto_extra_test.yaml
    "auto_extra_test": {
        "dset.wav": "<AUTOMIX_EXTRA_TEST>", "dset.samplerate": 44100,
        "dset.channels": 2, "epochs": 320, "max_batches": 500,
        "augment.shift_same": True, "augment.scale.proba": 0.0,
        "augment.remix.proba": 0, "augment.repitch.proba": 0},
    # conf/dset/aetl.yaml — automix + extra + musdb test, more remixes
    "aetl": {
        "dset.wav": "<AETL>", "dset.samplerate": 44100, "dset.channels": 2,
        "epochs": 320, "max_batches": 500, "augment.shift_same": True,
        "augment.scale.proba": 0.0, "augment.remix.proba": 0,
        "augment.repitch.proba": 0},
    # conf/dset/sdx23_bleeding.yaml / sdx23_labelnoise.yaml
    "sdx23_bleeding": {
        "dset.wav": "<MOISESDB23_BLEEDING>", "dset.use_musdb": False,
        "dset.samplerate": 44100, "dset.channels": 2, "epochs": 320},
    "sdx23_labelnoise": {
        "dset.wav": "<MOISESDB23_LABELNOISE>", "dset.use_musdb": False,
        "dset.samplerate": 44100, "dset.channels": 2, "epochs": 320},
}


def expand_presets(overrides: tp.Mapping[str, tp.Any]) -> tp.Dict[str, tp.Any]:
    """Expand a Hydra-style ``dset=NAME`` group selection into its preset
    overrides (explicit keys win over the preset's)."""
    if "dset" not in overrides:
        return dict(overrides)
    out: tp.Dict[str, tp.Any] = {}
    for key, value in overrides.items():
        if key == "dset":
            if value not in DSET_PRESETS:
                raise KeyError(
                    f"unknown dset preset {value!r}; available: "
                    f"{sorted(DSET_PRESETS)}")
            for pk, pv in DSET_PRESETS[value].items():
                out.setdefault(pk, pv)
        else:
            out[key] = value
    # explicit keys win regardless of position
    for key, value in overrides.items():
        if key != "dset":
            out[key] = value
    return out


def xp_signature(args: TrainArgs) -> str:
    """Dora-style XP signature: sha1 of the delta from default config."""
    default = _to_plain(TrainArgs())
    current = _to_plain(args)

    def delta(d, c, prefix=""):
        out = {}
        for key, cur in c.items():
            ref_val = d.get(key)
            if isinstance(cur, dict) and isinstance(ref_val, dict):
                sub = delta(ref_val, cur, prefix + key + ".")
                out.update(sub)
            elif cur != ref_val:
                out[prefix + key] = cur
        return out

    d = delta(default, current)
    payload = json.dumps(d, sort_keys=True)
    return hashlib.sha1(payload.encode()).hexdigest()[:8]


def load_yaml_config(path: tp.Union[str, Path]) -> tp.Dict[str, tp.Any]:
    import yaml

    with open(path) as f:
        data = yaml.safe_load(f) or {}

    def flatten(d, prefix=""):
        out = {}
        for key, value in d.items():
            if isinstance(value, dict):
                out.update(flatten(value, prefix + key + "."))
            else:
                out[prefix + key] = value
        return out

    return flatten(data)
