"""Pretrained model loading by name (behavioral ref: ``demucs/pretrained.py``)."""

from __future__ import annotations

import logging
import typing as tp
from pathlib import Path

from demucs_tpu.models.registry import BagOfModels, Model
from demucs_tpu.zoo.repo import (
    AnyModelRepo,
    BagOnlyRepo,
    LocalRepo,
    ModelLoadingError,
    RemoteRepo,
)

logger = logging.getLogger(__name__)

SOURCES = ("drums", "bass", "other", "vocals")
DEFAULT_MODEL = "htdemucs"


def demucs_unittest() -> Model:
    """Tiny in-process HDemucs (pretrained.py:27-29) — no download needed."""
    from demucs_tpu.models import hdemucs as m_h

    cfg = m_h.HDemucsConfig(sources=SOURCES, channels=4)
    params = m_h.init_hdemucs(cfg, seed=0)
    return Model("hdemucs", cfg, params)


def add_model_flags(parser) -> None:
    group = parser.add_mutually_exclusive_group(required=False)
    group.add_argument("-s", "--sig", help="Locally trained XP signature.")
    group.add_argument("-n", "--name", default=DEFAULT_MODEL,
                       help="Pretrained model name or signature. Default is htdemucs.")
    parser.add_argument("--repo", type=Path,
                        help="Folder containing all pre-trained models for use with -n.")


def make_repo(repo: tp.Optional[Path] = None) -> AnyModelRepo:
    if repo is None:
        model_repo: tp.Any = RemoteRepo()
        bag_repo = BagOnlyRepo(None, model_repo)
    else:
        repo = Path(repo)
        if not repo.is_dir():
            raise ModelLoadingError(f"{repo} must exist and be a directory.")
        model_repo = LocalRepo(repo)
        bag_repo = BagOnlyRepo(repo, model_repo)
    return AnyModelRepo(model_repo, bag_repo)


def get_model(name: str, repo: tp.Optional[Path] = None) -> tp.Union[Model, BagOfModels]:
    """Load by bag name or signature from the remote zoo or a local repo."""
    if name == "demucs_unittest":
        return demucs_unittest()
    return make_repo(repo).get_model(name)


def get_model_from_args(args):
    if getattr(args, "sig", None):
        return get_model(name=args.sig, repo=args.repo)
    if args.name is None:
        args.name = DEFAULT_MODEL
    return get_model(name=args.name, repo=args.repo)
