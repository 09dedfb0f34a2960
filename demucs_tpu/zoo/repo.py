"""Model repositories: remote zoo, local dirs, bag-of-model definitions.

Behavioral reference: ``demucs/repo.py`` + ``demucs/pretrained.py``. The
remote registry (signature -> URL) and the released bag definitions from
``demucs/remote/*.yaml`` are inlined as data; local repos support both the
reference's ``.th`` checkpoints (loaded through the torch bridge) and our
native ``.dmx`` format (numpy archive + JSON config, no torch required —
see ``demucs_tpu.zoo.native``).
"""

from __future__ import annotations

import typing as tp
from hashlib import sha256
from pathlib import Path

from demucs_tpu.models.registry import BagOfModels, Model

ROOT_URL = "https://dl.fbaipublicfiles.com/demucs/"

# Signature -> URL map, from the reference's remote/files.txt.
REMOTE_FILES = {
    # MDX models (root: mdx_final/)
    **{
        sig_file.split("-", 1)[0]: ROOT_URL + "mdx_final/" + sig_file
        for sig_file in [
            "0d19c1c6-0f06f20e.th", "5d2d6c55-db83574e.th", "7d865c68-3d5dd56b.th",
            "7ecf8ec1-70f50cc9.th", "a1d90b5c-ae9d2452.th", "c511e2ab-fe698775.th",
            "cfa93e08-61801ae1.th", "e51eebcc-c1b80bdd.th", "6b9c2ca1-3fd82607.th",
            "b72baf4e-8778635e.th", "42e558d4-196e0e1b.th", "305bc58f-18378783.th",
            "14fc6a69-a89dd0ee.th", "464b36d7-e5a9386e.th", "7fd6ef75-a905dd85.th",
            "83fc094f-4a16d450.th", "1ef250f1-592467ce.th", "902315c2-b39ce9c9.th",
            "9a6b4851-03af0aa6.th", "fa0cb7f9-100d8bf4.th",
        ]
    },
    # Hybrid Transformer models (root: hybrid_transformer/)
    **{
        sig_file.split("-", 1)[0]: ROOT_URL + "hybrid_transformer/" + sig_file
        for sig_file in [
            "955717e8-8726e21a.th", "f7e0c4bc-ba3fe64a.th", "d12395a8-e57c48e6.th",
            "92cfc3b6-ef3bcb9c.th", "04573f0d-f3cf25b2.th", "75fc33f5-1941ce65.th",
            "5c90dfd2-34c22ccb.th",
        ]
    },
}

# Bag definitions, from the reference's remote/*.yaml.
REMOTE_BAGS: tp.Dict[str, dict] = {
    "htdemucs": {"models": ["955717e8"]},
    "htdemucs_ft": {
        "models": ["f7e0c4bc", "d12395a8", "92cfc3b6", "04573f0d"],
        "weights": [
            [1.0, 0.0, 0.0, 0.0],
            [0.0, 1.0, 0.0, 0.0],
            [0.0, 0.0, 1.0, 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ],
    },
    "htdemucs_6s": {"models": ["5c90dfd2"]},
    "hdemucs_mmi": {"models": ["75fc33f5"], "segment": 44},
    "mdx": {
        "models": ["0d19c1c6", "7ecf8ec1", "c511e2ab", "7d865c68"],
        "weights": [
            [1.0, 1.0, 0.0, 0.0],
            [0.0, 1.0, 0.0, 0.0],
            [1.0, 0.0, 1.0, 1.0],
            [1.0, 0.0, 1.0, 1.0],
        ],
        "segment": 44,
    },
    "mdx_extra": {"models": ["e51eebcc", "a1d90b5c", "5d2d6c55", "cfa93e08"], "segment": 44},
    "mdx_q": {
        "models": ["6b9c2ca1", "b72baf4e", "42e558d4", "305bc58f"],
        "weights": [
            [1.0, 1.0, 0.0, 0.0],
            [0.0, 1.0, 0.0, 0.0],
            [1.0, 0.0, 1.0, 1.0],
            [1.0, 0.0, 1.0, 1.0],
        ],
        "segment": 44,
    },
    "mdx_extra_q": {"models": ["83fc094f", "464b36d7", "14fc6a69", "7fd6ef75"], "segment": 44},
    "repro_mdx_a": {"models": ["9a6b4851", "1ef250f1", "fa0cb7f9", "902315c2"], "segment": 44},
    "repro_mdx_a_time_only": {
        "models": ["9a6b4851", "9a6b4851", "1ef250f1", "1ef250f1"], "segment": 44},
    "repro_mdx_a_hybrid_only": {
        "models": ["fa0cb7f9", "902315c2", "fa0cb7f9", "902315c2"], "segment": 44},
}


class ModelLoadingError(RuntimeError):
    pass


def check_checksum(path: Path, checksum: str) -> None:
    sha = sha256()
    with open(path, "rb") as file:
        while True:
            buf = file.read(2**20)
            if not buf:
                break
            sha.update(buf)
    actual_checksum = sha.hexdigest()[: len(checksum)]
    if actual_checksum != checksum:
        raise ModelLoadingError(
            f"Invalid checksum for file {path}, expected {checksum} but got {actual_checksum}"
        )


def _model_from_file(file: Path) -> Model:
    if str(file).endswith(".dmx") or str(file).endswith(".npz"):
        from demucs_tpu.zoo.native import load_native_model

        return load_native_model(file)
    from demucs_tpu.zoo.torch_load import load_th_model

    cfg, kind, params = load_th_model(file)
    return Model(kind, cfg, params)


class ModelOnlyRepo:
    def has_model(self, sig: str) -> bool:
        raise NotImplementedError()

    def get_model(self, sig: str) -> Model:
        raise NotImplementedError()

    def list_model(self) -> tp.Dict[str, tp.Union[str, Path]]:
        raise NotImplementedError()


class RemoteRepo(ModelOnlyRepo):
    """Downloads ``.th`` packages from the reference's public bucket into a
    local cache (no torch.hub; plain urllib + sha256 filename check)."""

    def __init__(self, models: tp.Optional[tp.Dict[str, str]] = None,
                 cache_dir: tp.Optional[Path] = None):
        self._models = dict(REMOTE_FILES if models is None else models)
        self.cache_dir = Path(
            cache_dir or Path.home() / ".cache" / "demucs_tpu" / "checkpoints"
        )

    def has_model(self, sig: str) -> bool:
        return sig in self._models

    def get_model(self, sig: str) -> Model:
        try:
            url = self._models[sig]
        except KeyError:
            raise ModelLoadingError(
                f"Could not find a pre-trained model with signature {sig}."
            )
        filename = url.rsplit("/", 1)[-1]
        target = self.cache_dir / filename
        checksum = filename.rsplit("-", 1)[-1].split(".", 1)[0]
        if not target.exists():
            self.cache_dir.mkdir(parents=True, exist_ok=True)
            import urllib.request

            try:
                tmp = target.with_suffix(".tmp")
                urllib.request.urlretrieve(url, tmp)
                # verify BEFORE installing into the cache (torch.hub
                # check_hash semantics): a captive portal / truncated
                # download must not poison the cache and fail every later
                # run until manually deleted.
                check_checksum(tmp, checksum)
                tmp.rename(target)
            except OSError as exc:
                raise ModelLoadingError(
                    f"Could not download {url} ({exc}). If this machine has no "
                    f"network access, place the checkpoint at {target} or use a "
                    "local --repo directory."
                )
            except ModelLoadingError:
                tmp.unlink(missing_ok=True)
                raise
        else:
            check_checksum(target, checksum)
        return _model_from_file(target)

    def list_model(self) -> tp.Dict[str, tp.Union[str, Path]]:
        return dict(self._models)


class LocalRepo(ModelOnlyRepo):
    """Scans ``*.th`` / ``*.dmx`` in a directory; ``SIG-CHECKSUM`` naming with
    sha256-prefix verification (repo.py:76-110)."""

    def __init__(self, root: Path):
        self.root = Path(root)
        self.scan()

    def scan(self):
        self._models: tp.Dict[str, Path] = {}
        self._checksums: tp.Dict[str, str] = {}
        for file in self.root.iterdir():
            if file.suffix in (".th", ".dmx", ".npz"):
                stem, dash, tail = file.stem.rpartition("-")
                if dash and len(tail) == 8 and all(
                        c in "0123456789abcdef" for c in tail):
                    # SIG-CHECKSUM naming (8-hex sha256 prefix); other
                    # dashes belong to the name itself — e.g. a user's
                    # "my-model-v2.dmx" loads unchecksummed instead of
                    # crashing the whole repo scan.
                    xp_sig = stem
                    self._checksums[xp_sig] = tail
                else:
                    xp_sig = file.stem
                if xp_sig in self._models:
                    raise ModelLoadingError(
                        f"Duplicate pre-trained model exist for signature {xp_sig}. "
                        "Please delete all but one."
                    )
                self._models[xp_sig] = file

    def has_model(self, sig: str) -> bool:
        return sig in self._models

    def get_model(self, sig: str) -> Model:
        try:
            file = self._models[sig]
        except KeyError:
            raise ModelLoadingError(
                f"Could not find pre-trained model with signature {sig}."
            )
        if sig in self._checksums:
            check_checksum(file, self._checksums[sig])
        return _model_from_file(file)

    def list_model(self) -> tp.Dict[str, tp.Union[str, Path]]:
        return dict(self._models)


class BagOnlyRepo:
    """Bag definitions: the inlined released registry + any ``*.yaml`` in a
    local repo directory (repo.py:113-145)."""

    def __init__(self, root: tp.Optional[Path], model_repo: ModelOnlyRepo,
                 bags: tp.Optional[tp.Dict[str, dict]] = None):
        self.root = Path(root) if root is not None else None
        self.model_repo = model_repo
        self._static_bags = dict(REMOTE_BAGS if bags is None else bags)
        self.scan()

    def scan(self):
        self._bags: tp.Dict[str, tp.Union[dict, Path]] = dict(self._static_bags)
        if self.root is not None and self.root.is_dir():
            self._bags = {}
            for file in self.root.iterdir():
                if file.suffix == ".yaml":
                    self._bags[file.stem] = file

    def has_model(self, name: str) -> bool:
        return name in self._bags

    def get_model(self, name: str) -> BagOfModels:
        try:
            bag = self._bags[name]
        except KeyError:
            raise ModelLoadingError(
                f"{name} is neither a single pre-trained model or a bag of models."
            )
        if isinstance(bag, Path):
            import yaml

            bag = yaml.safe_load(open(bag))
        signatures = bag["models"]
        models = [self.model_repo.get_model(sig) for sig in signatures]
        weights = bag.get("weights")
        segment = bag.get("segment")
        return BagOfModels(models, weights, segment)

    def list_model(self) -> tp.Dict[str, tp.Union[str, Path, dict]]:
        return dict(self._bags)


class AnyModelRepo:
    def __init__(self, model_repo: ModelOnlyRepo, bag_repo: BagOnlyRepo):
        self.model_repo = model_repo
        self.bag_repo = bag_repo

    def has_model(self, name_or_sig: str) -> bool:
        return self.model_repo.has_model(name_or_sig) or self.bag_repo.has_model(name_or_sig)

    def get_model(self, name_or_sig: str):
        if self.model_repo.has_model(name_or_sig):
            return self.model_repo.get_model(name_or_sig)
        return self.bag_repo.get_model(name_or_sig)

    def list_model(self) -> tp.Dict[str, tp.Union[str, Path, dict]]:
        models = self.model_repo.list_model()
        for key, value in self.bag_repo.list_model().items():
            models[key] = value
        return models
