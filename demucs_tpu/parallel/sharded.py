"""Multi-chip separation: data-parallel segments over a device mesh.

SURVEY.md §2.10: the reference's only parallel axis is DP; here overlap-add
segments are the data-parallel unit (BASELINE.md scaling axis). The engine
shards the per-track segment batch over the ``dp`` mesh axis; bag members can
additionally be fanned out across process groups (multi-host).
"""

from __future__ import annotations

import typing as tp

import numpy as np


def make_mesh(n_devices: tp.Optional[int] = None, platform: tp.Optional[str] = None):
    """1-D ``(dp,)`` mesh over the available devices."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices(platform) if platform else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("dp",))


def default_platform() -> str:
    """The platform computations land on by default: an explicit
    ``jax_default_device`` (set by ``jax.default_device(...)`` scopes, e.g.
    ``Separator(device="cpu")``) wins, else the backend priority order. The
    single source of truth for engine/mesh auto-selection."""
    import jax

    try:
        default = jax.config.jax_default_device
        if default is not None:
            return default if isinstance(default, str) else default.platform
        return jax.default_backend()
    except RuntimeError:
        return "cpu"


def auto_mesh():
    """A ``(dp,)`` mesh over this process's accelerator devices when there
    are several; None on CPU or single-chip hosts. Lets the CLI/API use
    every local chip without flags.

    Local devices only: in a multi-process run each rank separates its own
    (rank-sharded, per-rank-divergent) tracks, so programs must never span
    other processes' chips."""
    import jax
    from jax.sharding import Mesh

    if default_platform() == "cpu":
        return None
    try:
        devs = jax.local_devices()
    except RuntimeError:
        return None
    if len(devs) <= 1:
        return None
    return Mesh(np.array(devs), axis_names=("dp",))


def sharded_apply_model(model, mix: np.ndarray, *, mesh=None, **kwargs) -> np.ndarray:
    """``apply_model`` with segments sharded over a mesh (defaults to all
    local devices)."""
    from demucs_tpu.inference.engine import device_apply_model

    if mesh is None:
        mesh = make_mesh()
    return device_apply_model(model, mix, mesh=mesh, **kwargs)
