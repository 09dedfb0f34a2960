"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip sharding tests run on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``), per the test strategy in
SURVEY.md §4 (the reference has no distributed tests; we do better by running
the real pjit/shard_map paths on fake devices).

The axon TPU plugin in this environment ignores ``JAX_PLATFORMS``, so we pin
``jax_default_device`` to a CPU device after import; mesh-based tests must
build their mesh from ``jax.devices("cpu")`` (see ``cpu_devices`` fixture).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])

# Persistent compilation cache: repeat suite runs skip recompiles.
from demucs_tpu.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bounded_executable_memory():
    """XLA:CPU JIT code memory is finite: with the full suite's hundreds of
    live compiled executables, a late big compile segfaults deterministically
    (see CLAUDE.md; the crash point drifts as tests are added — it has hit
    test_wiener and test_tp so far). Dropping executable caches at every
    module boundary bounds the live set; the persistent compilation cache
    makes the re-loads cheap."""
    jax.clear_caches()


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices("cpu")
    assert len(devs) >= 8, devs
    return devs
