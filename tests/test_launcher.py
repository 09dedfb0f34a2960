"""Local multi-process launcher (demucs_tpu.launcher): env wiring and a real
2-rank coordinated launch of the distributed probe."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from demucs_tpu.launcher import _child_env, launch  # noqa: E402


def test_child_env_wiring():
    env = _child_env(1, 4, 12345, "cpu", 2)
    assert env["JAX_COORDINATOR_ADDRESS"] == "127.0.0.1:12345"
    assert env["JAX_NUM_PROCESSES"] == "4"
    assert env["JAX_PROCESS_ID"] == "1"
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "--xla_force_host_platform_device_count=2" in env["XLA_FLAGS"]
    assert "axon_site" not in env.get("PYTHONPATH", "")


def test_child_env_default_platform_keeps_accelerators():
    import os

    env = _child_env(0, 2, 1, "", 1)
    assert env.get("JAX_PLATFORMS") == os.environ.get("JAX_PLATFORMS")
    assert env.get("PYTHONPATH", "") == os.environ.get("PYTHONPATH", "")
    assert env["JAX_PROCESS_ID"] == "0"


def test_two_rank_probe(capsys):
    rc = launch("demucs_tpu.distprobe", [], n=2, platform="cpu",
                devices_per_process=2)
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "[rank 0] DISTPROBE_OK 0/2 devices=4" in out, out
    assert "[rank 1] DISTPROBE_OK 1/2 devices=4" in out, out


def test_failing_rank_propagates(capsys):
    # a module that exits nonzero on one rank: use python -m with a module
    # that doesn't exist -> both ranks fail fast, launcher returns nonzero
    rc = launch("demucs_tpu.no_such_module", [], n=2, platform="cpu")
    assert rc != 0
