"""Local multi-process launcher: the analog of the reference's
``dora run -d`` (one process per device, torch.distributed rendezvous —
docs/training.md:45-83, demucs/distrib.py:24-29).

Spawns N ranks of ``python -m <module> <overrides...>`` wired for
``jax.distributed``:

  * rank 0 hosts the coordinator on ``127.0.0.1:<port>``;
  * each rank gets ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``, consumed by ``demucs_tpu.train.distrib.init``;
  * ``--platform cpu`` pins children to the CPU backend with
    ``--devices-per-process`` virtual devices each (gloo collectives) — the
    multi-host-style bring-up used by the test suite; on a real TPU pod the
    default platform keeps each process's local chips;
  * child output is streamed with a ``[rank N]`` prefix; the first failing
    rank terminates the rest (exact PIDs, never patterns).

Managed clusters don't need this module: under Slurm (multi-task) or OpenMPI,
``distrib.init`` auto-detects the allocation via ``jax.distributed`` —
``srun python -m demucs_tpu.train ...`` is the whole integration.

Usage:
    python -m demucs_tpu.launcher -n 2 --platform cpu -- epochs=1 ...
    python -m demucs_tpu.launcher -n 2 --platform cpu \
        --module demucs_tpu.distprobe        # cheap cluster self-test
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys
import threading
import time
import typing as tp


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _child_env(rank: int, world: int, port: int, platform: str,
               devices_per_process: int) -> tp.Dict[str, str]:
    env = dict(os.environ)
    env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    env["JAX_NUM_PROCESSES"] = str(world)
    env["JAX_PROCESS_ID"] = str(rank)
    if platform == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
        # Accelerator plugins (e.g. the axon TPU sitecustomize in this
        # deployment) own jax.process_count(); they must not load in
        # CPU-pinned children.
        env["PYTHONPATH"] = ":".join(
            p for p in env.get("PYTHONPATH", "").split(":")
            if p and "axon_site" not in p)
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "host_platform_device_count" not in f]
        flags.append(
            f"--xla_force_host_platform_device_count={devices_per_process}")
        env["XLA_FLAGS"] = " ".join(flags)
    return env


def _stream(proc: subprocess.Popen, rank: int) -> None:
    assert proc.stdout is not None
    for line in proc.stdout:
        sys.stdout.write(f"[rank {rank}] {line}")
        sys.stdout.flush()


def launch(module: str, overrides: tp.Sequence[str], *, n: int,
           platform: str = "", devices_per_process: int = 1,
           port: tp.Optional[int] = None) -> int:
    """Run ``n`` coordinated ranks of ``python -m module overrides...``;
    returns the first nonzero exit code (0 when all ranks succeed)."""
    port = port or _free_port()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs: tp.List[subprocess.Popen] = []
    threads: tp.List[threading.Thread] = []
    for rank in range(n):
        env = _child_env(rank, n, port, platform, devices_per_process)
        env["PYTHONPATH"] = repo_root + ":" + env.get("PYTHONPATH", "")
        proc = subprocess.Popen(
            [sys.executable, "-m", module, *overrides],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        procs.append(proc)
        t = threading.Thread(target=_stream, args=(proc, rank), daemon=True)
        t.start()
        threads.append(t)

    code = 0
    try:
        # Wait for ANY rank to exit (not index order): if rank k>0 crashes
        # while rank 0 is wedged in a collective waiting for it, an ordered
        # procs[0].wait() would hang until jax's heartbeat timeout.
        live = list(procs)
        while live:
            done = [p for p in live if p.poll() is not None]
            if not done:
                time.sleep(0.1)
                continue
            live = [p for p in live if p.poll() is None]
            for p in done:
                if p.returncode != 0 and code == 0:
                    code = p.returncode
                    # One rank failed: the collective is wedged for the
                    # others — terminate the exact processes we spawned.
                    for other in live:
                        other.terminate()
    finally:
        for proc in procs:
            if proc.poll() is None:
                proc.kill()
        for t in threads:
            t.join(timeout=5)
    return code


def main(argv: tp.Optional[tp.Sequence[str]] = None) -> int:
    parser = argparse.ArgumentParser(
        "demucs_tpu.launcher",
        description="Spawn N coordinated jax.distributed processes locally.")
    parser.add_argument("-n", "--num-processes", type=int, required=True)
    parser.add_argument("--module", default="demucs_tpu.train",
                        help="module to run per rank (default: the trainer)")
    parser.add_argument("--platform", default="",
                        choices=["", "cpu"],
                        help="'cpu': pin children to the CPU backend with "
                             "virtual devices (gloo) — multi-host-style "
                             "bring-up without accelerators")
    parser.add_argument("--devices-per-process", type=int, default=1,
                        help="virtual CPU devices per rank (with "
                             "--platform cpu)")
    parser.add_argument("--port", type=int, default=None,
                        help="coordinator port (default: auto)")
    parser.add_argument("overrides", nargs="*",
                        help="key=value overrides passed to every rank")
    args = parser.parse_args(argv)
    return launch(args.module, args.overrides, n=args.num_processes,
                  platform=args.platform,
                  devices_per_process=args.devices_per_process,
                  port=args.port)


if __name__ == "__main__":
    sys.exit(main())
