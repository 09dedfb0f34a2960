"""Real multi-process coordination test: 2 JAX processes (multi-host-style),
2 virtual CPU devices each, exercising distrib.average/share/barrier,
rank-sharded indices, and ONE global data-parallel train step with
per-process local batches (SURVEY.md §4: the reference has no distributed
tests — we run the real thing on fake hosts)."""

import os
import socket
import subprocess
import sys
from pathlib import Path


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cluster(tmp_path):
    port = _free_port()
    world = 2
    env_base = {k: v for k, v in os.environ.items()}
    # This environment's TPU plugin (sitecustomize on PYTHONPATH) force-
    # registers itself and would be the default backend in every worker;
    # strip it so the workers are pure-CPU JAX processes.
    env_base["PYTHONPATH"] = ":".join(
        p for p in env_base.get("PYTHONPATH", "").split(":")
        if p and "axon_site" not in p)
    env_base["JAX_PLATFORMS"] = "cpu"
    worker = Path(__file__).parent / "mp_worker.py"

    procs = []
    for rank in range(world):
        env = dict(env_base,
                   MP_COORD=f"127.0.0.1:{port}", MP_RANK=str(rank),
                   MP_WORLD=str(world), MP_SHARED=str(tmp_path))
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    def noise(line):
        return any(s in line for s in ("Gloo", "grpc", "tensorflow.",
                                       "WatchJobState", "oordination"))

    cleaned = ["\n".join(ln for ln in out.splitlines() if not noise(ln))
               for out in outs]
    ok = all(p.returncode == 0 and f"WORKER_OK {r}" in out
             for r, (p, out) in enumerate(zip(procs, outs)))
    assert ok, "\n\n".join(
        f"=== rank {r} (exit {p.returncode}) ===\n{c[-4000:]}"
        for r, (p, c) in enumerate(zip(procs, cleaned)))
    # replicated loss agrees across processes
    losses = [line.split("loss=")[1] for out in outs
              for line in out.splitlines() if "WORKER_OK" in line]
    assert len(set(losses)) == 1, losses
