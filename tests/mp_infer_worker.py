"""Worker for the multi-process INFERENCE test: 2 JAX processes x 2 virtual
CPU devices run the homogeneous-bag fan-out over a process-spanning 4-device
mesh; stems must match the single-process sequential engine bit-for-bit-ish.

Mirrors tests/mp_worker.py's harness (launched by
tests/test_multiprocess_inference.py with MP_COORD/MP_RANK/MP_WORLD)."""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
          if "host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(
    _flags + ["--xla_force_host_platform_device_count=2"])

import jax  # noqa: E402

jax.config.update("jax_cpu_collectives_implementation", "gloo")
rank = int(os.environ["MP_RANK"])
world = int(os.environ["MP_WORLD"])
jax.distributed.initialize(os.environ["MP_COORD"], num_processes=world,
                           process_id=rank)
jax.config.update("jax_default_device", jax.local_devices(backend="cpu")[0])

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from demucs_tpu.inference.engine import device_apply_model  # noqa: E402
from demucs_tpu.models import htdemucs as ht  # noqa: E402
from demucs_tpu.models.registry import BagOfModels, Model  # noqa: E402


def main():
    cfg = ht.HTDemucsConfig(channels=8, nfft=1024, depth=4, t_layers=2,
                            t_heads=4, segment=0.25, samplerate=8000,
                            use_train_segment=True)
    # identical member weights on every process (seeded init)
    models = [Model("htdemucs", cfg, ht.init_htdemucs(cfg, seed=s))
              for s in range(4)]
    bag = BagOfModels(models)

    L = int(2.6 * cfg.segment * cfg.samplerate)
    mix = (np.random.default_rng(7).standard_normal((1, 2, L)) * 0.1
           ).astype(np.float32)

    # single-process sequential reference on this process's devices only
    want = device_apply_model(bag, mix, shifts=0, overlap=0.25,
                              transfer_dtype=None, input_transfer_dtype=None)

    # process-spanning fan-out: 4 global devices (2 per process), one bag
    # member per device
    devices = np.array(jax.devices()).reshape(-1)
    assert devices.size == 4, devices
    mesh = Mesh(devices, axis_names=("dp",))
    got = device_apply_model(bag, mix, shifts=0, overlap=0.25,
                             transfer_dtype=None, input_transfer_dtype=None,
                             mesh=mesh)

    err = np.abs(got - want).max()
    assert err < 2e-5, err
    print(f"INFER_OK {rank} err={err:.2e} sum={float(np.abs(got).sum()):.6f}",
          flush=True)


if __name__ == "__main__":
    main()
    sys.exit(0)
