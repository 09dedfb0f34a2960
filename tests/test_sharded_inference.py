"""Multi-chip inference on the virtual 8-device CPU mesh: sharded segment
batch produces identical stems to the single-device engine."""

import numpy as np

from common import make_htdemucs_pair, random_mix

from demucs_tpu.inference.engine import device_apply_model
from demucs_tpu.models.registry import Model
from demucs_tpu.parallel.sharded import make_mesh, sharded_apply_model


def test_sharded_matches_single(cpu_devices):
    _, cfg, params = make_htdemucs_pair()
    model = Model("htdemucs", cfg, params)
    L = int(2.2 * model.segment * model.samplerate)
    mix = random_mix((1, 2, L), seed=40)

    single = device_apply_model(model, mix, shifts=0, transfer_dtype=None, input_transfer_dtype=None)
    mesh = make_mesh(8, platform="cpu")
    sharded = sharded_apply_model(model, mix, mesh=mesh, shifts=0, transfer_dtype=None, input_transfer_dtype=None)
    assert sharded.shape == single.shape
    np.testing.assert_allclose(sharded, single, atol=5e-5, rtol=1e-4)
