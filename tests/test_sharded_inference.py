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

    single = device_apply_model(model, mix, shifts=0, transfer_dtype=None,
                                input_transfer_dtype=None)
    mesh = make_mesh(8, platform="cpu")
    sharded = sharded_apply_model(model, mix, mesh=mesh, shifts=0,
                                  transfer_dtype=None, input_transfer_dtype=None)
    assert sharded.shape == single.shape
    np.testing.assert_allclose(sharded, single, atol=5e-5, rtol=1e-4)


class _FixedOffsets:
    def __init__(self, values):
        self.values = list(values)

    def randint(self, a, b):
        v = self.values.pop(0)
        assert a <= v <= b
        return v


def test_bag_fanout_matches_sequential(cpu_devices):
    """Homogeneous bag fanned out over the mesh ('model' axis) == sequential
    device engine (the reference runs bag members one after another;
    SURVEY.md §2.10 calls the fan-out the TPU win)."""
    from demucs_tpu.models.registry import BagOfModels

    _, cfg, params = make_htdemucs_pair()
    _, _, params2 = make_htdemucs_pair(seed=7)
    weights = [[1.0, 2.0, 1.0, 0.5], [0.5, 1.0, 1.0, 1.0]]
    bag = BagOfModels([Model("htdemucs", cfg, params),
                       Model("htdemucs", cfg, params2)], weights=weights)

    L = int(1.6 * bag.models[0].segment * bag.models[0].samplerate)
    mix = random_mix((1, 2, L), seed=41)

    sequential = device_apply_model(bag, mix, shifts=0, transfer_dtype=None,
                                    input_transfer_dtype=None)
    mesh = make_mesh(2, platform="cpu")  # fan-out requires devices == models
    fanned = device_apply_model(bag, mix, mesh=mesh, shifts=0,
                                transfer_dtype=None, input_transfer_dtype=None)
    assert fanned.shape == sequential.shape
    np.testing.assert_allclose(fanned, sequential, atol=5e-5, rtol=1e-4)


def test_bag_fanout_group_dp_matches_sequential(cpu_devices):
    """More devices than members (8 devices, 2 models -> 4-way segment dp
    inside each fan-out group): the manual all_gather keeps the overlap-add
    order, so the result matches the sequential engine (up to forward
    batch-tiling noise, like the devices==models case)."""
    from demucs_tpu.models.registry import BagOfModels

    _, cfg, params = make_htdemucs_pair()
    _, _, params2 = make_htdemucs_pair(seed=7)
    weights = [[1.0, 2.0, 1.0, 0.5], [0.5, 1.0, 1.0, 1.0]]
    bag = BagOfModels([Model("htdemucs", cfg, params),
                       Model("htdemucs", cfg, params2)], weights=weights)

    L = int(2.3 * bag.models[0].segment * bag.models[0].samplerate)
    mix = random_mix((1, 2, L), seed=43)

    sequential = device_apply_model(bag, mix, shifts=0, transfer_dtype=None,
                                    input_transfer_dtype=None)
    mesh = make_mesh(8, platform="cpu")  # 2 models x 4-way dp
    fanned = device_apply_model(bag, mix, mesh=mesh, shifts=0,
                                transfer_dtype=None, input_transfer_dtype=None)
    assert fanned.shape == sequential.shape
    np.testing.assert_allclose(fanned, sequential, atol=5e-5, rtol=1e-4)


def test_bag_fanout_shifts_offset_order(cpu_devices):
    """Shift offsets are drawn model-major, matching the sequential engine."""
    from demucs_tpu.models.registry import BagOfModels

    _, cfg, params = make_htdemucs_pair()
    _, _, params2 = make_htdemucs_pair(seed=7)
    bag = BagOfModels([Model("htdemucs", cfg, params),
                       Model("htdemucs", cfg, params2)])

    L = int(1.2 * bag.models[0].segment * bag.models[0].samplerate)
    mix = random_mix((1, 2, L), seed=42)
    offsets = [777, 2025, 31, 1500]

    sequential = device_apply_model(bag, mix, shifts=2, transfer_dtype=None,
                                    input_transfer_dtype=None,
                                    rng=_FixedOffsets(offsets))
    mesh = make_mesh(2, platform="cpu")
    fanned = device_apply_model(bag, mix, mesh=mesh, shifts=2,
                                transfer_dtype=None, input_transfer_dtype=None,
                                rng=_FixedOffsets(offsets))
    np.testing.assert_allclose(fanned, sequential, atol=5e-5, rtol=1e-4)


def test_bag_fanout_four_members_int16_shifts(cpu_devices):
    """htdemucs_ft-shaped: 4 homogeneous members, one per device, random
    shifts, int16 wire — matches the sequential engine."""
    from demucs_tpu.models.registry import BagOfModels

    pairs = [make_htdemucs_pair(seed=s) for s in (0, 7, 11, 13)]
    cfg = pairs[0][1]
    bag = BagOfModels([Model("htdemucs", cfg, p) for _, _, p in pairs])

    L = int(1.3 * bag.models[0].segment * bag.models[0].samplerate)
    mix = random_mix((1, 2, L), seed=43)
    offsets = [100, 900, 250, 1700]

    sequential = device_apply_model(bag, mix, shifts=1, transfer_dtype="int16",
                                    input_transfer_dtype=None,
                                    rng=_FixedOffsets(list(offsets)))
    mesh = make_mesh(4, platform="cpu")
    fanned = device_apply_model(bag, mix, mesh=mesh, shifts=1,
                                transfer_dtype="int16",
                                input_transfer_dtype=None,
                                rng=_FixedOffsets(list(offsets)))
    assert fanned.shape == sequential.shape
    scale = max(float(np.abs(sequential).max()), 1e-3)
    assert np.abs(fanned - sequential).max() < 1e-3 * scale
