"""FULL released-width forward parity vs the PyTorch reference.

Round 1 proved parity only at reduced width (tests/common.py::
small_htdemucs_kwargs); these tests run the SHIPPED topologies — htdemucs
channels 48 / nfft 4096 / 44.1 kHz / 7.8 s / 5 transformer layers /
bottom_channels 512 (grids/mmi.py recipe), hdemucs channels 48 / depth 6,
demucs v2 channels 64 / depth 6 — and require >= 100 dB SNR against torch.

Each family also checks (or, on first run, generates) a compact golden
fixture (first-second crop, fp16) in tests/goldens/, so full-width parity
can be re-verified on machines without torch.
"""

from pathlib import Path

import numpy as np
import pytest
import torch

import jax

from common import FULL_KWARGS, make_full_pair, random_mix

GOLDEN_DIR = Path(__file__).parent / "goldens"

# seconds of forward input per family (htdemucs pads to its 7.8 s train
# segment regardless; the others ring through valid_length)
_SECONDS = {"htdemucs": 7.8, "hdemucs": 3.0, "demucs": 3.0}


@pytest.mark.full
@pytest.mark.parametrize("family", ["htdemucs", "hdemucs", "demucs"])
def test_full_width_forward_parity(family):
    from demucs_tpu.train.solver import model_forward_fn

    tmodel, cfg, params = make_full_pair(family)
    sr = FULL_KWARGS[family]["samplerate"]
    L = int(_SECONDS[family] * sr)
    mix = random_mix((1, 2, L), seed=100)

    with torch.no_grad():
        want = tmodel(torch.from_numpy(mix)).numpy()
    del tmodel
    fwd = jax.jit(model_forward_fn(family), static_argnames=("cfg",))
    got = np.asarray(fwd(params, mix, cfg))

    assert got.shape == want.shape == (1, 4, 2, L)
    diff = got - want
    snr = 10 * np.log10((want**2).sum() / max((diff**2).sum(), 1e-20))
    print(f"full-width {family}: SNR {snr:.1f} dB, "
          f"max_abs {np.abs(diff).max():.3g}, ref_scale {np.abs(want).max():.3g}")
    assert snr >= 100.0, (family, snr)

    # compact golden: first second, fp16 (torch-free regression fixture)
    crop = want[..., :sr].astype(np.float16)
    golden_path = GOLDEN_DIR / f"full_{family}.npz"
    if golden_path.exists():
        golden = np.load(golden_path)["stems"]
        np.testing.assert_allclose(
            got[..., :sr], golden.astype(np.float32),
            atol=2e-3 * max(np.abs(want).max(), 1.0),
            err_msg=f"{family} drifted from committed full-width golden")
    else:  # first generation (committed to the repo)
        GOLDEN_DIR.mkdir(exist_ok=True)
        np.savez_compressed(golden_path, stems=crop,
                            meta=np.array([100, sr, L], np.int64))
