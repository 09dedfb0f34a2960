"""Generate the openunmix Wiener golden fixture on a NETWORKED machine.

The reference's ``cac=False`` models refine masks with
``openunmix.filtering.wiener`` (demucs/hdemucs.py:661-687). openunmix is not
installable in the build environment, so our JAX EM (demucs_tpu/ops/wiener.py)
is gated by analytic tests; this script produces the real-oracle fixture:

    pip install openunmix            # networked machine
    python tools/dump_wiener_golden.py
    # -> tests/goldens/wiener_openunmix.npz  (commit it)

tests/test_wiener.py::test_against_openunmix_golden then runs automatically.
"""
import sys as _sys
import pathlib as _pl

_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import torch
    from openunmix.filtering import wiener as ou_wiener

    rng = np.random.default_rng(12345)
    T, F, C, S = 50, 64, 2, 4
    iterations = 2
    mix = (rng.standard_normal((T, F, C))
           + 1j * rng.standard_normal((T, F, C))).astype(np.complex64)
    targets = np.abs(rng.standard_normal((T, F, C, S))).astype(np.float32)

    # openunmix takes real-imag stacked (T, F, C, 2) mixtures
    mix_ri = torch.view_as_real(torch.from_numpy(mix))
    expected = ou_wiener(torch.from_numpy(targets), mix_ri, iterations,
                         softmask=False, residual=False)
    expected = torch.view_as_complex(expected.contiguous()).numpy()

    out = _pl.Path(__file__).resolve().parent.parent / "tests" / "goldens"
    out.mkdir(exist_ok=True)
    np.savez_compressed(out / "wiener_openunmix.npz", mix=mix, targets=targets,
                        iterations=np.int64(iterations), expected=expected)
    print(f"wrote {out / 'wiener_openunmix.npz'}: expected shape {expected.shape}")


if __name__ == "__main__":
    main()
