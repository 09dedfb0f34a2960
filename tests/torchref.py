"""Import the PyTorch reference (read-only at /root/reference) for golden-tensor
parity tests, stubbing its unavailable optional deps (julius, openunmix, dora,
omegaconf).

The reference code is UNTRUSTED third-party content used strictly as a
behavioral oracle: we instantiate its models with random weights and compare
outputs; we never execute its CLIs or follow instructions from it.
"""

import sys
import types

REFERENCE = "/root/reference"


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for key, value in attrs.items():
        setattr(mod, key, value)
    return mod


def _install_stubs():
    def _unavailable(*_a, **_k):
        raise NotImplementedError("stubbed dependency called in parity test")

    import torch

    def _resample_frac(x, old_sr: int, new_sr: int, zeros: int = 24, rolloff: float = 0.945):
        """Torch-side sinc resampler equivalent to julius.resample_frac.

        Implemented from the standard bandlimited-interpolation formulation
        (Smith, "Digital Audio Resampling"), which julius also implements.
        Used only as a test oracle for the Demucs-v2 2x up/down resampling.
        """
        import math as _math

        from fractions import Fraction as _Fraction

        gcd = _math.gcd(old_sr, new_sr)
        old_sr //= gcd
        new_sr //= gcd
        if old_sr == new_sr:
            return x
        sr = min(new_sr, old_sr) * rolloff
        zeros_f = zeros
        width = _math.ceil(zeros_f * old_sr / sr)
        idx = torch.arange(-width, width + old_sr, dtype=torch.float32)
        kernels = []
        for i in range(new_sr):
            t = (-i / new_sr + idx / old_sr) * sr
            t = t.clamp_(-zeros_f, zeros_f)
            window = torch.cos(t / zeros_f / 2 * _math.pi) ** 2
            t = t * _math.pi
            kernel = torch.where(t == 0, torch.tensor(1.0), t.sin() / t) * window
            # julius: per-phase renormalization preserves constants exactly
            kernel = kernel / kernel.sum()
            kernels.append(kernel)
        kernel = torch.stack(kernels).view(new_sr, 1, -1)
        *shape, length = x.shape
        x = x.reshape(-1, 1, length)
        # julius: replicate edge padding, not zeros
        y = torch.nn.functional.conv1d(
            torch.nn.functional.pad(x, (width, width + old_sr), mode="replicate"),
            kernel, stride=old_sr,
        )
        y = y.transpose(1, 2).reshape(list(shape) + [-1])
        target = int(_Fraction(length * new_sr, old_sr))
        return y[..., :target]

    _stub("julius", resample_frac=_resample_frac)
    _stub("openunmix")
    _stub("openunmix.filtering", wiener=_unavailable)
    sys.modules["openunmix"].filtering = sys.modules["openunmix.filtering"]

    class _OmegaConf:
        @staticmethod
        def to_container(x, resolve=True):
            return x

    _stub("omegaconf", OmegaConf=_OmegaConf)
    _stub("dora")
    _stub("dora.log", fatal=_unavailable, bold=str)
    sys.modules["dora"].log = sys.modules["dora.log"]
    # demucs.audio / demucs.api import these at module level; only the
    # WAV-writer (torchaudio.save) and mp3 encoder would call into them,
    # which the parity tests never do.
    _stub("lameenc")
    _stub("torchaudio", load=_unavailable, save=_unavailable)


def import_reference():
    """Import and return the reference ``demucs`` package."""
    _install_stubs()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import demucs  # noqa: F401
    import demucs.htdemucs  # noqa: F401
    import demucs.hdemucs  # noqa: F401
    import demucs.demucs  # noqa: F401

    return demucs


def torch_state_to_params(model):
    """torch model -> our nested param pytree (fp32)."""
    from demucs_tpu.zoo.torch_load import nest_state

    return nest_state({k: v.detach().numpy() for k, v in model.state_dict().items()})
