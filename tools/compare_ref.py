"""Numerical parity harness: our model vs the PyTorch reference on real audio.

The analog of the fork's ``tools/compare_onnx.py`` (L2/MAE/MaxAbs metrics,
compare_onnx.py:94-99): loads a ``.th`` checkpoint (or builds a random-weight
pair), runs both forwards on the same wav/segment, prints error metrics.

Usage:
    python tools/compare_ref.py --th model.th --wav track.wav
    python tools/compare_ref.py --random  # random-weight htdemucs pair
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent / "tests"))

import argparse

import numpy as np


def metrics(got: np.ndarray, want: np.ndarray) -> dict:
    diff = got - want
    return {
        "l2": float(np.sqrt((diff**2).sum())),
        "mae": float(np.abs(diff).mean()),
        "max_abs": float(np.abs(diff).max()),
        "ref_scale": float(np.abs(want).max()),
        "snr_db": float(10 * np.log10((want**2).sum() / max((diff**2).sum(), 1e-20))),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--th", type=str, help="reference .th checkpoint")
    parser.add_argument("--wav", type=str, help="input wav (else synthetic noise)")
    parser.add_argument("--random", action="store_true",
                        help="compare random-weight htdemucs pair (reduced width)")
    parser.add_argument("--full", choices=["htdemucs", "hdemucs", "demucs"],
                        help="compare a FULL released-width random-weight pair "
                        "(htdemucs: ch 48 / nfft 4096 / 7.8 s / 5 layers / "
                        "bottom_channels 512)")
    parser.add_argument("--seconds", type=float, default=None)
    args = parser.parse_args()

    import jax

    try:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    except RuntimeError:
        pass
    import torch

    from demucs_tpu.train.solver import model_forward_fn

    if args.full:
        from common import make_full_pair

        tmodel, cfg, params = make_full_pair(args.full)
        kind = args.full
    elif args.random or not args.th:
        from common import make_htdemucs_pair

        tmodel, cfg, params = make_htdemucs_pair()
        kind = "htdemucs"
    else:
        from torchref import import_reference

        import_reference()
        from demucs.states import load_model as ref_load_model

        from demucs_tpu.zoo.torch_load import load_th_model

        tmodel = ref_load_model(args.th).eval()
        cfg, kind, params = load_th_model(args.th)

    sr = cfg.samplerate
    seconds = args.seconds or float(cfg.segment)
    L = int(seconds * sr)
    if args.wav:
        from demucs_tpu.audio import read_audio

        wav, _ = read_audio(args.wav, samplerate=sr, channels=cfg.audio_channels)
        mix = wav[None, :, :L].astype(np.float32)
    else:
        mix = (np.random.default_rng(0).standard_normal(
            (1, cfg.audio_channels, L)) * 0.1).astype(np.float32)

    with torch.no_grad():
        want = tmodel(torch.from_numpy(mix)).numpy()
    forward = model_forward_fn(kind)
    got = np.asarray(jax.jit(forward, static_argnames=("cfg",))(params, mix, cfg))

    for key, value in metrics(got, want).items():
        print(f"{key}: {value:.6g}")


if __name__ == "__main__":
    main()
