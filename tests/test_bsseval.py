"""Native BSS Eval (ops/bsseval.py): analytic behavior of the
projection-based decomposition. museval is not installable in this
environment, so correctness rests on cases whose metric values are known
from the definition (perfect/filtered/interfered/noisy estimates)."""

import numpy as np

from demucs_tpu.ops.bsseval import bss_eval_images, project

SR = 8000
T = 3 * SR
FLEN = 128  # shorter taps than museval's 512: same math, faster tests


def _sources(nsrc=3, nchan=2, seed=0, white=False):
    rng = np.random.default_rng(seed)
    raw = rng.standard_normal((nsrc, nchan, T + 8))
    if white:
        return raw[..., :T].astype(np.float64)
    # lightly lowpassed noise so stems have realistic spectra + correlations
    k = np.ones(9) / 9.0
    refs = np.stack([[np.convolve(c, k, "valid") for c in s] for s in raw])
    return refs.astype(np.float64)


def _layout(x):
    """(nsrc, nchan, T) -> museval layout (nsrc, T, nchan)."""
    return np.swapaxes(x, 1, 2)


def test_project_recovers_fir_of_regressors():
    """A target that IS an FIR mix of the regressors projects to itself.

    The projection regresses over the zero-padded domain (museval's Toeplitz
    convention), so the references are silenced near the end to keep the
    convolution tail inside the window (no edge effect, exact recovery)."""
    refs = _sources(nsrc=2)
    refs[..., -FLEN - 32:] = 0.0
    rng = np.random.default_rng(1)
    h = rng.standard_normal((2, 16)) * 0.3
    target = sum(np.stack([np.convolve(c, h[i], "full")[:T] for c in refs[i]])
                 for i in range(2))
    got = project(refs.reshape(4, T), target, FLEN)
    err = np.linalg.norm(got - target) / np.linalg.norm(target)
    assert err < 1e-6, err


def test_perfect_estimate_all_metrics_high():
    refs = _sources()
    sdr, isr, sir, sar = bss_eval_images(_layout(refs), _layout(refs),
                                         window=SR, hop=SR, flen=FLEN)
    assert sdr.shape == (3, 3)  # 3 sources x 3 one-second frames
    for m in (sdr, isr, sir, sar):
        assert np.nanmin(m) > 80, m


def test_filtered_estimate_isr_reflects_spatial_distortion():
    """est_j = short FIR of ref_j: within the projector span, so
    e_interf = e_artif = 0 (SDR/SIR/SAR huge) while ISR is finite. White
    sources so the spatial-error energy is exactly ||h - delta||^2."""
    refs = _sources(white=True)
    ests = refs.copy()
    # a 5-tap echo-ish filter on source 0 only
    h = np.array([1.0, 0.0, 0.3, 0.0, -0.2])
    ests[0] = np.stack([np.convolve(c, h, "full")[:T] for c in refs[0]])
    sdr, isr, sir, sar = bss_eval_images(_layout(refs), _layout(ests),
                                         window=SR, hop=SR, flen=FLEN)
    assert np.nanmin(sdr[0]) > 60 and np.nanmin(sar[0]) > 60
    # spatial error energy ~ (0.3^2 + 0.2^2) / 1 -> ISR ~ 8.9 dB
    expect = 10 * np.log10(1.0 / (0.3**2 + 0.2**2))
    assert abs(np.nanmedian(isr[0]) - expect) < 1.0, (np.nanmedian(isr[0]), expect)
    # untouched sources stay perfect
    assert np.nanmin(sdr[1:]) > 80


def test_interference_sets_sir():
    """est_j = ref_j + a*ref_k: e_interf = a*ref_k, e_artif = 0 ->
    SIR ~ 20log10(1/a), SAR huge, SDR ~ SIR."""
    refs = _sources()
    a = 0.1
    ests = refs.copy()
    ests[0] = refs[0] + a * refs[1]
    sdr, isr, sir, sar = bss_eval_images(_layout(refs), _layout(ests),
                                         window=SR, hop=SR, flen=FLEN)
    # energies of ref0 and ref1 are comparable by construction
    e0 = np.sum(refs[0] ** 2)
    e1 = np.sum(refs[1] ** 2)
    expect = 10 * np.log10(e0 / (a * a * e1))
    assert abs(np.nanmedian(sir[0]) - expect) < 1.0, (np.nanmedian(sir[0]), expect)
    assert np.nanmin(sar[0]) > 60
    assert abs(np.nanmedian(sdr[0]) - expect) < 1.0


def test_additive_noise_sets_sar_near_snr():
    """est_j = ref_j + noise: noise is (mostly) outside the delayed-refs
    span, so SAR ~ the injected SNR (within the projection's absorption)."""
    rng = np.random.default_rng(7)
    refs = _sources()
    snr_db = 20.0
    noise = rng.standard_normal(refs[0].shape)
    noise *= np.linalg.norm(refs[0]) / np.linalg.norm(noise) * 10 ** (-snr_db / 20)
    ests = refs.copy()
    ests[0] = refs[0] + noise
    sdr, isr, sir, sar = bss_eval_images(_layout(refs), _layout(ests),
                                         window=SR, hop=SR, flen=FLEN)
    assert abs(np.nanmedian(sar[0]) - snr_db) < 2.0, np.nanmedian(sar[0])
    assert abs(np.nanmedian(sdr[0]) - snr_db) < 2.0


def test_db_matches_museval_silent_frame_semantics():
    """museval divides framed energies under errstate: 0/x -> -inf,
    x/0 -> +inf, 0/0 -> nan (its nanmedian aggregation keeps the infs);
    the native path must not special-case silence differently or the two
    eval_track code paths report different medians."""
    from demucs_tpu.ops.bsseval import _db

    out = _db(np.array([0.0, 1.0, 0.0, 4.0]), np.array([1.0, 0.0, 0.0, 2.0]))
    assert out[0] == -np.inf
    assert out[1] == np.inf
    assert np.isnan(out[2])
    np.testing.assert_allclose(out[3], 10 * np.log10(2.0))


def test_eval_track_uses_native_fallback():
    """evaluate.eval_track returns full BSS-eval scores without museval."""
    from demucs_tpu.evaluate import eval_track

    refs = _sources(nsrc=2)
    scores, nsdr = eval_track(refs, refs, win=SR, hop=SR, compute_sdr=True,
                              flen=FLEN)
    assert scores is not None
    sdr, isr, sir, sar = scores
    assert sdr.shape[0] == 2
    assert np.nanmin(sdr) > 80
    assert nsdr.shape == (2,) and np.all(nsdr > 60)
