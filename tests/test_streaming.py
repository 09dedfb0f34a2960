"""Streaming separation (inference/streaming.py): feeding a track in
arbitrary chunks reproduces the offline overlap-add engine exactly, for both
the uniform-target htdemucs kind and the lookahead-needing demucs v2 kind."""

import numpy as np
import pytest

from common import SOURCES, random_mix, small_htdemucs_kwargs

from demucs_tpu.inference.apply import apply_model
from demucs_tpu.inference.streaming import StreamSeparator
from demucs_tpu.models.registry import Model


@pytest.fixture(scope="module")
def ht_model():
    from demucs_tpu.models import htdemucs as jht

    cfg = jht.HTDemucsConfig(sources=tuple(SOURCES), **small_htdemucs_kwargs())
    return Model("htdemucs", cfg, jht.init_htdemucs(cfg, seed=0))


@pytest.fixture(scope="module")
def v2_model():
    from demucs_tpu.models import demucs as jd

    cfg = jd.DemucsConfig(sources=tuple(SOURCES), channels=8, depth=3,
                          samplerate=8000, segment=0.5)
    return Model("demucs", cfg, jd.init_demucs(cfg, seed=0))


def _stream_all(model, mix, chunks, **kw):
    stream = StreamSeparator(model, **kw)
    parts = []
    pos = 0
    for n in chunks:
        parts.append(stream.feed(mix[0, :, pos:pos + n]))
        pos += n
    assert pos == mix.shape[-1]
    parts.append(stream.flush())
    return np.concatenate([p for p in parts if p.shape[-1]], axis=-1)[None]


def test_streaming_matches_offline_htdemucs(ht_model):
    T = int(3.3 * ht_model.cfg.training_length)
    mix = random_mix((1, 2, T), seed=31)
    want = apply_model(ht_model, mix, shifts=0, split=True, engine="host")

    rng = np.random.default_rng(0)
    chunks = []
    left = T
    while left:
        n = int(min(left, rng.integers(100, 4000)))
        chunks.append(n)
        left -= n
    got = _stream_all(ht_model, mix, chunks)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=0)


def test_streaming_chunking_invariance(ht_model):
    T = int(2.2 * ht_model.cfg.training_length)
    mix = random_mix((1, 2, T), seed=32)
    one = _stream_all(ht_model, mix, [T])
    many = _stream_all(ht_model, mix, [1000] * (T // 1000) + [T % 1000])
    np.testing.assert_allclose(one, many, atol=1e-6, rtol=0)


def test_streaming_matches_offline_demucs_v2(v2_model):
    """demucs v2's leaf target exceeds the segment (valid_length), so full
    segments need real lookahead — the streaming path must wait for it."""
    stream = StreamSeparator(v2_model, segment=0.5)
    assert stream._ahead > 0  # the kind actually exercises the lookahead

    T = int(2.7 * 0.5 * v2_model.samplerate)
    mix = random_mix((1, 2, T), seed=33)
    want = apply_model(v2_model, mix, shifts=0, split=True, segment=0.5,
                       engine="host")
    got = _stream_all(v2_model, mix, [777] * (T // 777) + [T % 777],
                      segment=0.5)
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=0)


def test_streaming_emits_incrementally(ht_model):
    """Output arrives while feeding (not only at flush), and latency is
    bounded by the documented segment+stride window."""
    seg = ht_model.cfg.training_length
    stream = StreamSeparator(ht_model)
    mix = random_mix((2, 3 * seg), seed=34)
    emitted = 0
    fed = 0
    step = seg // 2
    for pos in range(0, 3 * seg, step):
        out = stream.feed(mix[:, pos:pos + step])
        fed += step
        emitted += out.shape[-1]
        assert fed - emitted <= stream.latency_samples
    assert emitted > 0  # incremental, not flush-only
    emitted += stream.flush().shape[-1]
    assert emitted == 3 * seg


def test_streaming_flush_is_terminal(ht_model):
    stream = StreamSeparator(ht_model)
    stream.feed(random_mix((2, 1000), seed=35))
    stream.flush()
    with pytest.raises(AssertionError):
        stream.feed(np.zeros((2, 10), np.float32))
