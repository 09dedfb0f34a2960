"""Batch augmentation semantics (demucs/augment.py behavioral properties):
shapes, sample-preservation, group-invariant remixing, eval passthrough."""

import numpy as np

import jax
import jax.numpy as jnp

from demucs_tpu.train import augment as aug


def _batch(B=4, S=4, C=2, T=1000, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal((B, S, C, T)).astype(np.float32))


def test_shift_shapes_and_content():
    wav = _batch(T=1000)
    out = aug.shift_aug(jax.random.PRNGKey(0), wav, shift=100, same=False)
    assert out.shape == (4, 4, 2, 900)
    # each (b, s) row must be a contiguous window of the original
    w = np.asarray(wav)
    o = np.asarray(out)
    for b in range(4):
        for s in range(4):
            found = any(
                np.array_equal(o[b, s], w[b, s, :, off : off + 900])
                for off in range(100)
            )
            assert found


def test_shift_eval_truncates():
    wav = _batch()
    out = aug.shift_aug(jax.random.PRNGKey(0), wav, shift=100, same=True, train=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(wav)[..., :900])


def test_flip_channels_swaps_or_keeps():
    wav = _batch()
    out = np.asarray(aug.flip_channels_aug(jax.random.PRNGKey(1), wav))
    w = np.asarray(wav)
    for b in range(4):
        for s in range(4):
            same = np.array_equal(out[b, s], w[b, s])
            flipped = np.array_equal(out[b, s], w[b, s, ::-1])
            assert same or flipped


def test_flip_sign():
    wav = _batch()
    out = np.asarray(aug.flip_sign_aug(jax.random.PRNGKey(2), wav))
    w = np.asarray(wav)
    ratio = out / w
    for b in range(4):
        for s in range(4):
            r = ratio[b, s]
            assert np.allclose(r, 1.0) or np.allclose(r, -1.0)


def test_scale_range():
    wav = _batch()
    out = np.asarray(aug.scale_aug(jax.random.PRNGKey(3), wav, proba=1.0, lo=0.25, hi=1.25))
    w = np.asarray(wav)
    scales = out[..., 0] / w[..., 0]
    assert (scales > 0.25 - 1e-5).all() and (scales < 1.25 + 1e-5).all()


def test_remix_is_group_permutation():
    """Sources shuffle WITHIN groups of group_size (augment.py:64-95)."""
    B, S, C, T = 4, 4, 2, 64
    wav = _batch(B, S, C, T, seed=5)
    out = np.asarray(aug.remix_aug(jax.random.PRNGKey(4), wav, proba=1.0, group_size=2))
    w = np.asarray(wav)
    for s in range(S):
        for b in range(B):
            group = range(0, 2) if b < 2 else range(2, 4)
            assert any(np.array_equal(out[b, s], w[g, s]) for g in group)


def test_full_pipeline_shapes():
    cfg = aug.AugmentConfig(shift=100, remix_group_size=2)
    fn = aug.make_augment(cfg, full=True)
    out = fn(jax.random.PRNGKey(6), _batch())
    assert out.shape == (4, 4, 2, 900)
    assert bool(jnp.isfinite(out).all())
