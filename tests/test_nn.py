"""NN primitive parity vs torch (conv/conv-transpose/norm/activations).

ConvTranspose parity is called out in SURVEY.md §7 as a hard part: the k=8,s=4
and (8,1)/(4,1) cases must match torch exactly.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from demucs_tpu.ops import nn as jnn


def _np(t):
    return t.detach().numpy()


@pytest.mark.parametrize("stride,padding,dilation", [(4, 2, 1), (1, 1, 2), (2, 0, 1)])
def test_conv1d(stride, padding, dilation):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 6, 64)).astype(np.float32)
    w = rng.standard_normal((10, 6, 8)).astype(np.float32)
    b = rng.standard_normal((10,)).astype(np.float32)
    want = _np(
        F.conv1d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride=stride, padding=padding, dilation=dilation,
        )
    )
    got = np.asarray(
        jnn.conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                   stride=stride, padding=padding, dilation=dilation)
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_conv2d_freq_kernel():
    """The (8,1)-kernel, (4,1)-stride, (2,0)-pad freq conv (hdemucs.py:105-110)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 64, 12)).astype(np.float32)
    w = rng.standard_normal((16, 4, 8, 1)).astype(np.float32)
    b = rng.standard_normal((16,)).astype(np.float32)
    want = _np(
        F.conv2d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
                 stride=(4, 1), padding=(2, 0))
    )
    got = np.asarray(
        jnn.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                   stride=(4, 1), padding=(2, 0))
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("stride,k", [(4, 8), (2, 4), (1, 3)])
def test_conv_transpose1d(stride, k):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 6, 32)).astype(np.float32)
    w = rng.standard_normal((6, 4, k)).astype(np.float32)
    b = rng.standard_normal((4,)).astype(np.float32)
    want = _np(
        F.conv_transpose1d(torch.from_numpy(x), torch.from_numpy(w),
                           torch.from_numpy(b), stride=stride)
    )
    got = np.asarray(
        jnn.conv_transpose1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=stride)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_conv_transpose2d_freq():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 8, 16, 10)).astype(np.float32)
    w = rng.standard_normal((8, 4, 8, 1)).astype(np.float32)
    b = rng.standard_normal((4,)).astype(np.float32)
    want = _np(
        F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                           torch.from_numpy(b), stride=(4, 1))
    )
    got = np.asarray(
        jnn.conv_transpose2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=(4, 1))
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("groups,shape", [(1, (2, 8, 33)), (4, (2, 8, 33)), (1, (2, 6, 9, 7))])
def test_group_norm(groups, shape):
    rng = np.random.default_rng(4)
    x = rng.standard_normal(shape).astype(np.float32)
    C = shape[1]
    w = rng.standard_normal((C,)).astype(np.float32)
    b = rng.standard_normal((C,)).astype(np.float32)
    want = _np(F.group_norm(torch.from_numpy(x), groups, torch.from_numpy(w), torch.from_numpy(b)))
    got = np.asarray(jnn.group_norm(jnp.asarray(x), groups, jnp.asarray(w), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_layer_norm():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((3, 7, 16)).astype(np.float32)
    w = rng.standard_normal((16,)).astype(np.float32)
    b = rng.standard_normal((16,)).astype(np.float32)
    want = _np(F.layer_norm(torch.from_numpy(x), (16,), torch.from_numpy(w), torch.from_numpy(b)))
    got = np.asarray(jnn.layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_gelu_exact_and_glu():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((4, 8, 5)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(jnn.gelu(jnp.asarray(x))), _np(F.gelu(torch.from_numpy(x))),
        atol=1e-6, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(jnn.glu(jnp.asarray(x), axis=1)), _np(F.glu(torch.from_numpy(x), dim=1)),
        atol=1e-6, rtol=1e-5,
    )


def test_std_unbiased():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 4, 16, 9)).astype(np.float32)
    want = _np(torch.from_numpy(x).std(dim=(1, 2, 3), keepdim=True))
    got = np.asarray(jnn.std_unbiased(jnp.asarray(x), axis=(1, 2, 3)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_linear():
    rng = np.random.default_rng(8)
    x = rng.standard_normal((3, 5, 12)).astype(np.float32)
    w = rng.standard_normal((7, 12)).astype(np.float32)
    b = rng.standard_normal((7,)).astype(np.float32)
    want = _np(F.linear(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b)))
    got = np.asarray(jnn.linear(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
