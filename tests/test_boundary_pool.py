"""Boundary max pooling vs a numpy transliteration of the CUDA spec
(AFSD/prop_pooling/boundary_max_pooling_kernel.cu:17-82)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opental_tpu.ops.boundary_pool import (boundary_max_pool,
                                           boundary_max_pool_masked)


def numpy_boundary_pool(x, segments):
    """x: (B, T, C) channels-last; segments: (B, K, 4). Returns (B, K, C)."""
    b, t, c = x.shape
    k = segments.shape[1]
    out = np.zeros((b, k, c), x.dtype)
    for n in range(b):
        for ci in range(c):
            seg_type = ci // (c // 2)
            for ki in range(k):
                l = int(segments[n, ki, seg_type * 2])
                r = int(segments[n, ki, seg_type * 2 + 1])
                l = min(max(0, l), t - 1)
                r = min(max(0, r), t - 1)
                window = x[n, l:r + 1, ci]
                out[n, ki, ci] = window.max() if window.size else x[n, l, ci]
    return out


def numpy_boundary_pool_grad(x, segments, g):
    """First-argmax scatter-add backward, as in …kernel.cu:48-82."""
    b, t, c = x.shape
    k = segments.shape[1]
    dx = np.zeros_like(x)
    for n in range(b):
        for ci in range(c):
            seg_type = ci // (c // 2)
            for ki in range(k):
                l = int(segments[n, ki, seg_type * 2])
                r = int(segments[n, ki, seg_type * 2 + 1])
                l = min(max(0, l), t - 1)
                r = min(max(0, r), t - 1)
                r = max(r, l)
                window = x[n, l:r + 1, ci]
                am = l + int(np.argmax(window))
                dx[n, am, ci] += g[n, ki, ci]
    return dx


@pytest.fixture
def random_case():
    rng = np.random.RandomState(0)
    b, t, c, k = 2, 32, 8, 5
    x = rng.randn(b, t, c).astype(np.float32)
    # windows including out-of-range and degenerate ones
    l = rng.randint(-4, t + 2, (b, k, 2)).astype(np.float32)
    r = l + rng.randint(-2, 10, (b, k, 2)).astype(np.float32)
    segments = np.stack([l[..., 0], r[..., 0], l[..., 1], r[..., 1]],
                        axis=-1)
    return x, segments


def test_forward_matches_cuda_spec(random_case):
    x, segments = random_case
    want = numpy_boundary_pool(x, segments)
    got = np.asarray(boundary_max_pool(jnp.asarray(x), jnp.asarray(segments)))
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_masked_fallback_matches(random_case):
    x, segments = random_case
    want = numpy_boundary_pool(x, segments)
    got = np.asarray(boundary_max_pool_masked(jnp.asarray(x),
                                              jnp.asarray(segments)))
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_backward_scatter_to_argmax(random_case):
    x, segments = random_case
    g = np.random.RandomState(1).randn(
        x.shape[0], segments.shape[1], x.shape[2]).astype(np.float32)

    def f(xx):
        return jnp.sum(boundary_max_pool(xx, jnp.asarray(segments))
                       * jnp.asarray(g))

    dx = np.asarray(jax.grad(f)(jnp.asarray(x)))
    want = numpy_boundary_pool_grad(x, segments, g)
    np.testing.assert_allclose(dx, want, rtol=1e-6, atol=1e-6)


def test_large_window_and_full_range():
    # full-range window == plain max over time
    rng = np.random.RandomState(2)
    x = rng.randn(1, 256, 4).astype(np.float32)
    segments = np.array([[[0, 255, 0, 255]]], np.float32)
    got = np.asarray(boundary_max_pool(jnp.asarray(x), jnp.asarray(segments)))
    np.testing.assert_allclose(got[0, 0], x[0].max(axis=0), rtol=0, atol=0)


def test_conv3d_temporal_decomp_matches_nn_conv():
    """Library op retained for lane-starved stems: decomposed conv3d
    equals flax nn.Conv with SAME padding."""
    import jax
    from flax import linen as nn

    from opental_tpu.models.layers import Unit3D, _same_pad_amount
    from opental_tpu.models.layers import conv3d_temporal_decomp

    rng = np.random.RandomState(3)
    for kernel, stride in [((3, 3, 3), (1, 1, 1)), ((7, 7, 7), (2, 2, 2))]:
        x = jnp.asarray(rng.randn(2, 16, 20, 20, 5).astype(np.float32))
        k = jnp.asarray(rng.randn(*kernel, 5, 7).astype(np.float32))
        pads = [_same_pad_amount(x.shape[1 + i], kernel[i], stride[i])
                for i in range(3)]
        got = conv3d_temporal_decomp(x, k, stride, pads)
        want = jax.lax.conv_general_dilated(
            x, k, stride, 'SAME',
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=2e-4)
