"""Pallas boundary-pool kernel vs the XLA sparse-table implementation,
run in interpreter mode on CPU (the compiled path runs on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from opental_tpu.ops.boundary_pool import boundary_max_pool
from opental_tpu.ops.boundary_pool_pallas import (
    boundary_max_pool_interpret)


def random_case(seed=0, b=2, t=32, c=16, k=5):
    rng = np.random.RandomState(seed)
    x = rng.randn(b, t, c).astype(np.float32)
    l = rng.randint(-4, t + 2, (b, k, 2)).astype(np.float32)
    r = l + rng.randint(-2, 12, (b, k, 2)).astype(np.float32)
    segments = np.stack([l[..., 0], r[..., 0], l[..., 1], r[..., 1]], -1)
    return jnp.asarray(x), jnp.asarray(segments)


def test_pallas_forward_matches_xla():
    x, segments = random_case()
    want = boundary_max_pool(x, segments)
    got = boundary_max_pool_interpret(x, segments)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=0)


def test_pallas_backward_matches_xla():
    x, segments = random_case(seed=1)
    g = jnp.asarray(np.random.RandomState(2).randn(
        x.shape[0], segments.shape[1], x.shape[2]).astype(np.float32))

    def loss_xla(xx):
        return jnp.sum(boundary_max_pool(xx, segments) * g)

    def loss_pl(xx):
        return jnp.sum(boundary_max_pool_interpret(xx, segments) * g)

    dx_xla = jax.grad(loss_xla)(x)
    dx_pl = jax.grad(loss_pl)(x)
    np.testing.assert_allclose(np.asarray(dx_pl), np.asarray(dx_xla),
                               rtol=1e-6, atol=1e-6)
