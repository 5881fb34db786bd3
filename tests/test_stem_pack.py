"""stem_pack96 Pallas kernels (interpret mode) == the XLA packing:
space-to-depth + 4-tap temporal fold into 96 channels, matching the
SpaceToDepthConv3d packing semantics exactly. v2 (channel-leading,
Mosaic-compatible) is additionally checked as a FULL fused stem against
the plain stride-2 conv3d."""

import jax
import jax.numpy as jnp
import numpy as np

from opental_tpu.ops.stem_pack_pallas import (host_prelayout, stem_conv_v2,
                                              stem_pack96, stem_pack96_v2,
                                              stem_pack96_xla)


def test_stem_pack96_interpret_matches_xla():
    rng = np.random.RandomState(0)
    xp = jnp.asarray(rng.randn(2, 20, 12, 16, 3).astype(np.float32))
    a = stem_pack96(xp, a_t=4, interpret=True)
    b = stem_pack96_xla(xp, a_t=4)
    assert a.shape == (2, 7, 6, 8, 96)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stem_pack96_channel_order():
    """z[..., at*24+bt*12+bi*6+bj*3+c] == xp[2(u+at)+bt, 2p+bi, 2q+bj, c]
    — the exact fold order the scattered conv kernel assumes."""
    t, h, w, c = 10, 4, 6, 3
    xp = jnp.asarray(np.arange(t * h * w * c, dtype=np.float32)
                     .reshape(1, t, h, w, c))
    z = np.asarray(stem_pack96(xp, a_t=4, interpret=True))
    x = np.asarray(xp)
    rng = np.random.RandomState(0)
    for _ in range(40):
        u = rng.randint(z.shape[1])
        p = rng.randint(h // 2)
        q = rng.randint(w // 2)
        at, bt, bi, bj, cc = (rng.randint(4), rng.randint(2),
                              rng.randint(2), rng.randint(2),
                              rng.randint(c))
        got = z[0, u, p, q, at * 24 + bt * 12 + bi * 6 + bj * 3 + cc]
        want = x[0, 2 * (u + at) + bt, 2 * p + bi, 2 * q + bj, cc]
        assert got == want


def test_stem_conv_v2_matches_conv3d():
    """Full v2 fused stem == stride-2 VALID conv3d with the zero-padded
    kernel, including H sizes that need the 8-alignment pad."""
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(7, 7, 7, 3, 5), jnp.float32)
    wp = jnp.zeros((8, 8, 8, 3, 5)).at[:7, :7, :7].set(w)
    for hp in (8, 10, 14):
        xp = jnp.asarray(rng.randn(2, 12, hp, 8, 3), jnp.float32)
        ref = jax.lax.conv_general_dilated(
            xp, wp, (2, 2, 2), 'VALID',
            dimension_numbers=('NTHWC', 'THWIO', 'NTHWC'))
        got = stem_conv_v2(xp, w, interpret=True)
        assert got.shape == ref.shape, hp
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4)


def test_stem_pack96_v2_channel_order():
    """v2 channel-leading order: z[:, u, (r,bi,bj,c), p, q] ==
    xp[2u+r, 2p+bi, 2q+bj, c]."""
    t, h, w, c = 10, 8, 6, 3
    xp = jnp.asarray(np.arange(t * h * w * c, dtype=np.float32)
                     .reshape(1, t, h, w, c))
    z = np.asarray(stem_pack96_v2(host_prelayout(xp), wq=w // 2,
                                  interpret=True))
    x = np.asarray(xp)
    rng = np.random.RandomState(0)
    for _ in range(40):
        u = rng.randint(z.shape[1])
        p = rng.randint(h // 2)
        q = rng.randint(w // 2)
        r, bi, bj, cc = (rng.randint(8), rng.randint(2), rng.randint(2),
                         rng.randint(c))
        got = z[0, u, ((r * 2 + bi) * 2 + bj) * c + cc, p, q]
        want = x[0, 2 * u + r, 2 * p + bi, 2 * q + bj, cc]
        assert got == want
