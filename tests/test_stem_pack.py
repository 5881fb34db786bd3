"""stem_pack96 Pallas kernel (interpret mode) == the XLA packing:
space-to-depth + 4-tap temporal fold into 96 channels, matching the
SpaceToDepthConv3d packing semantics exactly."""

import jax.numpy as jnp
import numpy as np

from opental_tpu.ops.stem_pack_pallas import stem_pack96, stem_pack96_xla


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
