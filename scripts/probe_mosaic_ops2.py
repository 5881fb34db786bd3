"""Mosaic probe round 2: the exact op sequence the pack96 kernel needs.

Builds on round 1 (scripts/probe_mosaic_ops.py): sublane splits, lane
slices, lane concat, 2D transpose all OK; interleaved lane splits and
strided sublane slices rejected. Remaining unknowns probed here, plus a
complete miniature pack assembly.
"""
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def probe(name, fn):
    try:
        ok = fn()
        print(f'{name:28s}: {"OK" if ok else "WRONG RESULT"}', flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).split('\n')[0][:140]
        print(f'{name:28s}: FAIL {type(e).__name__}: {msg}', flush=True)


def main(only=()):
    rng = np.random.RandomState(0)

    # (m) batched last-2-dim transpose (51, 96, 51) -> (51, 51, 96)
    def m_batched_transpose():
        x = rng.randn(51, 96, 51).astype(np.float32)

        def k(ref, o):
            o[...] = jnp.swapaxes(ref[...], 1, 2)
        out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(
            (51, 51, 96), np.float32))(jnp.asarray(x))
        return np.allclose(np.asarray(out), x.transpose(0, 2, 1))

    # (n) stack pieces on a NEW MINOR axis (51,51)x4 -> (51,51,4)
    def n_stack_minor():
        x = rng.randn(4, 51, 51).astype(np.float32)

        def k(ref, o):
            v = ref[...]
            o[...] = jnp.stack([v[i] for i in range(4)], axis=-1)
        out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(
            (51, 51, 4), np.float32))(jnp.asarray(x))
        return np.allclose(np.asarray(out), x.transpose(1, 2, 0))

    # (o) stack on middle axis (51,306)x4 -> (51,4,306)
    def o_stack_middle():
        x = rng.randn(4, 51, 306).astype(np.float32)

        def k(ref, o):
            v = ref[...]
            o[...] = jnp.stack([v[i] for i in range(4)], axis=1)
        out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(
            (51, 4, 306), np.float32))(jnp.asarray(x))
        return np.allclose(np.asarray(out), x.transpose(1, 0, 2))

    # (p) middle index of 3D (96,51,51)[:, 7, :]
    def p_mid_index():
        x = rng.randn(96, 51, 51).astype(np.float32)

        def k(ref, o):
            o[...] = ref[...][:, 7, :]
        out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(
            (96, 51), np.float32))(jnp.asarray(x))
        return np.allclose(np.asarray(out), x[:, 7, :])

    # (q) dot with f32 accumulation
    def q_dot_f32():
        a = rng.randn(64, 128).astype(np.float32)
        b = rng.randn(128, 256).astype(np.float32)

        def k(ar, br, o):
            o[...] = jax.lax.dot(ar[...], br[...],
                                 precision=jax.lax.Precision.HIGHEST)
        out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(
            (64, 256), np.float32))(jnp.asarray(a), jnp.asarray(b))
        return np.allclose(np.asarray(out), a @ b, atol=1e-3)

    # (r) miniature full pack assembly, tiny shapes:
    #     input xw (8 frames, Hp=6, lanes = (bj,c,q) chunks of Wq=4)
    #     -> z (Hp/2=3, Wq=4, 96)  [one output frame, a_t=4]
    HP, WQ, C = 6, 4, 3
    LAN = 2 * C * WQ  # (bj, c, q)

    def r_mini_pack():
        x = rng.randn(8, HP, LAN).astype(np.float32)

        def k(ref, o):
            s = ref[...]
            pieces = []
            for r in range(8):
                f = s[r].reshape(HP // 2, 2, LAN)
                for bi in range(2):
                    g = f[:, bi, :]              # (3, 24)
                    for bj in range(2):
                        for c in range(C):
                            lo = (bj * C + c) * WQ
                            pieces.append(g[:, lo:lo + WQ])  # (3, 4)
            zt = jnp.stack(pieces, axis=1)       # (3, 96, 4)
            o[...] = jnp.swapaxes(zt, 1, 2)      # (3, 4, 96)
        out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(
            (HP // 2, WQ, 96), np.float32))(jnp.asarray(x))
        # numpy reference
        exp = np.zeros((HP // 2, WQ, 96), np.float32)
        i = 0
        for r in range(8):
            for bi in range(2):
                for bj in range(2):
                    for c in range(C):
                        exp[:, :, i] = x[r, bi::2][:, (bj * C + c) * WQ:
                                                   (bj * C + c) * WQ + WQ]
                        i += 1
        return np.allclose(np.asarray(out), exp)

    probes = {
        'batched_transpose': m_batched_transpose,
        'stack_minor': n_stack_minor,
        'stack_middle': o_stack_middle,
        'mid_index_3d': p_mid_index,
        'dot_f32_highest': q_dot_f32,
        'mini_pack_full': r_mini_pack,
    }
    for n in (only or list(probes)):
        probe(n, probes[n])


if __name__ == '__main__':
    main(tuple(sys.argv[1:]))
