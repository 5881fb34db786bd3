"""Mosaic probe round 3: real-shape pack96 kernel candidates.

Round 2 passed every individual op (batched transpose, stack-on-minor,
middle index, lane slice) but the composed mini-pack at DEGENERATE tiny
shapes (3x4 pieces) crashed the helper. Here: the real (51,51)-piece
geometry, one grid step, correctness vs numpy; plus an XLA NCHW-conv
timing probe that would let the kernel skip the final relayout.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

HP, WQ, C = 102, 51, 3
L = 2 * C * WQ  # 306, lanes = (bj, c, q)


def _host_input(rng, frames=8):
    return rng.randn(frames, HP, L).astype(np.float32)


def _expected(x):
    """z[p, q, c'=(r,bi,bj,c)] = x[r, 2p+bi, (bj*C+c)*WQ + q]."""
    z = np.zeros((HP // 2, WQ, 96), np.float32)
    i = 0
    for r in range(8):
        for bi in range(2):
            for bj in range(2):
                for c in range(C):
                    z[:, :, i] = x[r, bi::2, (bj * C + c) * WQ:
                                   (bj * C + c) * WQ + WQ]
                    i += 1
    return z


def probe(name, fn):
    try:
        ok = fn()
        print(f'{name:28s}: {"OK" if ok else "WRONG RESULT"}', flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).split('\n')[0][:140]
        print(f'{name:28s}: FAIL {type(e).__name__}: {msg}', flush=True)


def _pieces(s):
    out = []
    for r in range(8):
        f = s[r].reshape(HP // 2, 2, L)
        for bi in range(2):
            g = f[:, bi, :]
            for bj in range(2):
                for c in range(C):
                    lo = (bj * C + c) * WQ
                    out.append(g[:, lo:lo + WQ])
    return out


def main(only=()):
    rng = np.random.RandomState(0)
    x = _host_input(rng)
    exp = _expected(x)

    # (s) stack-on-minor assembly
    def s_stack_minor():
        def k(ref, o):
            o[...] = jnp.stack(_pieces(ref[...]), axis=-1)
        out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(
            (HP // 2, WQ, 96), np.float32))(jnp.asarray(x))
        return np.allclose(np.asarray(out), exp)

    # (s2) stack-on-middle + batched transpose
    def s2_transpose():
        def k(ref, o):
            zt = jnp.stack(_pieces(ref[...]), axis=1)   # (51, 96, 51)
            o[...] = jnp.swapaxes(zt, 1, 2)
        out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(
            (HP // 2, WQ, 96), np.float32))(jnp.asarray(x))
        return np.allclose(np.asarray(out), exp)

    # (u) two-stage: stack 12 on minor per frame-half, lane-concat 8
    def u_two_stage():
        def k(ref, o):
            s = ref[...]
            groups = []
            for r in range(8):
                f = s[r].reshape(HP // 2, 2, L)
                sub = []
                for bi in range(2):
                    g = f[:, bi, :]
                    for bj in range(2):
                        for c in range(C):
                            lo = (bj * C + c) * WQ
                            sub.append(g[:, lo:lo + WQ])
                    groups.append(jnp.stack(sub, axis=-1))
                    sub = []
            o[...] = jnp.concatenate(groups, axis=-1)
        out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(
            (HP // 2, WQ, 96), np.float32))(jnp.asarray(x))
        return np.allclose(np.asarray(out), exp)

    # (v) leading-dim assembly (no relayout): out (96, 51, 51)
    def v_leading():
        def k(ref, o):
            o[...] = jnp.stack(_pieces(ref[...]), axis=0)
        out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(
            (96, HP // 2, WQ), np.float32))(jnp.asarray(x))
        return np.allclose(np.asarray(out), exp.transpose(2, 0, 1))

    probes = {
        'pack_stack_minor': s_stack_minor,
        'pack_stack_transpose': s2_transpose,
        'pack_two_stage': u_two_stage,
        'pack_leading': v_leading,
    }
    for n in (only or list(probes)):
        probe(n, probes[n])

    if only and 'nchw' not in only:
        return

    # (t) NCHW vs NHWC conv2d timing at the real consumer shape
    def chain(f, x, iters=8, warm=2):
        carry = jnp.float32(0)
        for _ in range(warm):
            carry = f(x + carry.astype(x.dtype) * 0)
        float(carry)
        t0 = time.perf_counter()
        carry = jnp.float32(0)
        for _ in range(iters):
            carry = f(x + carry.astype(x.dtype) * 0)
        float(carry)
        return (time.perf_counter() - t0) / iters

    BT = 64 * 128
    w = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(1), (4, 4, 96, 64), jnp.bfloat16) * 0.02)()

    znhwc = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(0), (BT, 51, 51, 96), jnp.bfloat16))()
    f_nhwc = jax.jit(lambda z: jnp.sum(jax.lax.conv_general_dilated(
        z, w, (1, 1), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')).astype(jnp.float32)))
    print(f'conv2d NHWC               : {chain(f_nhwc, znhwc)*1000:7.1f} ms',
          flush=True)
    del znhwc

    znchw = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(0), (BT, 96, 51, 51), jnp.bfloat16))()
    f_nchw = jax.jit(lambda z: jnp.sum(jax.lax.conv_general_dilated(
        z, w, (1, 1), 'VALID',
        dimension_numbers=('NCHW', 'HWIO', 'NHWC')).astype(jnp.float32)))
    print(f'conv2d NCHW               : {chain(f_nchw, znchw)*1000:7.1f} ms',
          flush=True)


if __name__ == '__main__':
    main(tuple(sys.argv[1:]))
