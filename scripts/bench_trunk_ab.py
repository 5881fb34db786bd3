"""Trunk formulation A/B on real TPU shapes (perf exploration).

Sections (W=64 window batch, 256-frame clips):
  pool2a   : MaxPool (1,3,3)s(1,2,2) on (64,128,48,48,64)
  conv2c   : 3x3x3 SAME 64->192 at (64,128,24,24) — conv3d vs t-fold
  pool3a   : MaxPool (1,3,3)s(1,2,2) on (64,128,24,24,192)
  mixed3bc : Mixed_3b+3c at (64,128,12,12,192) — conv3d vs t-fold

The temporal-channel fold computes a 3x3x3 SAME conv as one 3x3 2D conv
on 3 temporally-shifted copies concatenated into channels (same trick as
the stem's 4-tap fold, models/layers.py SpaceToDepthConv3d). Exact math;
numerics checked per section (bf16 mean rtol).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

W = 64
BF = jnp.bfloat16


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


def conv3d(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), 'SAME',
        dimension_numbers=('NTHWC', 'THWIO', 'NTHWC'))


def conv3d_tfold(x, w):
    """3x3x3 SAME conv via temporal shift-concat + 3x3 2D conv."""
    b, t, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    z = jnp.concatenate([xp[:, dt:dt + t] for dt in range(3)], axis=-1)
    w2 = jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(
        w.shape[1], w.shape[2], 3 * c, w.shape[4])
    z = z.reshape(b * t, h, wd, 3 * c)
    y = jax.lax.conv_general_dilated(
        z, w2, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return y.reshape(b, t, h, wd, -1)


def max_pool(x, kernel, stride):
    full_k = (1,) + tuple(kernel) + (1,)
    full_s = (1,) + tuple(stride) + (1,)
    return jax.lax.reduce_window(x, -jnp.inf if x.dtype == jnp.float32
                                 else jnp.finfo(x.dtype).min,
                                 jax.lax.max, full_k, full_s, 'SAME')


INCEPTION = {
    '3b': (192, (64, 96, 128, 16, 32, 32)),
    '3c': (256, (128, 128, 192, 32, 96, 64)),
}


def make_mixed_params(rng, cin, oc):
    p = {}
    p['b0'] = rng.randn(1, 1, 1, cin, oc[0]).astype(np.float32) * 0.05
    p['b1a'] = rng.randn(1, 1, 1, cin, oc[1]).astype(np.float32) * 0.05
    p['b1b'] = rng.randn(3, 3, 3, oc[1], oc[2]).astype(np.float32) * 0.02
    p['b2a'] = rng.randn(1, 1, 1, cin, oc[3]).astype(np.float32) * 0.05
    p['b2b'] = rng.randn(3, 3, 3, oc[3], oc[4]).astype(np.float32) * 0.02
    p['b3b'] = rng.randn(1, 1, 1, cin, oc[5]).astype(np.float32) * 0.05
    return {k: jnp.asarray(v, BF) for k, v in p.items()}


def mixed(x, p, conv333):
    b0 = jnp.maximum(conv3d(x, p['b0']), 0)
    b1 = jnp.maximum(conv3d(x, p['b1a']), 0)
    b1 = jnp.maximum(conv333(b1, p['b1b']), 0)
    b2 = jnp.maximum(conv3d(x, p['b2a']), 0)
    b2 = jnp.maximum(conv333(b2, p['b2b']), 0)
    b3 = max_pool(x, (3, 3, 3), (1, 1, 1))
    b3 = jnp.maximum(conv3d(b3, p['b3b']), 0)
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def main():
    rng = np.random.RandomState(0)

    # --- pools
    x48 = jnp.asarray(rng.randn(W, 128, 48, 48, 64), BF)
    t = chain(jax.jit(lambda x: jnp.sum(
        max_pool(x, (1, 3, 3), (1, 2, 2)).astype(jnp.float32))), x48)
    print(f'pool2a (48->24, 64ch)   : {t*1000:7.1f} ms', flush=True)

    x24c192 = jnp.asarray(rng.randn(W, 128, 24, 24, 192), BF)
    t = chain(jax.jit(lambda x: jnp.sum(
        max_pool(x, (1, 3, 3), (1, 2, 2)).astype(jnp.float32))), x24c192)
    print(f'pool3a (24->12, 192ch)  : {t*1000:7.1f} ms', flush=True)

    # --- conv2c
    x24 = jnp.asarray(rng.randn(W, 128, 24, 24, 64), BF)
    w2c = jnp.asarray(rng.randn(3, 3, 3, 64, 192).astype(np.float32) * 0.02,
                      BF)
    f_a = jax.jit(lambda x: jnp.sum(conv3d(x, w2c).astype(jnp.float32)))
    f_b = jax.jit(lambda x: jnp.sum(conv3d_tfold(x, w2c).astype(jnp.float32)))
    sa, sb = float(f_a(x24)), float(f_b(x24))
    assert abs(sa - sb) / (abs(sa) + 1e-6) < 3e-2, (sa, sb)
    ta, tb = chain(f_a, x24), chain(f_b, x24)
    print(f'conv2c conv3d           : {ta*1000:7.1f} ms', flush=True)
    print(f'conv2c t-fold conv2d    : {tb*1000:7.1f} ms', flush=True)

    # --- mixed 3b + 3c
    x12 = jnp.asarray(rng.randn(W, 128, 12, 12, 192), BF)
    p3b = make_mixed_params(rng, 192, INCEPTION['3b'][1])
    p3c = make_mixed_params(rng, 256, INCEPTION['3c'][1])

    def bc(x, conv333):
        y = mixed(x, p3b, conv333)
        return mixed(y, p3c, conv333)

    f_a = jax.jit(lambda x: jnp.sum(bc(x, conv3d).astype(jnp.float32)))
    f_b = jax.jit(lambda x: jnp.sum(bc(x, conv3d_tfold).astype(jnp.float32)))
    sa, sb = float(f_a(x12)), float(f_b(x12))
    assert abs(sa - sb) / (abs(sa) + 1e-6) < 3e-2, (sa, sb)
    ta, tb = chain(f_a, x12), chain(f_b, x12)
    print(f'mixed3b+3c conv3d       : {ta*1000:7.1f} ms', flush=True)
    print(f'mixed3b+3c t-fold conv2d: {tb*1000:7.1f} ms', flush=True)


if __name__ == '__main__':
    main()
