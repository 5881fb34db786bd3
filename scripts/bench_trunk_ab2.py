"""Trunk A/B round 2 (real TPU): stride-1 pool branch + fused 1x1s.

Round-2a baselines showed the chain harness itself costs ~18-30 ms at
stage-2 shapes, so the stride-2 pools are cheap in-model. The remaining
suspect for Mixed_3b/3c's 3x-over-floor cost is the stride-1 3x3x3
maxpool branch (reduce_window reads each element 27x if not separated).
Test data is generated ON DEVICE (host->device tunnel is 20-50 MB/s).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

W = 64
BF = jnp.bfloat16
NEG = float(jnp.finfo(jnp.bfloat16).min)


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


def pool_rw_s1(x):
    return jax.lax.reduce_window(
        x, jnp.asarray(NEG, x.dtype), jax.lax.max, (1, 3, 3, 3, 1),
        (1, 1, 1, 1, 1), 'SAME')


def _axis_max_s1(x, axis):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 1)
    xp = jnp.pad(x, pad, constant_values=NEG)
    n = x.shape[axis]

    def sl(lo):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(lo, lo + n)
        return xp[tuple(idx)]
    return jnp.maximum(jnp.maximum(sl(0), sl(1)), sl(2))


def pool_sep_s1_333(x):
    x = _axis_max_s1(x, 1)
    x = _axis_max_s1(x, 2)
    return _axis_max_s1(x, 3)


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


def mixed(x, p, pool_branch, fuse_1x1):
    if fuse_1x1:
        wcat = jnp.concatenate([p['b0'], p['b1a'], p['b2a']], axis=-1)
        y = jnp.maximum(conv3d(x, wcat), 0)
        n0 = p['b0'].shape[-1]
        n1 = p['b1a'].shape[-1]
        b0, b1, b2 = (y[..., :n0], y[..., n0:n0 + n1], y[..., n0 + n1:])
    else:
        b0 = jnp.maximum(conv3d(x, p['b0']), 0)
        b1 = jnp.maximum(conv3d(x, p['b1a']), 0)
        b2 = jnp.maximum(conv3d(x, p['b2a']), 0)
    b1 = jnp.maximum(conv3d(b1, p['b1b']), 0)
    b2 = jnp.maximum(conv3d(b2, p['b2b']), 0)
    b3 = pool_branch(x)
    b3 = jnp.maximum(conv3d(b3, p['b3b']), 0)
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def main():
    rng = np.random.RandomState(0)
    x12 = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(0), (W, 128, 12, 12, 192), BF))()

    # harness baseline at this shape
    t = chain(jax.jit(lambda x: jnp.sum(x.astype(jnp.float32))), x12)
    print(f'copy12x192 baseline       : {t*1000:7.1f} ms', flush=True)

    # stride-1 3x3x3 pool
    for name, f in (('s1pool reduce_window', pool_rw_s1),
                    ('s1pool separable', pool_sep_s1_333)):
        g = jax.jit(lambda x, _f=f: jnp.sum(_f(x).astype(jnp.float32)))
        print(f'{name:26s}: {chain(g, x12)*1000:7.1f} ms', flush=True)

    # mixed 3b+3c variants
    p3b = make_mixed_params(rng, 192, INCEPTION['3b'][1])
    p3c = make_mixed_params(rng, 256, INCEPTION['3c'][1])

    def bc(x, pool_branch, fuse):
        y = mixed(x, p3b, pool_branch, fuse)
        return mixed(y, p3c, pool_branch, fuse)

    variants = (
        ('mixed3bc current', pool_rw_s1, False),
        ('mixed3bc sep-pool', pool_sep_s1_333, False),
        ('mixed3bc sep-pool+fuse1x1', pool_sep_s1_333, True),
    )
    outs = []
    for name, pb, fuse in variants:
        g = jax.jit(lambda x, _pb=pb, _fu=fuse: jnp.sum(
            bc(x, _pb, _fu).astype(jnp.float32)))
        outs.append(float(g(x12)))
        assert abs(outs[-1] - outs[0]) < 3e-2 * abs(outs[0]) + 1, (name, outs)
        print(f'{name:26s}: {chain(g, x12)*1000:7.1f} ms', flush=True)


if __name__ == '__main__':
    main()
