"""Cumulative per-stage TPU timing of the I3D backbone (perf exploration).

Times jitted prefixes of the endpoint chain at W window-batch; stage cost
is the difference of consecutive prefixes. Full-sum witnesses (sliced
witnesses let XLA DCE conv work). ~6 distinct jits => ~20-30 min of
remote compiles on a cold cache.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from opental_tpu.models.bdnet import BDNet

W, CLIP, CROP = 64, 256, 96

CUTS = ['Conv3d_1a_7x7', 'MaxPool3d_3a_3x3', 'Mixed_3c', 'Mixed_4f',
        'Mixed_5c']


def chain(f, x, iters=10, warm=2):
    carry = jnp.float32(0)
    for _ in range(warm):
        carry = f(x + carry * 0)
    float(carry)
    t0 = time.perf_counter()
    carry = jnp.float32(0)
    for _ in range(iters):
        carry = f(x + carry * 0)
    float(carry)
    return (time.perf_counter() - t0) / iters


def main():
    model = BDNet(num_classes=16, os_head=True, use_edl=True,
                  frame_num=CLIP, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(W, CLIP, CROP, CROP, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    print('init done', flush=True)

    from opental_tpu.models.i3d import InceptionI3d
    bb_vars = {k: v['backbone'] for k, v in variables.items()}

    prev = 0.0
    for cut in CUTS:
        def prefix(xx, _cut=cut):
            bb = InceptionI3d(dtype=jnp.bfloat16, final_endpoint=_cut,
                              keep=(_cut,))
            out = bb.apply(bb_vars, xx)
            return sum(jnp.sum(v.astype(jnp.float32)) for v in out.values())
        t = chain(jax.jit(prefix), x)
        print(f'through {cut:20s}: {t*1000:7.1f} ms '
              f'(+{(t-prev)*1000:6.1f} ms)', flush=True)
        prev = t

    def full(xx):
        out = model.apply(variables, xx)
        return sum(jnp.sum(v.astype(jnp.float32))
                   for v in out.values() if v is not None)
    t = chain(jax.jit(full), x)
    print(f'full forward        : {t*1000:7.1f} ms (+{(t-prev)*1000:6.1f} '
          f'ms pyramid+heads)', flush=True)


if __name__ == '__main__':
    main()
