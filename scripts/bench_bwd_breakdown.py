"""Per-stage forward-vs-backward TPU timing of the train path (perf
exploration, round 3).

For each backbone prefix, times (a) the jitted forward sum and (b) the
jitted value_and_grad of the same sum wrt params, at train batch size.
(b) - (a) isolates the backward cost of the prefix; differencing
consecutive prefixes localizes which stage's backward is the MFU sink
(full-step measured: fwd 37% MFU vs full train step 20.5%).

~10 distinct jits -> 30-50 min of remote compiles on a cold cache.
"""
import sys
import time

import jax
import jax.numpy as jnp

from opental_tpu.models.i3d import InceptionI3d
from opental_tpu.models.bdnet import BDNet

BS, CLIP, CROP = 8, 256, 96

CUTS = ['Conv3d_1a_7x7', 'MaxPool3d_3a_3x3', 'Mixed_3c', 'Mixed_4f',
        'Mixed_5c']


def chain(f, a, x, iters=8, warm=1):
    carry = jnp.float32(0)
    for _ in range(warm):
        carry = f(a, x + carry * 0)
    float(carry)
    t0 = time.perf_counter()
    carry = jnp.float32(0)
    for _ in range(iters):
        carry = f(a, x + carry * 0)
    float(carry)
    return (time.perf_counter() - t0) / iters


def main():
    model = BDNet(num_classes=16, os_head=True, use_edl=True,
                  frame_num=CLIP, dtype=jnp.bfloat16)
    x = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(0), (BS, CLIP, CROP, CROP, 3),
        jnp.float32))()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    bb_vars = {k: v['backbone'] for k, v in variables.items()}
    print('init done', flush=True)

    prev_f = prev_g = 0.0
    for cut in CUTS:
        bb = InceptionI3d(dtype=jnp.bfloat16, final_endpoint=cut,
                          keep=(cut,))

        def fwd(params, xx, _bb=bb):
            out = _bb.apply({'params': params,
                             'constants': bb_vars['constants']}, xx)
            return sum(jnp.sum(v.astype(jnp.float32))
                       for v in out.values())

        def grd(params, xx, _f=fwd):
            val, grads = jax.value_and_grad(_f)(params, xx)
            return val + sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                             for g in jax.tree_util.tree_leaves(grads))

        tf = chain(jax.jit(fwd), bb_vars['params'], x)
        tg = chain(jax.jit(grd), bb_vars['params'], x)
        print(f'{cut:20s}: fwd {tf*1000:7.1f} ms (+{(tf-prev_f)*1000:6.1f})'
              f'  fwd+bwd {tg*1000:7.1f} ms (+{(tg-prev_g)*1000:6.1f})'
              f'  bwd/fwd {(tg-tf)/max(tf,1e-9):4.1f}x', flush=True)
        prev_f, prev_g = tf, tg


if __name__ == '__main__':
    main()
