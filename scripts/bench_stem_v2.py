"""Stem v2 A/B on real TPU: pack24+conv3d (current) vs host-prelayout +
pallas channel-leading pack + NCHW conv2d (stem_conv_v2). W=64, bf16,
full-sum witness, on-device data."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from opental_tpu.models.layers import SpaceToDepthConv3d
from opental_tpu.ops.stem_pack_pallas import stem_conv_v2

W, CLIP, CROP = 64, 256, 96
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


def pad_same(x, k=7):
    pads = []
    for size in x.shape[1:4]:
        total = max(k - 2, 0) if size % 2 == 0 else max(k - 1, 0)
        lo = total // 2
        hi = total - lo + ((size + total) % 2)
        pads.append((lo, hi))
    return jnp.pad(x, [(0, 0)] + pads + [(0, 0)])


def main():
    x = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(0), (W, CLIP, CROP, CROP, 3), BF))()

    mod = SpaceToDepthConv3d(64, kernel=(7, 7, 7), in_channels=3,
                             dtype=BF)
    variables = jax.jit(mod.init)(jax.random.PRNGKey(1),
                                  jnp.zeros((1, 16, 16, 16, 3), BF))
    kernel = variables['params']['kernel']

    f_a = jax.jit(lambda xx: jnp.sum(
        mod.apply(variables, xx).astype(jnp.float32)))
    sa = float(f_a(x))
    ta = chain(f_a, x)
    print(f'stem current (pack24+conv3d): {ta*1000:7.1f} ms', flush=True)

    for fp, chunk in ((2, 8), (8, 8), (8, 16)):
        f_b = jax.jit(lambda xx, _fp=fp, _ck=chunk: jnp.sum(
            stem_conv_v2(pad_same(xx), kernel.astype(BF), fp=_fp,
                         chunk=_ck).astype(jnp.float32)))
        sb = float(f_b(x))
        rel = abs(sa - sb) / (abs(sa) + 1e-6)
        assert rel < 3e-2, (fp, chunk, sa, sb)
        tb = chain(f_b, x)
        print(f'stem v2 fp={fp} chunk={chunk:2d}      : {tb*1000:7.1f} ms '
              f'(witness rel {rel:.1e})', flush=True)


if __name__ == '__main__':
    main()
