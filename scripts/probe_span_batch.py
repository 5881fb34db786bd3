"""Probe: backbone cost vs (batch, span) at constant window coverage.

16 windows of clip 256 / stride 128 can be computed as B spans of k
windows each (B*k = 16, span = 128(k-1)+256): k=1 is the per-window
path (4096 frames, batch 16), k=16 the fully-shared path (2176 frames,
batch 1). FLOPs fall with k but batch efficiency falls too — this
locates the sweet spot (bench_shared_backbone measured k=16 at 0.77x).
"""
import sys
import time

import jax
import jax.numpy as jnp

from opental_tpu.models.bdnet import BDNet

CLIP, STRIDE, CROP = 256, 128, 96


def main():
    model = BDNet(num_classes=16, os_head=True, use_edl=True,
                  frame_num=CLIP, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, CLIP, CROP, CROP, 3)))

    ks = [int(v) for v in (sys.argv[sys.argv.index('--ks') + 1].split(',')
                           if '--ks' in sys.argv else ('1', '2', '4', '16'))]
    totals = [int(v) for v in
              (sys.argv[sys.argv.index('--totals') + 1].split(',')
               if '--totals' in sys.argv else
               ([sys.argv[sys.argv.index('--total') + 1]]
                if '--total' in sys.argv else ['16']))]
    for total, k in ((t, k) for t in totals for k in ks):
        try:
            _one(model, variables, total, k)
        except Exception as e:   # OOM configs report and continue
            print(f'k={k:2d} total={total}: FAILED '
                  f'({type(e).__name__}: {str(e)[:120]})', flush=True)


def _one(model, variables, total, k):
    # fresh frame per config so device buffers free between configs
    b = total // k
    span = STRIDE * (k - 1) + CLIP
    x = jax.jit(lambda _b=b, _s=span: jax.random.normal(
        jax.random.PRNGKey(1), (_b, _s, CROP, CROP, 3),
        jnp.bfloat16))()

    @jax.jit
    def step(variables, x, c):
        f = model.apply(variables, x + c.astype(x.dtype) * 0,
                        method=type(model).backbone_features)
        return (jnp.sum(f['Mixed_4f'].astype(jnp.float32))
                + jnp.sum(f['Mixed_5c'].astype(jnp.float32)))

    c = jnp.float32(0)
    for _ in range(3):
        c = step(variables, x, c)
    float(c)
    n = 20
    c = jnp.float32(0)
    t0 = time.perf_counter()
    for _ in range(n):
        c = step(variables, x, c)
    float(c)
    dt = (time.perf_counter() - t0) / n
    frames = b * span
    print(f'k={k:2d} (batch {b:3d} x span {span:4d}, {frames} fr): '
          f'{dt*1000:7.1f} ms = {total/dt:6.1f} win/s', flush=True)


if __name__ == '__main__':
    main()
