"""Inference throughput vs window-batch W (real TPU, bench.py protocol:
forward + on-device decode, bf16, full-tensor witness, on-device data).

--bf16-input generates the window batch in bf16 (numerically identical:
the model's first conv casts f32 inputs to bf16 anyway) — halves the
input's HBM (2.26 GB at W=160), unlocking Ws past the f32-input OOM.
Add a carry-dependency cast so the chained timing still works."""
import sys
import time

import jax
import jax.numpy as jnp

from opental_tpu.infer.decode import decode_windows
from opental_tpu.models.bdnet import BDNet

CLIP, CROP = 256, 96


def main():
    model = BDNet(num_classes=16, os_head=True, use_edl=True,
                  frame_num=CLIP, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, CLIP, CROP, CROP, 3)))

    bf16_in = '--bf16-input' in sys.argv
    ws = [int(v) for v in (sys.argv[sys.argv.index('--ws') + 1].split(',')
                           if '--ws' in sys.argv else ('160', '192', '256'))]
    dt_in = jnp.bfloat16 if bf16_in else jnp.float32
    for w in ws:
        x = jax.jit(lambda _w=w: jax.random.normal(
            jax.random.PRNGKey(1), (_w, CLIP, CROP, CROP, 3),
            dt_in))()

        @jax.jit
        def forward_decode(variables, clips):
            out = model.apply(variables, clips)
            dec = decode_windows(out, CLIP, use_edl=True, os_head=True,
                                 score_func='dirichlet')
            return (jnp.sum(dec.scores.astype(jnp.float32))
                    + jnp.sum(dec.segments.astype(jnp.float32))
                    + jnp.sum(dec.uncertainty.astype(jnp.float32))
                    + jnp.sum(dec.actionness.astype(jnp.float32)))

        def step(carry):
            return forward_decode(variables, x + carry.astype(dt_in) * 0)

        carry = jnp.float32(0)
        for _ in range(3):
            carry = step(carry)
        float(carry)
        n = 20
        t0 = time.perf_counter()
        carry = jnp.float32(0)
        for _ in range(n):
            carry = step(carry)
        float(carry)
        dt = (time.perf_counter() - t0) / n
        print(f'W={w:3d}: {dt*1000:7.1f} ms/iter = {w/dt:6.1f} clips/s',
              flush=True)
        del x


if __name__ == '__main__':
    main()
