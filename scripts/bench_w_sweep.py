"""Inference throughput vs window-batch W (real TPU, bench.py protocol:
forward + on-device decode, bf16, full-tensor witness, on-device data)."""
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

    for w in (160, 192, 256):
        x = jax.jit(lambda _w=w: jax.random.normal(
            jax.random.PRNGKey(1), (_w, CLIP, CROP, CROP, 3),
            jnp.float32))()

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
            return forward_decode(variables, x + carry * 0)

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
