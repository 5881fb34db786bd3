"""ANet-variant inference throughput on real TPU: 768-frame 96x96
videos (one window per video, anet/test.py:76) batched on the video
axis, bf16, forward + full-tensor witness, on-device data."""
import time

import jax
import jax.numpy as jnp

from opental_tpu.models.bdnet import BDNet

CLIP, CROP = 768, 96


def main():
    # anet_opental.yaml flags: 150 known + 1 bg, os_head, EDL
    model = BDNet(num_classes=151, os_head=True, use_edl=True,
                  frame_num=CLIP, arch='anet', dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, CLIP, CROP, CROP, 3)))

    for w in (8, 16, 24, 32):
        x = jax.jit(lambda _w=w: jax.random.normal(
            jax.random.PRNGKey(1), (_w, CLIP, CROP, CROP, 3),
            jnp.float32))()

        @jax.jit
        def fwd(variables, clips):
            out = model.apply(variables, clips)
            return sum(jnp.sum(v.astype(jnp.float32))
                       for v in out.values() if v is not None)

        def step(carry):
            return fwd(variables, x + carry * 0)

        try:
            carry = jnp.float32(0)
            for _ in range(2):
                carry = step(carry)
            float(carry)
            n = 10
            t0 = time.perf_counter()
            carry = jnp.float32(0)
            for _ in range(n):
                carry = step(carry)
            float(carry)
            dt = (time.perf_counter() - t0) / n
            print(f'W={w:3d}: {dt*1000:7.1f} ms/iter = {w/dt:6.1f} '
                  f'videos/s (768f each)', flush=True)
        except Exception as e:  # noqa: BLE001
            print(f'W={w:3d}: FAIL {type(e).__name__}: '
                  f'{str(e).splitlines()[0][:90]}', flush=True)
            break
        del x


if __name__ == '__main__':
    main()
