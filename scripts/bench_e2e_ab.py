"""A/B the e2e inference modes on the real TPU (round-4 check).

Runs bench.py's e2e phases only: host-NMS path, device pipeline
(per-video device_ingest), and the new packed frame-staged mode
(run_videos_ingest). The round-4 'done' criterion is
e2e_packed >= e2e_device (VERDICT r3 next #1). Keep the host otherwise
idle: staging runs on the host and contends with anything else on this
1-core machine.
"""

import time

import jax
import jax.numpy as jnp

import bench


def main():
    model = bench.BDNet(num_classes=16, os_head=True, use_edl=True,
                        frame_num=bench.CLIP, dtype=jnp.bfloat16)
    x = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(0), (1, bench.CLIP, bench.CROP, bench.CROP, 3),
        jnp.float32))()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    t0 = time.time()
    e2e_device, e2e_packed = bench.bench_e2e_dataset(model, variables)
    print(f'e2e_device: {e2e_device:.2f} clips/s, '
          f'e2e_packed: {e2e_packed:.2f} clips/s '
          f'[{time.time() - t0:.0f}s]', flush=True)
    print(f'packed >= device: {e2e_packed >= e2e_device}', flush=True)


if __name__ == '__main__':
    main()
