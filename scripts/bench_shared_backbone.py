"""A/B: shared-backbone span-batched forward vs per-window forward on
the real TPU, at the headline scale (128 windows of clip 256 / stride
128). The shared path runs 32 spans of k=4 windows each (648 frames per
span = 20736 total vs 32768 per-window, 1.58x fewer backbone FLOPs)
while keeping a wide span batch for the MXU (probe_span_batch: fully
shared k=16 loses at 0.77x).

Timing per CLAUDE.md: device-resident inputs, chained iterations via a
data dependency, full-sum witness, one trailing sync.
"""
import sys
import time

import jax
import jax.numpy as jnp

from opental_tpu.infer.decode import decode_windows
from opental_tpu.infer.pipeline import InferencePipeline
from opental_tpu.models.bdnet import BDNet

CLIP, STRIDE, CROP = 256, 128, 96
K = int(sys.argv[sys.argv.index('--k') + 1]) if '--k' in sys.argv else 4
TOTAL = (int(sys.argv[sys.argv.index('--total') + 1])
         if '--total' in sys.argv else 128)
G = TOTAL // K                      # spans per call
SPAN = STRIDE * (K - 1) + CLIP + 8
T = STRIDE * (TOTAL - 1) + CLIP


def main():
    model = BDNet(num_classes=16, os_head=True, use_edl=True,
                  frame_num=CLIP, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, CLIP, CROP, CROP, 3)))

    pipe = InferencePipeline(model, variables, clip_length=CLIP,
                             stride=STRIDE, crop_size=CROP, use_edl=True,
                             os_head=True, shared_backbone=True,
                             shared_group=K)
    pipe.shared_max_groups = G
    shared_fwd = pipe._shared_forward(G)

    tpad = -(-(T + SPAN) // 1024) * 1024
    video_u8 = jax.jit(lambda: jax.random.randint(
        jax.random.PRNGKey(1), (tpad, CROP, CROP, 3), 0, 255,
        jnp.uint8))()
    offsets = jnp.arange(TOTAL, dtype=jnp.int32) * STRIDE
    bases = offsets[::K]
    locals_ = (offsets.reshape(G, K) - bases[:, None]).astype(jnp.int32)
    frames_valid = jnp.int32(T)

    # per-window twin: same decode, windows pre-gathered on device
    # (chunked like the bench headline's single 128-window call)
    windows = jax.jit(lambda v: jax.vmap(
        lambda o: (jax.lax.dynamic_slice(
            v, (o, 0, 0, 0), (CLIP, CROP, CROP, 3)
        ).astype(jnp.float32) / 255.0) * 2.0 - 1.0)(offsets))(video_u8)

    @jax.jit
    def per_window(variables, clips, c):
        out = decode_windows(
            model.apply(variables, clips + c.astype(clips.dtype) * 0),
            CLIP, use_edl=True, os_head=True, score_func='dirichlet')
        return (jnp.sum(out.segments.astype(jnp.float32))
                + jnp.sum(out.scores.astype(jnp.float32)))

    @jax.jit
    def shared(variables, video_u8, c):
        dec = shared_fwd(variables,
                         video_u8 + (c.astype(jnp.uint8) * 0),
                         bases, locals_, frames_valid)
        return (jnp.sum(dec.segments.astype(jnp.float32))
                + jnp.sum(dec.scores.astype(jnp.float32)))

    def timeit(fn, *args, n=20):
        c = jnp.float32(0)
        for _ in range(3):
            c = fn(*args, c)
        float(c)
        c = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(n):
            c = fn(*args, c)
        float(c)
        return (time.perf_counter() - t0) / n

    t_sh = timeit(shared, variables, video_u8)
    print(f'shared k={K}: {t_sh*1000:7.1f} ms '
          f'= {TOTAL/t_sh:6.1f} clips/s', flush=True)
    t_pw = timeit(per_window, variables, windows)
    print(f'per-window : {t_pw*1000:7.1f} ms '
          f'= {TOTAL/t_pw:6.1f} clips/s (shared {t_pw/t_sh:.2f}x)',
          flush=True)


if __name__ == '__main__':
    main()
