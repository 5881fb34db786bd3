"""Where does packed e2e inference time go?

BENCH_r04's A/B measured packed run_videos_ingest at ~2.9 clips/s =
~11.6 MB/s effective frame bandwidth, vs the 21.6 MB/s best-case the
chunked-put probe measured (scripts/probe_transfer.py). Two hypotheses:
  (a) tunnel weather — the link itself ran at ~11 MB/s during the A/B
      (probe range 16-22 observed across sessions), pipeline saturated;
  (b) pipeline loss — staging inside run_videos_ingest is slower than a
      pure stage_frames of the same bytes in the same process (GIL
      contention with the main thread's forward dispatch + result
      fetches, host buffer-assembly memcpy, per-flush sync structure).

This probe separates them IN ONE PROCESS (only same-process A/B is
trustworthy through the tunnel, CLAUDE.md):
  1. pure stage_frames bandwidth of one flush-sized buffer (synced by a
     scalar readback — block_until_ready returns early here);
  2. the bench workload through run_videos_ingest with stage_frames
     wrapped to time each staged flush on the prefetch thread, and the
     main-thread forward/fetch sections timed around the flush loop;
  3. host buffer-assembly cost (np.zeros + per-video memcpy) measured
     standalone for one flush.

If (in-pipeline stage MB/s ~= pure MB/s) and (sum of stage time ~=
total wall), the pipeline is transfer-saturated and the 2.9-vs-5
clips/s gap is link weather — close it with numbers in BASELINE.md.
Otherwise the delta localizes what to fix.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from opental_tpu.infer import pipeline as plmod
from opental_tpu.models.bdnet import BDNet

CLIP, CROP = 256, 96
N_VIDEOS = 32
FRAMES = 128 * 7 + 256          # 8 windows/video
PER_FLUSH_VIDEOS = 16


def sync_scalar(dev):
    return float(jnp.asarray(dev).reshape(-1)[0])


def main():
    model = BDNet(num_classes=16, os_head=True, use_edl=True,
                  frame_num=CLIP, dtype=jnp.bfloat16)
    x0 = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(0), (1, CLIP, CROP, CROP, 3), jnp.float32))()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)

    rng = np.random.RandomState(0)
    vids = [(f'v{i}', rng.randint(0, 255, (FRAMES, CROP, CROP, 3),
                                  np.uint8), FRAMES, 10.0)
            for i in range(N_VIDEOS)]
    flush_frames = PER_FLUSH_VIDEOS * FRAMES
    flush_mb = flush_frames * CROP * CROP * 3 / 1e6

    # --- 3. host assembly cost for one flush (np.zeros + memcpy) ---
    t0 = time.perf_counter()
    buf = np.zeros((flush_frames, CROP, CROP, 3), np.uint8)
    for i in range(PER_FLUSH_VIDEOS):
        buf[i * FRAMES:(i + 1) * FRAMES] = vids[i][1]
    assembly_s = time.perf_counter() - t0

    # --- 1. pure staging bandwidth, same buffer shape as a flush ---
    pure = []
    for _ in range(2):
        t0 = time.perf_counter()
        dev = plmod.stage_frames(buf, 1024, pad_to=flush_frames)
        sync_scalar(dev[0, 0, 0, :1])
        pure.append(time.perf_counter() - t0)
        del dev
    pure_s = min(pure)

    # --- 2. instrumented run_videos_ingest on the bench workload ---
    stage_log = []
    real_stage = plmod.stage_frames

    def timed_stage(b, chunk, pad_to=None):
        t0 = time.perf_counter()
        dev = real_stage(b, chunk, pad_to=pad_to)
        sync_scalar(dev[0, 0, 0, :1])   # prefetch thread waits for bytes
        stage_log.append((b.nbytes / 1e6, time.perf_counter() - t0))
        return dev

    kwargs = dict(clip_length=CLIP, stride=128, crop_size=CROP,
                  conf_thresh=0.01, top_k=5000, nms_sigma=0.5,
                  use_edl=True, os_head=True, device_post=True,
                  device_ingest=True)
    pipe = plmod.InferencePipeline(model, variables, **kwargs)
    pk = dict(max_batch=128, frames_capacity=PER_FLUSH_VIDEOS * FRAMES)
    pipe.run_videos(iter(vids[:2]), **pk)       # warm all jits

    plmod.stage_frames = timed_stage
    try:
        t0 = time.perf_counter()
        res = pipe.run_videos(iter(vids), **pk)
        total_s = time.perf_counter() - t0
    finally:
        plmod.stage_frames = real_stage
    assert len(res) == N_VIDEOS

    stage_sum = sum(s for _, s in stage_log)
    stage_mb = sum(m for m, _ in stage_log)
    print(json.dumps({
        'flush_mb': round(flush_mb, 1),
        'host_assembly_s': round(assembly_s, 2),
        'pure_stage_s': round(pure_s, 2),
        'pure_stage_mb_per_s': round(flush_mb / pure_s, 2),
        'pipeline_total_s': round(total_s, 2),
        'pipeline_clips_per_s': round(8 * N_VIDEOS / total_s, 2),
        'stage_calls': [(round(m, 1), round(s, 2)) for m, s in stage_log],
        'stage_sum_s': round(stage_sum, 2),
        'in_pipeline_stage_mb_per_s': round(stage_mb / stage_sum, 2),
        'non_stage_s': round(total_s - stage_sum, 2),
    }, ))


if __name__ == '__main__':
    main()
