"""Measure training-batch host->device ingestion: f32 vs uint8_ingest.

The train step's input (clips + ssl_clips at bs=8, 256f, 96px) is
452 MB in f32 and 113 MB raw uint8; `training.uint8_ingest` ships the
raw bytes and normalizes inside the jitted step (train/step.device_ingest,
exact — PARITY.md). This script times ship -> device_ingest -> scalar
fetch per batch on the real TPU, isolating the transfer axis the train
bench (bench.py bench_train, device-resident batches) deliberately
excludes.

Through this environment's ~20-50 MB/s axon tunnel the absolute numbers
are tunnel artifacts, but the RATIO is the portable claim: any host link
moves 4x fewer bytes per step.

Usage: python scripts/bench_train_ingest.py [--bs 8] [--iters 3]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from opental_tpu.train.step import device_ingest


def make_batch(bs, clip, crop, uint8):
    rng = np.random.RandomState(0)
    raw = {k: rng.randint(0, 256, (bs, clip, crop, crop, 3), np.uint8)
           for k in ('clips', 'ssl_clips')}
    if not uint8:
        raw = {k: (v.astype(np.float32) / 255.0) * 2.0 - 1.0
               for k, v in raw.items()}
    return raw


def bench(batch, iters):
    nbytes = sum(v.nbytes for v in batch.values())

    @jax.jit
    def ingest_sum(b):
        b = device_ingest(b)
        return sum(jnp.sum(v.astype(jnp.float32)) for v in b.values())

    # warm the compile with a shipped batch
    float(ingest_sum({k: jnp.asarray(v) for k, v in batch.items()}))
    t0 = time.perf_counter()
    for i in range(iters):
        # dirty one element so no layer can dedupe the host buffer
        batch['clips'][0, 0, 0, 0, 0] = i % 255
        float(ingest_sum({k: jnp.asarray(v) for k, v in batch.items()}))
    dt = (time.perf_counter() - t0) / iters
    return dt, nbytes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--bs', type=int, default=8)
    ap.add_argument('--clip', type=int, default=256)
    ap.add_argument('--crop', type=int, default=96)
    ap.add_argument('--iters', type=int, default=3)
    args = ap.parse_args()

    results = {}
    for uint8 in (True, False):   # uint8 first: smaller, fails fast
        name = 'uint8' if uint8 else 'f32'
        batch = make_batch(args.bs, args.clip, args.crop, uint8)
        dt, nbytes = bench(batch, args.iters)
        results[name] = dt
        print(f'{name}: {nbytes / 1e6:.0f} MB/batch, {dt:.2f} s/batch, '
              f'{nbytes / 1e6 / dt:.1f} MB/s', flush=True)
    print(f'uint8 ingest speedup: {results["f32"] / results["uint8"]:.2f}x',
          flush=True)


if __name__ == '__main__':
    main()
