"""Measure the REAL train input pipeline against the 183 ms/step budget.

All train throughput numbers so far use device-resident synthetic
batches (bench.py bench_train / utils.synthetic.device_train_batch); the
open question (VERDICT r3 weak #2) is whether host-side
ThumosTrainDataset batch assembly at bs=8 — mmap'd npy slice + random
crop/flip + SSL cut-paste + stack — can feed the measured 183 ms TPU
step on this 1-core host (the reference used 4 DataLoader workers,
AFSD/thumos14/train.py:345).

Two phases:
  1. host-assembly-only: wall time per dataset.batches(bs) batch, f32
     vs uint8_ingest. This is the PORTABLE number: on a production host
     the device link is not the bottleneck, so the pipeline keeps the
     chip fed iff assembly < step time (183 ms).
  2. overlapped e2e on the real device: prefetch-depth sweep with the
     shipped prefetch machinery and a stand-in device step (the jitted
     uint8 ingest+sum — the transfer is the point; through this
     environment's ~16-22 MB/s tunnel e2e is transfer-bound regardless
     of depth, which phase 1 factors out).

Usage: python scripts/bench_train_pipeline.py [--bs 8] [--n 10]
"""

import argparse
import os
import shutil
import tempfile
import time

import numpy as np


def build_dataset(root, n_videos=6, frames=2400, spatial=112, bs=8,
                  uint8_ingest=False):
    from opental_tpu.data.thumos import (ThumosTrainDataset,
                                         get_video_anno, get_video_info)
    from opental_tpu.utils.synthetic import make_synthetic_dataset
    cfg_dir = os.path.join(root, 'ds')
    if not os.path.exists(cfg_dir):
        make_synthetic_dataset(
            cfg_dir, n_train=n_videos, n_test=1, clip_length=256,
            crop_size=96, spatial=spatial,
            video_len_range=(frames, frames + 1))
    anno = os.path.join(cfg_dir, 'annotations')
    video_infos = get_video_info(os.path.join(anno, 'val_video_info.csv'))
    video_annos = get_video_anno(
        video_infos, os.path.join(anno, 'val_Annotation_known.csv'),
        os.path.join(anno, 'Class_Index_Known.txt'))
    return ThumosTrainDataset(
        os.path.join(cfg_dir, 'val_npy'), video_infos, video_annos,
        clip_length=256, crop_size=96, stride=30, seed=0,
        uint8_ingest=uint8_ingest)


def host_only(ds, bs, n):
    it = ds.batches(bs)
    next(it)                         # warm mmaps / page cache
    t0 = time.perf_counter()
    got = 0
    for _ in range(n):
        try:
            next(it)
            got += 1
        except StopIteration:
            it = ds.batches(bs)
    return (time.perf_counter() - t0) / max(got, 1)


def overlapped(ds, bs, n, depth):
    import jax
    import jax.numpy as jnp

    from opental_tpu.data.prefetch import prefetch
    from opental_tpu.train.step import device_ingest

    @jax.jit
    def ingest_sum(b):
        b = device_ingest(b)
        return sum(jnp.sum(v.astype(jnp.float32)) for v in b.values()
                   if v.ndim >= 4)

    def place(b):
        return {k: jnp.asarray(v) for k, v in b.items()}

    def stream():
        it = ds.batches(bs)
        for _ in range(n + 1):
            try:
                yield next(it)
            except StopIteration:
                it = ds.batches(bs)
                yield next(it)

    it = (prefetch(stream(), place, depth=depth) if depth > 0
          else (place(b) for b in stream()))
    float(ingest_sum(next(it)))      # warm compile
    t0 = time.perf_counter()
    k = 0
    for b in it:
        float(ingest_sum(b))
        k += 1
    return (time.perf_counter() - t0) / max(k, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--bs', type=int, default=8)
    ap.add_argument('--n', type=int, default=10)
    ap.add_argument('--root', default=None)
    ap.add_argument('--keep', action='store_true')
    ap.add_argument('--skip_device', action='store_true')
    args = ap.parse_args()

    root = args.root or tempfile.mkdtemp(prefix='train_pipe_')
    print(f'dataset root: {root}', flush=True)
    try:
        for uint8 in (False, True):
            ds = build_dataset(root, bs=args.bs, uint8_ingest=uint8)
            dt = host_only(ds, args.bs, args.n)
            tag = 'uint8' if uint8 else 'f32  '
            print(f'host assembly [{tag}]: {dt * 1000:7.1f} ms/batch '
                  f'(budget 183 ms/step; '
                  f'{"keeps the chip fed" if dt < 0.183 else "STARVES"})',
                  flush=True)
        if not args.skip_device:
            ds = build_dataset(root, bs=args.bs, uint8_ingest=True)
            for depth in (0, 2, 4):
                dt = overlapped(ds, args.bs, args.n, depth)
                print(f'e2e ship+ingest [uint8, depth={depth}]: '
                      f'{dt * 1000:7.1f} ms/batch', flush=True)
    finally:
        if args.root is None and not args.keep:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == '__main__':
    main()
