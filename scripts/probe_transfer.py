"""Probe host->device transfer bandwidth through the axon tunnel.

The e2e inference pipeline is TRANSFER-bound on this host (CLAUDE.md):
every design choice in the packed staging path (buffer size, chunking,
concurrent staging threads) should follow from how the tunnel's
effective bandwidth scales with transfer size and concurrency. Through
the tunnel block_until_ready returns early, so each transfer is synced
by a tiny scalar readback; the readback latency is measured separately
and subtracted.
"""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    # force materialization: any scalar readback waits for the transfer
    return float(jnp.asarray(x).reshape(-1)[0])


def readback_latency(n=10):
    x = jax.device_put(np.zeros((8,), np.uint8))
    sync(x)
    t0 = time.perf_counter()
    for _ in range(n):
        sync(x)
    return (time.perf_counter() - t0) / n


def bw_single(mb, lat, iters=3):
    arr = np.random.randint(0, 255, (mb * 1024 * 1024,), np.uint8)
    best = float('inf')
    for _ in range(iters):
        t0 = time.perf_counter()
        x = jax.device_put(arr)
        sync(x)
        best = min(best, time.perf_counter() - t0 - lat)
        del x
    return mb / best


def bw_chunked(total_mb, chunk_mb, lat, iters=2):
    """One logical buffer shipped as consecutive chunk transfers,
    dispatched back-to-back (sync only at the end)."""
    n = total_mb // chunk_mb
    arrs = [np.random.randint(0, 255, (chunk_mb * 1024 * 1024,), np.uint8)
            for _ in range(n)]
    best = float('inf')
    for _ in range(iters):
        t0 = time.perf_counter()
        xs = [jax.device_put(a) for a in arrs]
        for x in xs:
            sync(x)
        best = min(best, time.perf_counter() - t0 - lat)
        del xs
    return total_mb / best


def bw_threads(total_mb, n_threads, lat, iters=2):
    """n_threads concurrent device_put streams, half the data each."""
    per = total_mb // n_threads
    arrs = [np.random.randint(0, 255, (per * 1024 * 1024,), np.uint8)
            for _ in range(n_threads)]
    best = float('inf')
    for _ in range(iters):
        out = [None] * n_threads

        def put(i):
            out[i] = jax.device_put(arrs[i])

        t0 = time.perf_counter()
        ts = [threading.Thread(target=put, args=(i,))
              for i in range(n_threads)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        for x in out:
            sync(x)
        best = min(best, time.perf_counter() - t0 - lat)
        del out
    return total_mb / best


def main():
    print('devices:', jax.devices())
    lat = readback_latency()
    print(f'scalar readback latency: {lat * 1000:.1f} ms')
    for mb in (16, 64, 128, 256):
        print(f'single {mb:4d} MB: {bw_single(mb, lat):7.1f} MB/s',
              flush=True)
    for chunk in (16, 32, 64):
        print(f'chunked 256 MB @ {chunk} MB: '
              f'{bw_chunked(256, chunk, lat):7.1f} MB/s', flush=True)
    for nt in (2, 4):
        print(f'{nt} threads, 256 MB total: '
              f'{bw_threads(256, nt, lat):7.1f} MB/s', flush=True)


if __name__ == '__main__':
    main()
