"""Mosaic op-support probes (perf exploration, run on real TPU).

Each probe is a minimal pallas kernel exercising ONE layout op the fused
stem-pack kernel design needs. Learning which compile cheaply beats
designing blind: a rejected op prints its Mosaic error, a passing op is
checked numerically vs numpy.

Usage: python scripts/probe_mosaic_ops.py [probe ...]
"""
import functools
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

A, L = 64, 256  # sublane-ish x lane-ish test shape


def run_probe(name, kernel, x, expect):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(expect.shape, expect.dtype),
        )(x)
        ok = np.allclose(np.asarray(out), expect, atol=1e-6)
        print(f'{name:28s}: {"OK" if ok else "WRONG RESULT"}', flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).split('\n')[0][:140]
        print(f'{name:28s}: FAIL {type(e).__name__}: {msg}', flush=True)


def main(only=()):
    rng = np.random.RandomState(0)
    x = rng.randn(A, L).astype(np.float32)
    xj = jnp.asarray(x)

    probes = {}

    # (a) lane-keeping sublane split (A, L) -> (A/2, 2, L)
    def k_sublane_split(ref, o):
        o[...] = ref[...].reshape(A // 2, 2, L)
    probes['sublane_split'] = (k_sublane_split, xj,
                               x.reshape(A // 2, 2, L))

    # (b) middle-dim static index after sublane split: even rows
    def k_even_rows(ref, o):
        o[...] = ref[...].reshape(A // 2, 2, L)[:, 0, :]
    probes['even_rows_via_reshape'] = (k_even_rows, xj, x[0::2])

    # (b2) strided sublane slice directly
    def k_stride2_rows(ref, o):
        o[...] = ref[...][0::2, :]
    probes['stride2_sublane_slice'] = (k_stride2_rows, xj, x[0::2])

    # (c) static lane slice at non-aligned offset (51)
    def k_lane_slice(ref, o):
        o[...] = ref[...][:, 51:51 + 128]
    probes['lane_slice_offset51'] = (k_lane_slice, xj, x[:, 51:179])

    # (d) lane concat of two non-128 pieces (96 + 96)
    def k_lane_concat(ref, o):
        v = ref[...]
        o[...] = jnp.concatenate([v[:, :96], v[:, 96:192]], axis=-1)
    probes['lane_concat_96_96'] = (k_lane_concat, xj, x[:, :192])

    # (e) sublane -> leading transpose (A, L) -> 3D (A, L/128, 128) then
    #     move lane-block dim to front
    def k_lead_transpose(ref, o):
        v = ref[...].reshape(A, L // 128, 128)
        o[...] = jnp.transpose(v, (1, 0, 2))
    probes['laneblock_to_leading'] = (
        k_lead_transpose, xj, x.reshape(A, L // 128, 128).transpose(1, 0, 2))

    # (f) 2D transpose lanes<->sublanes
    def k_t2d(ref, o):
        o[...] = ref[...].T
    probes['transpose_2d'] = (k_t2d, xj, x.T)

    # (g) dot with K in sublanes of B: (64, A) @ (A, L) — two-input call
    wB = rng.randn(64, A).astype(np.float32)

    def dot_probe():
        def k_dot(wref, ref, o):
            o[...] = jax.lax.dot(wref[...], ref[...])
        try:
            out = pl.pallas_call(
                k_dot,
                out_shape=jax.ShapeDtypeStruct((64, L), np.float32),
            )(jnp.asarray(wB), xj)
            ok = np.allclose(np.asarray(out), wB @ x, atol=1e-4)
            print(f'{"dot_k_sublanes":28s}: {"OK" if ok else "WRONG RESULT"}',
                  flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).split('\n')[0][:140]
            print(f'{"dot_k_sublanes":28s}: FAIL {type(e).__name__}: {msg}',
                  flush=True)
    probes['dot_k_sublanes'] = dot_probe

    # (h) interleaved lane split (A, L) -> (A, L/2, 2) [known-bad ref pt]
    def k_lane_split(ref, o):
        o[...] = ref[...].reshape(A, L // 2, 2)
    probes['lane_split_interleave'] = (k_lane_split, xj,
                                       x.reshape(A, L // 2, 2))

    # (i) chunked lane->sublane reshape (A, L) -> (A, 2, L/2):
    #     contiguous chunks to a new sublane-adjacent dim
    def k_chunk_split(ref, o):
        v = ref[...]
        o[...] = jnp.stack([v[:, :L // 2], v[:, L // 2:]], axis=1)
    probes['lane_chunks_to_sublanes'] = (
        k_chunk_split, xj,
        np.stack([x[:, :L // 2], x[:, L // 2:]], axis=1))

    # (j) single-sublane extract to leading dim: (A, L)[p] -> (L,)
    def k_row_extract(ref, o):
        o[...] = ref[...][7]
    probes['single_row_extract'] = (k_row_extract, xj, x[7])

    # (k) broadcast row stack: build (8, L) from 8 static rows
    def k_row_stack(ref, o):
        v = ref[...]
        o[...] = jnp.stack([v[i] for i in range(8)], axis=0)
    probes['row_stack8'] = (k_row_stack, xj, x[:8])

    names = only or list(probes)
    for n in names:
        entry = probes[n]
        if callable(entry) and not isinstance(entry, tuple):
            entry()
        else:
            kern, inp, exp = entry
            run_probe(n, kern, inp, exp)


if __name__ == '__main__':
    main(tuple(sys.argv[1:]))
