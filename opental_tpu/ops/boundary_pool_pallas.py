"""Pallas TPU kernel for boundary max pooling (+ first-argmax backward).

Same op contract as ops/boundary_pool.py (the XLA sparse-table path):
x (B, T, C) channels-last, segments (B, K, 4), out (B, K, C); channel
half h reads window segments[..., 2h:2h+2]. Spec source:
AFSD/prop_pooling/boundary_max_pooling_kernel.cu:17-82.

Kernel shape: grid over the batch; one program holds the full (T, C)
feature block in VMEM (<= 1 MB for T=256, C=1024 bf16) and loops the K
proposals with masked VPU maxes — no data-dependent memory access, so
windows become (iota >= l) & (iota <= r) row masks. Backward rebuilds
the first-argmax per (k, c) with an iota-min trick and accumulates the
one-hot-scattered gradient in VMEM.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NEG = -1e30  # big-negative instead of -inf: keeps bf16/VPU semantics tame


def _window_bounds(seg_ref, k, half, t_len):
    """Clamped int (l, r) for proposal k, channel-half `half`."""
    l = jnp.clip(seg_ref[k, 2 * half].astype(jnp.int32), 0, t_len - 1)
    r = jnp.clip(seg_ref[k, 2 * half + 1].astype(jnp.int32), 0, t_len - 1)
    return l, jnp.maximum(r, l)


def _fwd_kernel(seg_ref, x_ref, out_ref):
    t_len, c = x_ref.shape
    k_num = out_ref.shape[0]
    half = c // 2
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (t_len, 1), 0)

    def body(k, _):
        for h in (0, 1):
            l, r = _window_bounds(seg_ref, k, h, t_len)
            mask = (iota_t >= l) & (iota_t <= r)          # (T, 1)
            xh = x_ref[:, h * half:(h + 1) * half]
            masked = jnp.where(mask, xh, NEG)
            out_ref[pl.ds(k, 1), h * half:(h + 1) * half] = jnp.max(
                masked, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, k_num, body, 0)


def _bwd_kernel(seg_ref, x_ref, g_ref, dx_ref):
    t_len, c = x_ref.shape
    k_num = g_ref.shape[0]
    half = c // 2
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (t_len, 1), 0)
    dx_ref[:] = jnp.zeros_like(dx_ref)

    def body(k, _):
        for h in (0, 1):
            l, r = _window_bounds(seg_ref, k, h, t_len)
            mask = (iota_t >= l) & (iota_t <= r)
            xh = x_ref[:, h * half:(h + 1) * half]
            masked = jnp.where(mask, xh, NEG)
            maxv = jnp.max(masked, axis=0, keepdims=True)     # (1, Ch)
            # first index attaining the max (CUDA strict-> scan parity)
            hit = mask & (masked >= maxv)
            first = jnp.min(jnp.where(hit, iota_t, t_len), axis=0,
                            keepdims=True)                    # (1, Ch)
            onehot = (iota_t == first).astype(g_ref.dtype)    # (T, Ch)
            sl = slice(h * half, (h + 1) * half)
            g_row = g_ref[pl.ds(k, 1), sl]                    # (1, Ch)
            dx_ref[:, sl] = dx_ref[:, sl] + onehot * g_row
        return 0

    jax.lax.fori_loop(0, k_num, body, 0)


def _pallas_forward(x: Array, segments: Array,
                    interpret: bool = False) -> Array:
    b, t_len, c = x.shape
    k_num = segments.shape[1]
    return pl.pallas_call(
        _fwd_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, k_num, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, t_len, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, k_num, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k_num, c), x.dtype),
        interpret=interpret,
    )(segments, x)


def _pallas_backward(x: Array, segments: Array, g: Array,
                     interpret: bool = False) -> Array:
    b, t_len, c = x.shape
    k_num = segments.shape[1]
    return pl.pallas_call(
        _bwd_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, k_num, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, t_len, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, k_num, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, t_len, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_len, c), g.dtype),
        interpret=interpret,
    )(segments, x, g)


def make_boundary_max_pool(interpret: bool = False):
    """Build the custom-vjp pallas op (interpret=True for CPU tests)."""

    @jax.custom_vjp
    def op(x, segments):
        return _pallas_forward(x, segments, interpret)

    def fwd(x, segments):
        return op(x, segments), (x, segments)

    def bwd(res, g):
        x, segments = res
        return _pallas_backward(x, segments, g, interpret), None

    op.defvjp(fwd, bwd)
    return op


boundary_max_pool_pallas = make_boundary_max_pool(interpret=False)


@functools.lru_cache(maxsize=None)
def _interpret_op():
    return make_boundary_max_pool(interpret=True)


def boundary_max_pool_interpret(x: Array, segments: Array) -> Array:
    """Interpreter-mode twin for CPU correctness tests."""
    return _interpret_op()(x, segments)
