"""Boundary max pooling — TPU-native replacement for the reference CUDA op.

Spec (AFSD/prop_pooling/boundary_max_pooling_kernel.cu:17-82): for each
(batch n, channel c, proposal k), max-pool the temporal feature over the
window [l, r] given by the per-proposal 4-tuple `segments[n, k, :]`; the
first channel half reads the (start) window segments[..., 0:2], the second
half the (end) window segments[..., 2:4]. Backward routes the gradient to
the (first) argmax via scatter-add.

This implementation is layout-swapped to channels-last — x: (B, T, C),
segments: (B, K, 4), out: (B, K, C) — and replaces the CUDA per-thread
scan with an O(T log T) sparse-table (range-max query) build + O(1)
two-gather queries, which vectorizes cleanly on the VPU with no
data-dependent loop. Gradients use a custom VJP with first-argmax
scatter-add, exactly matching the CUDA backward (…kernel.cu:48-82).

`boundary_max_pool_masked` is the straightforward mask-and-max fallback
kept for cross-checking in tests.
"""

from __future__ import annotations

import contextlib
import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _clamp_windows(segments: Array, tscale: int) -> Tuple[Array, Array]:
    """(B, K, 4) float segments -> int (l, r) windows (B, K, 2), clamped.

    Follows the CUDA kernel exactly: static_cast<int> (trunc toward zero),
    clamp into [0, tscale-1], and a degenerate r < l window reduces to the
    single element at l (…kernel.cu:33-36).
    """
    seg = segments.astype(jnp.int32)  # trunc toward zero, like static_cast
    l = jnp.clip(seg[..., 0::2], 0, tscale - 1)
    r = jnp.clip(seg[..., 1::2], 0, tscale - 1)
    r = jnp.maximum(r, l)
    return l, r


def _build_tables(x: Array) -> Tuple[Array, Array]:
    """Sparse (doubling) range-max tables over axis 1 of (B, T, C).

    Returns (vals, idxs), each (L, B, T, C) with L = floor(log2 T) + 1:
    vals[j, :, t] = max(x[:, t : t + 2**j]) (clamped at T-1) and idxs the
    FIRST index attaining it (ties break low, like the CUDA strict-> scan).
    """
    _, t_len, _ = x.shape
    levels = max(1, int(math.floor(math.log2(t_len))) + 1)
    pos = jnp.arange(t_len, dtype=jnp.int32)
    vals = [x]
    idxs = [jnp.broadcast_to(pos[None, :, None], x.shape).astype(jnp.int32)]
    for j in range(1, levels):
        off = 1 << (j - 1)
        shifted = jnp.minimum(pos + off, t_len - 1)
        v_prev, i_prev = vals[-1], idxs[-1]
        v_shift = jnp.take(v_prev, shifted, axis=1)
        i_shift = jnp.take(i_prev, shifted, axis=1)
        take_left = v_prev >= v_shift
        vals.append(jnp.where(take_left, v_prev, v_shift))
        idxs.append(jnp.where(take_left, i_prev, i_shift))
    return jnp.stack(vals), jnp.stack(idxs)


def _query(tables: Tuple[Array, Array], l: Array, r: Array
           ) -> Tuple[Array, Array]:
    """Range-max over [l, r] per (b, k). Returns (values, argmax) (B,K,C)."""
    vals, idxs = tables
    length = (r - l + 1).astype(jnp.float32)
    j = jnp.floor(jnp.log2(length)).astype(jnp.int32)     # exact for T<=2^20
    b2 = r + 1 - (1 << j)

    def one_batch(v_b, i_b, j_b, l_b, b2_b):
        # v_b/i_b: (L, T, C); j_b/l_b/b2_b: (K,)
        v1, v2 = v_b[j_b, l_b], v_b[j_b, b2_b]            # (K, C)
        i1, i2 = i_b[j_b, l_b], i_b[j_b, b2_b]
        take_left = v1 >= v2
        return jnp.where(take_left, v1, v2), jnp.where(take_left, i1, i2)

    return jax.vmap(one_batch, in_axes=(1, 1, 0, 0, 0))(vals, idxs, j, l, b2)


def _forward(x: Array, segments: Array) -> Tuple[Array, Array]:
    b, t_len, c = x.shape
    assert c % 2 == 0, 'channel count must split into start/end halves'
    l, r = _clamp_windows(segments, t_len)                # (B, K, 2)
    half = c // 2
    outs, args = [], []
    for h in range(2):
        tables = _build_tables(x[:, :, h * half:(h + 1) * half])
        v, i = _query(tables, l[..., h], r[..., h])
        outs.append(v)
        args.append(i)
    return jnp.concatenate(outs, -1), jnp.concatenate(args, -1)


@jax.custom_vjp
def boundary_max_pool(x: Array, segments: Array) -> Array:
    """out[b, k, c] = max_{t in [l,r]} x[b, t, c] with per-half windows.

    x: (B, T, C) features; segments: (B, K, 4) float windows.
    Returns (B, K, C). Differentiable in x only (segments are produced
    under stop_gradient in the model, as in thumos14/BDNet.py:355-384).
    """
    out, _ = _forward(x, segments)
    return out


def _fwd_rule(x, segments):
    out, argmax = _forward(x, segments)
    # zero-byte token carrying x's (T,) extent and dtype through the pytree
    shape_token = jnp.zeros((x.shape[1], 0), x.dtype)
    return out, (argmax, shape_token)


def _bwd_rule(residuals, g):
    argmax, shape_token = residuals
    b, _, c = argmax.shape
    t_len = shape_token.shape[0]
    bi = jnp.arange(b, dtype=jnp.int32)[:, None, None]
    ci = jnp.arange(c, dtype=jnp.int32)[None, None, :]
    dx = jnp.zeros((b, t_len, c), g.dtype).at[bi, argmax, ci].add(g)
    return dx.astype(shape_token.dtype), None


boundary_max_pool.defvjp(_fwd_rule, _bwd_rule)


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ('tpu', 'axon')


_FORCE_XLA = False


@contextlib.contextmanager
def force_xla_path():
    """Route boundary_max_pool_auto to the pure-XLA twin regardless of
    backend — needed when tracing for multi-platform jax.export (a
    Pallas call has no CPU lowering) and for A/B tests."""
    global _FORCE_XLA
    prev, _FORCE_XLA = _FORCE_XLA, True
    try:
        yield
    finally:
        _FORCE_XLA = prev


def boundary_max_pool_auto(x: Array, segments: Array) -> Array:
    """Backend dispatch: the Pallas kernel on TPU (10x the XLA
    sparse-table path there), XLA everywhere else (or under
    force_xla_path). Both share the exact CUDA-parity semantics and
    first-argmax backward."""
    if _on_tpu() and not _FORCE_XLA:
        from opental_tpu.ops.boundary_pool_pallas import (
            boundary_max_pool_pallas)
        return boundary_max_pool_pallas(x, segments)
    return boundary_max_pool(x, segments)


@functools.partial(jax.jit, static_argnames=())
def boundary_max_pool_masked(x: Array, segments: Array) -> Array:
    """Mask-and-max reference implementation (O(K*T) memory), for tests."""
    b, t_len, c = x.shape
    half = c // 2
    l, r = _clamp_windows(segments, t_len)
    pos = jnp.arange(t_len, dtype=jnp.int32)
    outs = []
    for h in range(2):
        mask = ((pos[None, None, :] >= l[..., h][..., None])
                & (pos[None, None, :] <= r[..., h][..., None]))  # (B, K, T)
        xh = x[:, :, h * half:(h + 1) * half]                    # (B, T, Ch)
        masked = jnp.where(mask[..., None], xh[:, None, :, :], -jnp.inf)
        outs.append(jnp.max(masked, axis=2))                     # (B, K, Ch)
    return jnp.concatenate(outs, -1)
