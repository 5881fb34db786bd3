"""Soft-NMS: exact-parity numpy version + bounded device (lax) version.

Reference: softnms_v2 (AFSD/common/segment_utils.py:128-162) — iterative
gaussian decay exp(-iou^2 / sigma) with score floor 1e-3, top-k cap, and
pass-through of extra (uncertainty / actionness) columns. The reference
runs a data-dependent python while-loop on CPU per class; here the same
greedy recursion is a fixed-bound jax.lax.while_loop so it can run
device-side on padded (N, D) blocks, plus a numpy twin used for parity
tests and host post-processing.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
SCORE_FLOOR = 1e-3


def soft_nms_numpy(segments: np.ndarray, sigma: float = 0.5,
                   top_k: int = 1000, score_threshold: float = SCORE_FLOOR,
                   ) -> Tuple[np.ndarray, int]:
    """segments: (N, D>=3) [start, end, score, *extras]. Returns
    (kept (M, D) rows in original index order — boolean-mask selection,
    as the reference does — with scores as of pick time, M). Greedy:
    pick argmax score among undone, gaussian-decay overlapping undone
    scores, repeat while any undone >= threshold and fewer than top_k
    picked."""
    segments = np.asarray(segments, np.float32).copy()
    tstart, tend = segments[:, 0], segments[:, 1]
    tscore = segments[:, 2]
    done = np.zeros(len(segments), bool)
    undone = tscore >= score_threshold
    while undone.sum() > 1 and done.sum() < top_k:
        idx = np.flatnonzero(undone)[tscore[undone].argmax()]
        undone[idx] = False
        done[idx] = True
        u = undone
        tt1 = np.maximum(tstart[u], tstart[idx])
        tt2 = np.minimum(tend[u], tend[idx])
        inter = np.maximum(tt2 - tt1, 0)
        width = max(tend[idx] - tstart[idx], 1e-5)
        iou = inter / (width + (tend[u] - tstart[u]) - inter)
        tscore[u] *= np.exp(-iou ** 2 / sigma)
        undone[tscore < score_threshold] = False
    segments[:, 2] = tscore
    kept = segments[done]
    return kept, int(done.sum())


def soft_nms_device(segments: Array, sigma: float = 0.5,
                    top_k: int = 200,
                    score_threshold: float = SCORE_FLOOR,
                    valid: Optional[Array] = None
                    ) -> Tuple[Array, Array]:
    """Device-side soft-NMS over a padded block.

    segments: (N, D) with [start, end, score, ...]; valid: (N,) bool mask
    for padding rows. Returns (segments with decayed scores and a `kept`
    flag column appended -> (N, D+1), picked count). Rows not picked keep
    flag 0; downstream takes the top-(top_k) picked rows by score.
    """
    n, d = segments.shape
    start, end = segments[:, 0], segments[:, 1]
    scores0 = segments[:, 2]
    if valid is None:
        valid = jnp.ones((n,), bool)

    def cond(state):
        scores, undone, done_count, _ = state
        active = undone & (scores >= score_threshold)
        return (jnp.sum(active.astype(jnp.int32)) > 1) & (done_count < top_k)

    def body(state):
        scores, undone, done_count, kept = state
        masked = jnp.where(undone & (scores >= score_threshold),
                           scores, -jnp.inf)
        idx = jnp.argmax(masked)
        undone = undone.at[idx].set(False)
        kept = kept.at[idx].set(True)
        tt1 = jnp.maximum(start, start[idx])
        tt2 = jnp.minimum(end, end[idx])
        inter = jnp.maximum(tt2 - tt1, 0.0)
        width = jnp.maximum(end[idx] - start[idx], 1e-5)
        iou = inter / (width + (end - start) - inter)
        decay = jnp.exp(-iou ** 2 / sigma)
        scores = jnp.where(undone, scores * decay, scores)
        undone = undone & (scores >= score_threshold)
        return scores, undone, done_count + 1, kept

    undone0 = valid & (scores0 >= score_threshold)
    kept0 = jnp.zeros((n,), bool)
    scores, _, count, kept = jax.lax.while_loop(
        cond, body, (scores0, undone0, jnp.asarray(0, jnp.int32), kept0))
    out = segments.at[:, 2].set(scores)
    out = jnp.concatenate([out, kept[:, None].astype(segments.dtype)], -1)
    return out, count
