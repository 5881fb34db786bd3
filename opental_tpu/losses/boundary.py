"""Frame-level boundary BCE + SSL triplet losses.

Reference: AFSD/thumos14/train.py:152-201 (boundary start/end BCE at frame
and proposal levels) and :177-184 (triplet margin loss over the three SSL
feature scales).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _bce_prob(x: Array, y: Array) -> Array:
    """torch F.binary_cross_entropy semantics: direct logs, clamped at
    -100 (inputs here are tanh means, overwhelmingly in (0, 1))."""
    logx = jnp.maximum(jnp.log(x), -100.0)
    log1mx = jnp.maximum(jnp.log(1.0 - x), -100.0)
    return -(y * logx + (1.0 - y) * log1mx)


def boundary_bce(feat: Array, target: Array) -> Array:
    """mean BCE(tanh(feat).mean(channels), target) (train.py:152-161).

    feat: (B, T, C); target: (B, T) in {0,1}.
    """
    score = jnp.mean(jnp.tanh(feat), axis=-1)
    return jnp.mean(_bce_prob(score, target))


def boundary_losses(out: dict, scores: Array, start_row: int = 0,
                    end_row: int = 1, downscale: int = 4
                    ) -> Tuple[Array, Array]:
    """Combined frame + proposal-level start/end losses
    (train.py:187-200; ANet variant anet/train.py:134-187 uses score
    rows 1/2 of its (action, start, end) heatmaps and a stride-8
    subsample). scores: (B, R, T) GT heatmaps; the proposal-level
    targets are the stride-`downscale` subsample (the reference's
    nearest F.interpolate)."""
    loss_start = boundary_bce(out['start'], scores[:, start_row])
    loss_end = boundary_bce(out['end'], scores[:, end_row])
    scores_q = scores[:, :, ::downscale]
    loss_start = loss_start + 0.1 * (
        boundary_bce(out['start_loc_prop'], scores_q[:, start_row])
        + boundary_bce(out['start_conf_prop'], scores_q[:, start_row]))
    loss_end = loss_end + 0.1 * (
        boundary_bce(out['end_loc_prop'], scores_q[:, end_row])
        + boundary_bce(out['end_conf_prop'], scores_q[:, end_row]))
    return loss_start, loss_end


def triplet_margin_loss(anchor: Array, positive: Array, negative: Array,
                        margin: float = 1.0, eps: float = 1e-6) -> Array:
    """torch nn.TripletMarginLoss (p=2, mean reduction) parity."""
    def dist(a, b):
        return jnp.sqrt(jnp.sum((a - b + eps) ** 2, axis=-1))
    return jnp.mean(jnp.maximum(
        dist(anchor, positive) - dist(anchor, negative) + margin, 0.0))


def ssl_triplet_loss(anchors: Sequence[Array], positives: Sequence[Array],
                     negatives: Sequence[Array],
                     weights: Sequence[float] = (1.0, 0.1, 0.1)) -> Array:
    """Weighted sum over the three feature scales (train.py:177-184)."""
    total = 0.0
    for a, p, n, w in zip(anchors, positives, negatives, weights):
        total = total + w * triplet_margin_loss(a, p, n)
    return total
