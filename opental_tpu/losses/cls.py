"""Focal / actionness-PU / RPL classification losses (masked, jittable).

Functional rewrites of FocalLoss_Ori, ActionnessLoss and RPLoss
(AFSD/thumos14/cls_loss.py:6-78, 288-339, 342-378). All dynamic
gather/sort selections become fixed-shape masked computations.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
FOCAL_EPS = 1e-6


def focal_loss(probs: Array, target: Array, valid: Array,
               num_classes: int, alpha: float = 0.25, gamma: float = 2.0,
               balance_index: int = 0, size_average: bool = False) -> Array:
    """Alpha-balanced focal loss over softmax scores
    (cls_loss.py:44-78; alpha on the background index).

    probs: (N, K) softmax probabilities; target: (N,); valid: (N,) bool.
    """
    alpha_vec = jnp.full((num_classes,), 1.0 - alpha
                         ).at[balance_index].set(alpha)
    pt = jnp.take_along_axis(probs, target[:, None], axis=1)[:, 0] + FOCAL_EPS
    logpt = alpha_vec[target] * jnp.log(pt)
    per_row = -((1.0 - pt) ** gamma) * logpt
    validf = valid.astype(per_row.dtype)
    total = jnp.sum(per_row * validf)
    if size_average:
        return total / jnp.maximum(jnp.sum(validf), 1.0)
    return total


def _bce_with_logits(logits: Array, labels: Array) -> Array:
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def actionness_loss(logits: Array, labels: Array, valid: Array,
                    margin: float = 1.0, rank_weight: float = 0.1,
                    size_average: bool = False) -> Tuple[Array, Array]:
    """Positive-unlabeled actionness loss (cls_loss.py:299-339).

    Keeps the top-M lowest-score negatives (M = min(P, N) - 1) as clean
    negatives for BCE, plus a margin rank loss against the noisiest
    negative. Fixed-shape rewrite: the reference's sort-and-slice becomes
    a rank mask over ascending negative scores.

    logits/labels/valid: (N,). Returns (loss_total, normalizer_count).
    """
    validf = valid.astype(jnp.float32)
    pos = (labels > 0) & valid
    neg = (labels == 0) & valid
    posf, negf = pos.astype(jnp.float32), neg.astype(jnp.float32)
    num_pos = jnp.sum(posf)
    num_neg = jnp.sum(negf)
    top_m = jnp.minimum(num_pos, num_neg) - 1.0

    # ascending rank of each negative among negatives (non-negatives last)
    neg_scores = jnp.where(neg, logits, jnp.inf)
    order = jnp.argsort(neg_scores)            # indices sorted ascending
    ranks = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    clean_neg = neg & (ranks < top_m)

    use_topm = top_m > 0
    keep = jnp.where(use_topm, (pos | clean_neg).astype(jnp.float32),
                     posf + negf)
    bce = _bce_with_logits(logits, (labels > 0).astype(jnp.float32))
    if size_average:
        loss_bce = jnp.sum(bce * keep) / jnp.maximum(jnp.sum(keep), 1.0)
    else:
        loss_bce = jnp.sum(bce * keep)

    # rank loss: relu(margin - max(all neg) + max(pos).detach())
    # (cls_loss.py:332-336). Finite sentinels instead of -inf: the unused
    # branch of jnp.where would otherwise poison gradients with NaN.
    neg_noisy = jnp.max(jnp.where(neg, logits, -1e9))
    pos_clean = jax.lax.stop_gradient(
        jnp.max(jnp.where(pos, logits, -1e9)))
    loss_rank = jnp.where(
        use_topm, jnp.maximum(0.0, margin - neg_noisy + pos_clean), 0.0)

    count = jnp.where(use_topm, num_pos + top_m, num_pos + num_neg)
    return loss_bce + rank_weight * loss_rank, count


def _masked_cross_entropy(logits: Array, labels: Array, valid: Array,
                          mean: bool) -> Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    validf = valid.astype(nll.dtype)
    total = jnp.sum(nll * validf)
    if mean:
        return total / jnp.maximum(jnp.sum(validf), 1.0)
    return total


def rpl_loss(dist: Array, target: Array, valid: Array, feats: Array,
             centers: Array, radius: Array, temperature: float = 1.0,
             weight_pl: float = 0.1, gcpl: bool = False,
             size_average: bool = False, reduction_mean: bool = False
             ) -> Array:
    """Reciprocal-point / GCPL loss (cls_loss.py:355-378).

    dist: (N, K) distances from RPLHead; feats: (N, D); centers: (K, D);
    radius: scalar learnable parameter (threaded from train state).
    """
    mean = size_average or reduction_mean
    center_batch = centers[target]                       # (N, D)
    validf = valid.astype(jnp.float32)
    if gcpl:
        loss = _masked_cross_entropy(-dist / temperature, target, valid,
                                     mean)
        sq = jnp.sum((feats - center_batch) ** 2, axis=1) / feats.shape[1]
        # reference uses default-mean F.mse_loss over all elements / 2
        loss_r = jnp.sum(sq * validf) / jnp.maximum(jnp.sum(validf),
                                                    1.0) / 2.0
        return loss + weight_pl * loss_r
    loss = _masked_cross_entropy(dist / temperature, target, valid, mean)
    dis = jnp.mean((feats - center_batch) ** 2, axis=1)  # (N,)
    se = (dis - radius) ** 2
    if mean:
        loss_r = jnp.sum(se * validf) / jnp.maximum(jnp.sum(validf), 1.0)
    else:
        loss_r = jnp.sum(se * validf)
    return loss + weight_pl * loss_r
