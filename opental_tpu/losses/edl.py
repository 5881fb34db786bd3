"""Evidential Deep Learning classification losses.

Functional re-design of the reference EvidenceLoss
(AFSD/thumos14/cls_loss.py:81-285). Differences forced by jit:

* all variants operate on fixed-shape (N, K) logits with a boolean
  `valid` mask instead of dynamically gathered rows;
* the stateful GHM / MIB bin accumulators (reference mutable buffers
  acc_sum / weight_accum, cls_loss.py:106,114) are explicit state arrays
  threaded through the call — `(loss, new_state) = fn(..., state)` — so
  the whole train step stays pure and jittable;
* the epoch gates (ibm_start / ghm_start) take the epoch as a traced
  scalar and select via jnp.where, keeping one compiled graph for all
  epochs.

Reference-bug note: the reference's iou_calib pairs batch-major logits
with prior-major ious (multisegment_loss.py:118,236 builds iou_pred as
(num_priors, B) then .view(-1) against prop_conf_data.view(-1, K)); with
the shipped batch_size=1 the orderings coincide. We use consistent
batch-major ordering, identical for B=1 and correct for B>1.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
EPS = 1e-10


class EDLConfig(NamedTuple):
    """Static EDL loss configuration (training.edl_config in YAML)."""
    num_classes: int
    loss_type: str = 'log'           # 'log' | 'digamma' | 'mse'
    evidence: str = 'exp'
    with_focal: bool = False
    alpha: float = 0.25
    gamma: float = 2.0
    soft_label: float = 0.0
    iou_aware: bool = False
    with_ghm: bool = False
    with_ibloss: bool = False
    with_ibm: bool = False
    # ANet's older exp-form MIB: w = 1/(|logit|_1 * exp(coeff*g) + eps),
    # stateless (anet/cls_loss.py:225-231); False = THUMOS binned-EMA MIB
    ibm_exp: bool = False
    ibm_coeff: float = 10.0
    num_bins: int = 50
    momentum: float = 0.99
    ghm_start: int = 0
    ib_start: int = 10
    ibm_start: int = 0
    size_average: bool = False


class EDLState(NamedTuple):
    """Cross-step EMA accumulators (MIB weight_accum / GHM acc_sum)."""
    weight_accum: Array  # (num_bins,) MIB momentum-binned weights
    acc_sum: Array       # (num_bins,) GHM momentum bin counts

    @staticmethod
    def create(cfg: 'EDLConfig') -> 'EDLState':
        return EDLState(weight_accum=jnp.ones((cfg.num_bins,), jnp.float32),
                        acc_sum=jnp.zeros((cfg.num_bins,), jnp.float32))


def evidence_func(logit: Array, evidence: str) -> Array:
    if evidence == 'relu':
        return jax.nn.relu(logit)
    if evidence == 'exp':
        return jnp.exp(jnp.clip(logit, -10.0, 10.0))
    if evidence == 'softplus':
        return jax.nn.softplus(logit)
    raise ValueError(evidence)


def _one_hot_soft(target: Array, num_classes: int, soft_label: float
                  ) -> Array:
    y = jax.nn.one_hot(target, num_classes, dtype=jnp.float32)
    if soft_label > 0:
        y = jnp.where(y == 1.0, 1.0 - soft_label,
                      soft_label / (num_classes - 1))
    return y


def _edl_base(y: Array, alpha: Array, loss_type: str) -> Array:
    """Per-element y * (f(S) - f(alpha)), f = log or digamma. (N, K)."""
    s = jnp.sum(alpha, axis=1, keepdims=True)
    f = jnp.log if loss_type == 'log' else jax.lax.digamma
    return y * (f(s) - f(alpha))


def _grad_norm_terms(y: Array, alpha: Array, num_classes: int
                     ) -> Tuple[Array, Array]:
    """Detached |y * (1/alpha - u)| terms used by GHM/IB/MIB weighting
    (cls_loss.py:229-263)."""
    alpha = jax.lax.stop_gradient(alpha)
    u = num_classes / jnp.sum(alpha, axis=-1, keepdims=True)
    per_elem = jnp.abs(1.0 / alpha - u) * y          # (N, K)
    per_row = jnp.sum(per_elem, axis=1)              # (N,)
    return per_elem, per_row


def _masked_bin_mean_ema(values: Array, bins: Array, valid: Array,
                         accum: Array, momentum: float, num_bins: int
                         ) -> Array:
    """EMA-update accum[b] toward mean(values | bins == b), only for bins
    with members, matching the reference python loop (cls_loss.py:264-267).
    `bins` holds indices into accum; invalid rows are routed to a dropped
    extra slot."""
    bins = jnp.where(valid, bins, num_bins)
    sums = jnp.zeros((num_bins + 1,), jnp.float32).at[bins].add(
        jnp.where(valid, values, 0.0))
    counts = jnp.zeros((num_bins + 1,), jnp.float32).at[bins].add(
        valid.astype(jnp.float32))
    means = sums[:num_bins] / jnp.maximum(counts[:num_bins], 1.0)
    has = counts[:num_bins] > 0
    return jnp.where(has, momentum * accum + (1 - momentum) * means, accum)


def evidence_loss(cfg: EDLConfig, logits: Array, target: Array,
                  valid: Array, state: EDLState, epoch: Array
                  ) -> Tuple[Array, EDLState]:
    """EDL classification loss over masked rows.

    logits: (N, K); target: (N,) int labels; valid: (N,) bool —
    invalid rows contribute zero loss and are excluded from bin stats.
    Returns (scalar loss [sum or mean over valid rows], new state).
    """
    k = cfg.num_classes
    y = _one_hot_soft(target, k, cfg.soft_label)
    alpha = evidence_func(logits, cfg.evidence) + 1.0
    validf = valid.astype(jnp.float32)

    if cfg.loss_type == 'mse':
        s = jnp.sum(alpha, axis=1, keepdims=True)
        err = jnp.sum((y - alpha / s) ** 2, axis=1)
        var = jnp.sum(alpha * (s - alpha) / (s * s * (s + 1.0)), axis=1)
        per_row = err + var
        loss = _reduce(per_row, validf, cfg.size_average)
        return loss, state

    base = _edl_base(y, alpha, cfg.loss_type)        # (N, K)
    new_state = state

    if cfg.with_focal:
        alpha_vec = jnp.full((k,), 1.0 - cfg.alpha).at[0].set(cfg.alpha)
        s = jnp.sum(alpha, axis=1, keepdims=True)
        pred_scores = jnp.max(alpha / s, axis=1)
        w = alpha_vec[target] * (1.0 - pred_scores) ** cfg.gamma
        per_row = jnp.sum(w[:, None] * base, axis=1)
    elif cfg.with_ghm:
        per_elem, _ = _grad_norm_terms(y, alpha, k)
        edges = jnp.arange(cfg.num_bins + 1, dtype=jnp.float32) / cfg.num_bins
        edges = edges.at[-1].add(1e-6)
        bin_idx = jnp.clip(
            jnp.searchsorted(edges, per_elem.reshape(-1), side='right') - 1,
            0, cfg.num_bins - 1)
        elem_valid = jnp.repeat(valid, k)
        counts = jnp.zeros((cfg.num_bins + 1,), jnp.float32).at[
            jnp.where(elem_valid, bin_idx, cfg.num_bins)].add(1.0)
        counts = counts[:cfg.num_bins]
        has = counts > 0
        if cfg.momentum > 0:
            acc = jnp.where(has,
                            cfg.momentum * state.acc_sum
                            + (1 - cfg.momentum) * counts, state.acc_sum)
        else:
            acc = counts
        denom = jnp.where(has, jnp.where(cfg.momentum > 0, acc, counts), 1.0)
        w_bins = jnp.where(has, 1.0 / denom, 0.0)
        n_valid_bins = jnp.maximum(jnp.sum(has.astype(jnp.float32)), 1.0)
        weights = (w_bins[bin_idx] / n_valid_bins).reshape(per_elem.shape)
        per_row_w = jnp.sum(weights * base, axis=1)
        per_row_plain = jnp.sum(base, axis=1)
        active = epoch >= cfg.ghm_start
        per_row = jnp.where(active, per_row_w, per_row_plain)
        if cfg.momentum > 0:
            new_state = new_state._replace(
                acc_sum=jnp.where(active, acc, state.acc_sum))
    elif cfg.with_ibloss:
        _, grad_norm = _grad_norm_terms(y, alpha, k)
        feat_norm = jax.lax.stop_gradient(
            jnp.sum(jnp.abs(logits), axis=1))
        w = 1.0 / jnp.maximum(grad_norm * feat_norm, EPS)
        per_row_w = w * jnp.sum(base, axis=1)
        per_row = jnp.where(epoch >= cfg.ib_start, per_row_w,
                            jnp.sum(base, axis=1))
    elif cfg.with_ibm and cfg.ibm_exp:
        # exp-form influence balancing (anet/cls_loss.py:225-231);
        # note: feat_norm is NOT detached there, matching the reference
        _, grad_norm = _grad_norm_terms(y, alpha, k)
        feat_norm = jnp.sum(jnp.abs(logits), axis=1)
        w = 1.0 / (feat_norm * jnp.exp(cfg.ibm_coeff * grad_norm) + EPS)
        per_row_w = w * jnp.sum(base, axis=1)
        per_row = jnp.where(epoch >= cfg.ibm_start, per_row_w,
                            jnp.sum(base, axis=1))
    elif cfg.with_ibm:
        # MIB (the OpenTAL-final variant, cls_loss.py:257-270):
        # momentum-binned importance weights over grad-norm bins
        _, grad_norm = _grad_norm_terms(y, alpha, k)
        feat_norm = jax.lax.stop_gradient(jnp.sum(jnp.abs(logits), axis=1))
        grad_hat = grad_norm * feat_norm
        bin_locs = jnp.ceil(grad_norm * cfg.num_bins).astype(jnp.int32)
        # reference indexes weight_accum[bin_locs - 1]; bin 0 wraps to the
        # last slot exactly like torch negative indexing
        idx = (bin_locs - 1) % cfg.num_bins
        accum = _masked_bin_mean_ema(grad_hat, idx, valid,
                                     state.weight_accum, cfg.momentum,
                                     cfg.num_bins)
        active = epoch >= cfg.ibm_start
        accum = jnp.where(active, accum, state.weight_accum)
        weights = accum[idx]
        per_row = jnp.where(active, weights * jnp.sum(base, axis=1),
                            jnp.sum(base, axis=1))
        new_state = new_state._replace(weight_accum=accum)
    else:
        per_row = jnp.sum(base, axis=1)

    loss = _reduce(per_row, validf, cfg.size_average)
    return loss, new_state


def _reduce(per_row: Array, validf: Array, size_average: bool) -> Array:
    total = jnp.sum(per_row * validf)
    if size_average:
        return total / jnp.maximum(jnp.sum(validf), 1.0)
    return total


def iou_calibration(cfg: EDLConfig, logits: Array, ious: Array,
                    mean: bool = True) -> Array:
    """IoU-aware uncertainty calibration (cls_loss.py:120-129):
    -iou*log(1-u) - (1-iou)*log(u), over ALL refined logits."""
    ious = jnp.where(ious < 0, 1e-3, ious)
    alpha = evidence_func(logits, cfg.evidence) + 1.0
    u = cfg.num_classes / jnp.sum(alpha, axis=-1)
    # u is strictly inside (0, 1): alpha > 1 elementwise bounds both logs
    reg = -ious * jnp.log(1.0 - u) - (1.0 - ious) * jnp.log(u)
    return jnp.mean(reg) if mean else jnp.sum(reg)
