"""Vectorized GT matching + multi-part detection loss.

Re-design of the reference MultiSegmentLoss
(AFSD/thumos14/multisegment_loss.py:70-259). The reference loops over the
batch in python under no_grad and gathers dynamic positive subsets; here
matching is a vmapped fixed-shape (B, P, N_max) computation over padded
GT tensors, and every "gather positives" becomes a masked sum — exact
normalization parity (N = max(#pos, 1)) is preserved.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from opental_tpu.losses.cls import actionness_loss, focal_loss, rpl_loss
from opental_tpu.losses.edl import (EDLConfig, EDLState, evidence_loss,
                                    iou_calibration)

Array = jax.Array
F32_EPS = float(jnp.finfo(jnp.float32).eps)


class LossConfig(NamedTuple):
    """Static configuration of the detection loss."""
    num_classes: int              # head classes (K, background-free if os)
    clip_length: int = 256
    piou: float = 0.5             # refined-stage IoU threshold
    cls_type: str = 'edl'         # 'focal' | 'edl' | 'rpl'
    edl: Optional[EDLConfig] = None
    os_head: bool = False
    act_margin: float = 1.0
    act_weight: float = 0.1       # rank-loss weight inside actionness
    rpl_weight_pl: float = 0.1
    rpl_temperature: float = 1.0
    rpl_gcpl: bool = False
    focal_alpha: float = 0.25
    size_average: bool = False
    variant: str = 'thumos'       # 'thumos' | 'anet' matching/normalization


def segment_iou_1d(pred: Array, target: Array) -> Array:
    """IoU of (left_dist, right_dist) offset pairs
    (multisegment_loss.py:24-36). pred/target: (..., 2) -> (...)."""
    inter = (jnp.minimum(pred[..., 0], target[..., 0])
             + jnp.minimum(pred[..., 1], target[..., 1]))
    union = (pred[..., 0] + pred[..., 1]
             + target[..., 0] + target[..., 1] - inter)
    return inter / jnp.maximum(union, F32_EPS)


def giou_loss_1d(pred: Array, target: Array) -> Array:
    """1 - GIoU over offset pairs (multisegment_loss.py:38-43)."""
    ious = segment_iou_1d(pred, target)
    enclose = (jnp.maximum(pred[..., 0], target[..., 0])
               + jnp.maximum(pred[..., 1], target[..., 1]))
    union = (pred[..., 0] + pred[..., 1]
             + target[..., 0] + target[..., 1]
             - jnp.minimum(pred[..., 0], target[..., 0])
             - jnp.minimum(pred[..., 1], target[..., 1]))
    gious = ious - (enclose - union) / jnp.maximum(enclose, F32_EPS)
    return 1.0 - gious


class MatchResult(NamedTuple):
    loc_t: Array        # (B, P, 2) GT offsets
    conf_t: Array       # (B, P) int coarse labels (0 = background)
    prop_loc_t: Array   # (B, P, 2) refined regression targets
    prop_conf_t: Array  # (B, P) int refined labels
    iou: Array          # (B, P) coarse-decode IoU vs GT


def match_targets(priors: Array, loc_data: Array, truths: Array,
                  labels: Array, gt_mask: Array, clip_length: int,
                  piou: float) -> MatchResult:
    """Min-enclosing-area prior<->GT matching, vmapped over the batch.

    priors: (P, 1) centers in [0,1]; loc_data: (B, P, 2) predicted offsets;
    truths: (B, N, 2) normalized segments (padded); labels: (B, N) int;
    gt_mask: (B, N) bool. Matches multisegment_loss.py:120-153: each prior
    takes the smallest GT whose span contains its center; background
    otherwise.
    """
    maxn = 2.0 * clip_length

    def one(pre_loc, tr, lb, msk):
        center = priors[:, 0]                              # (P,)
        left = (center[:, None] - tr[None, :, 0]) * clip_length
        right = (tr[None, :, 1] - center[:, None]) * clip_length
        area = left + right                                # (P, N)
        invalid = (left < 0) | (right < 0) | ~msk[None, :]
        area = jnp.where(invalid, maxn, area)
        best_area = jnp.min(area, axis=1)
        best_idx = jnp.argmin(area, axis=1)                # first min, as in
        loc_t = jnp.stack([(center - tr[best_idx, 0]) * clip_length,
                           (tr[best_idx, 1] - center) * clip_length], -1)
        conf = jnp.where(best_area >= maxn, 0,
                         lb[best_idx]).astype(jnp.int32)
        iou = segment_iou_1d(pre_loc, loc_t)               # (P,)
        prop_conf = jnp.where(iou < piou, 0, conf)
        prop_w = pre_loc[:, 0] + pre_loc[:, 1]
        prop_loc_t = (loc_t - pre_loc) / (0.5 * prop_w[:, None])
        return loc_t, conf, prop_loc_t, prop_conf, iou

    loc_t, conf_t, prop_loc_t, prop_conf_t, iou = jax.vmap(one)(
        jax.lax.stop_gradient(loc_data), truths, labels, gt_mask)
    return MatchResult(loc_t, conf_t, prop_loc_t, prop_conf_t, iou)


def _bce_with_logits(logits: Array, labels: Array) -> Array:
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def multisegment_loss(cfg: LossConfig, out: Dict[str, Any], truths: Array,
                      labels: Array, gt_mask: Array,
                      edl_state: Optional[EDLState] = None,
                      epoch: Array = jnp.asarray(0)
                      ) -> Tuple[Dict[str, Array], Optional[EDLState]]:
    """Full detection loss. Returns ({loss_l, loss_c, loss_prop_l,
    loss_prop_c, loss_ct, loss_act, loss_prop_act}, new_edl_state);
    each already normalized as in multisegment_loss.py:243-254."""
    loc = out['loc']                     # (B, P, 2)
    conf = out['conf']                   # (B, P, K)
    prop_loc = out['prop_loc']
    prop_conf = out['prop_conf']
    center = out['center'][..., 0]       # (B, P)
    priors = out['priors']               # (P, 1)
    b, p, k = conf.shape

    m = match_targets(priors, loc, truths, labels, gt_mask,
                      cfg.clip_length, cfg.piou)
    pos = m.conf_t > 0                               # (B, P)
    prop_pos = m.prop_conf_t > 0
    posf = pos.astype(jnp.float32)
    prop_posf = prop_pos.astype(jnp.float32)
    n_pos = jnp.maximum(jnp.sum(posf), 1.0)
    n_prop_pos = jnp.maximum(jnp.sum(prop_posf), 1.0)

    # coarse localization: GIoU over positives (:155-163)
    loss_l = jnp.sum(giou_loss_1d(loc, m.loc_t) * posf)

    # refined localization: L1 on normalized offsets over refined
    # positives (:165-173)
    l1 = jnp.sum(jnp.abs(prop_loc - m.prop_loc_t), axis=-1)
    loss_prop_l = jnp.sum(l1 * prop_posf)

    # centerness: BCE(center logit, IoU of the refined decode) over coarse
    # positives (:175-189). The reference does NOT detach the IoU target
    # (multisegment_loss.py:184-189): d(BCE)/d(target) = -logit flows
    # through the refined decode into loc_data, prop_loc_data and the
    # ScaleExp scales — a real train-time gradient path (verified by the
    # step-1 gradient comparison in tests/test_train_kstep_parity.py;
    # stop_gradient here zeroed prop_loc_head's largest gradient term).
    pre_w = (loc[..., 0] + loc[..., 1])[..., None]
    refined = 0.5 * pre_w * prop_loc + loc
    ious_raw = segment_iou_1d(refined, m.loc_t)
    # torch clamp_(min=0) passes gradient AT 0 (ge-mask); jnp.maximum
    # splits ties 0.5/0.5, and disjoint segments hit iou == 0 exactly
    ious_ct = jnp.where(ious_raw >= 0, ious_raw, 0.0)
    loss_ct = jnp.sum(_bce_with_logits(center, ious_ct) * posf)

    # classification (coarse + refined), pluggable (:191-232)
    def cls_term(logits_flat, targets_flat, valid, feats=None,
                 centers=None, prop_stage=False):
        if cfg.cls_type == 'focal':
            probs = jax.nn.softmax(logits_flat, axis=1)
            return focal_loss(probs, targets_flat, valid, k,
                              alpha=cfg.focal_alpha,
                              size_average=cfg.size_average), None
        if cfg.cls_type == 'edl':
            state_in = edl_state if not prop_stage else _state_holder[0]
            loss_val, new_state = evidence_loss(
                cfg.edl, logits_flat, targets_flat, valid, state_in, epoch)
            return loss_val, new_state
        if cfg.cls_type == 'rpl':
            return rpl_loss(logits_flat, targets_flat, valid, feats,
                            centers, out['rpl_radius'][0],
                            temperature=cfg.rpl_temperature,
                            weight_pl=cfg.rpl_weight_pl, gcpl=cfg.rpl_gcpl,
                            size_average=cfg.size_average,
                            reduction_mean=prop_stage), None
        raise ValueError(cfg.cls_type)

    def stage_labels(conf_t):
        flat = conf_t.reshape(-1)
        if cfg.os_head:
            # keep positives only, shift labels to start at 0 (:196-199)
            return jnp.maximum(flat - 1, 0), (flat > 0)
        return flat, jnp.ones_like(flat, dtype=bool)

    conf_flat = conf.reshape(-1, k)
    prop_conf_flat = prop_conf.reshape(-1, k)
    tgt_c, valid_c = stage_labels(m.conf_t)
    tgt_pc, valid_pc = stage_labels(m.prop_conf_t)

    feats = out.get('ctr_feat')
    prop_feats = out.get('prop_ctr_feat')
    cls_ctrs = out.get('cls_ctr')
    prop_cls_ctrs = out.get('prop_cls_ctr')
    if feats is not None:
        feats = feats.reshape(-1, feats.shape[-1])
    if prop_feats is not None:
        prop_feats = prop_feats.reshape(-1, prop_feats.shape[-1])

    _state_holder = [edl_state]
    loss_c, state_after_coarse = cls_term(conf_flat, tgt_c, valid_c,
                                          feats, cls_ctrs)
    _state_holder[0] = (state_after_coarse if state_after_coarse is not None
                        else edl_state)
    loss_prop_c, state_after_prop = cls_term(prop_conf_flat, tgt_pc,
                                             valid_pc, prop_feats,
                                             prop_cls_ctrs, prop_stage=True)
    new_state = (state_after_prop if state_after_prop is not None
                 else edl_state)

    losses = {
        'loss_l': loss_l / n_pos,
        'loss_c': loss_c / n_pos,
        'loss_prop_l': loss_prop_l / n_prop_pos,
        'loss_prop_c': loss_prop_c / n_prop_pos,
        'loss_ct': loss_ct / n_pos,
    }

    # IoU-aware uncertainty calibration on all refined logits (:234-250)
    if cfg.cls_type == 'edl' and cfg.edl is not None and cfg.edl.iou_aware:
        losses['loss_prop_c'] = losses['loss_prop_c'] + iou_calibration(
            cfg.edl, prop_conf_flat, m.iou.reshape(-1), mean=True)

    # PU actionness (:210-213, 238-241)
    if cfg.os_head:
        act = out['act'][..., 0].reshape(-1)
        prop_act = out['prop_act'][..., 0].reshape(-1)
        all_valid = jnp.ones_like(act, dtype=bool)
        la, an = actionness_loss(act, (m.conf_t.reshape(-1) > 0
                                       ).astype(jnp.float32), all_valid,
                                 margin=cfg.act_margin,
                                 rank_weight=cfg.act_weight,
                                 size_average=cfg.size_average)
        lpa, pan = actionness_loss(prop_act,
                                   (m.prop_conf_t.reshape(-1) > 0
                                    ).astype(jnp.float32), all_valid,
                                   margin=cfg.act_margin,
                                   rank_weight=cfg.act_weight,
                                   size_average=cfg.size_average)
        losses['loss_act'] = la / jnp.maximum(an, 1.0)
        losses['loss_prop_act'] = lpa / jnp.maximum(pan, 1.0)
    else:
        losses['loss_act'] = jnp.asarray(0.0)
        losses['loss_prop_act'] = jnp.asarray(0.0)

    return losses, new_state
