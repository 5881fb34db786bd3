"""ANet multi-segment detection loss.

Re-design of AFSD/anet/multisegment_loss.py:86-301. Differences from the
THUMOS loss (losses/multisegment.py):
 * matching adds per-level regression-range constraints: a prior only
   matches a GT whose max boundary distance lies in (lb, rb] of its
   pyramid level (:151-166, bounds at :69)
 * adaptive refined threshold min(piou, max positive IoU) (:178-184)
 * smooth-L1 for the refined localization (:206)
 * losses normalized per sample, then averaged over the batch
   (:268-301); the EDL MIB state threads sequentially through the batch
   via lax.scan, matching the reference's per-sample cls_loss calls.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from opental_tpu.losses.cls import actionness_loss, focal_loss
from opental_tpu.losses.edl import (EDLState, evidence_loss,
                                    iou_calibration)
from opental_tpu.losses.multisegment import (LossConfig, _bce_with_logits,
                                             giou_loss_1d, segment_iou_1d)
from opental_tpu.models.anet_pyramid import LEVEL_BOUNDS

Array = jax.Array


def _prior_bounds(priors: Array) -> Tuple[Array, Array]:
    """Per-prior (lb, rb) from the level index in priors[:, 1]
    (anet/multisegment_loss.py:73-84)."""
    bounds = jnp.asarray(np.asarray(LEVEL_BOUNDS, np.float32))
    lvl = priors[:, 1].astype(jnp.int32)
    return bounds[lvl, 0], bounds[lvl, 1]


def _smooth_l1(pred: Array, target: Array) -> Array:
    d = jnp.abs(pred - target)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def anet_multisegment_loss(cfg: LossConfig, out: Dict[str, Any],
                           truths: Array, labels: Array, gt_mask: Array,
                           edl_state: Optional[EDLState] = None,
                           epoch: Array = jnp.asarray(0)
                           ) -> Tuple[Dict[str, Array],
                                      Optional[EDLState]]:
    """Batch loss via lax.scan of the per-sample computation."""
    loc = out['loc']
    conf = out['conf']
    prop_loc = out['prop_loc']
    prop_conf = out['prop_conf']
    center = out['center'][..., 0]
    priors = out['priors']                    # (P, 2)
    act = out['act'][..., 0] if cfg.os_head else None
    prop_act = out['prop_act'][..., 0] if cfg.os_head else None
    b, p, k = conf.shape
    L = cfg.clip_length
    lb, rb = _prior_bounds(priors)
    state0 = edl_state if edl_state is not None else EDLState(
        jnp.zeros(0), jnp.zeros(0))

    def per_sample(state, inputs):
        (loc_p, logit_p, prop_loc_p, prop_logit_p, center_p, act_p,
         prop_act_p, tr, lbl, msk) = inputs
        centers = priors[:, 0]
        left = (centers[:, None] - tr[None, :, 0]) * L
        right = (tr[None, :, 1] - centers[:, None]) * L
        max_dis = jnp.maximum(left, right)
        area = left + right
        maxn = 2.0 * L
        invalid = ((left < 0) | (right < 0) | ~msk[None, :]
                   | (max_dis <= lb[:, None]) | (max_dis > rb[:, None]))
        area = jnp.where(invalid, maxn, area)
        best_area = jnp.min(area, axis=1)
        best_idx = jnp.argmin(area, axis=1)
        loc_t = jnp.stack([(centers - tr[best_idx, 0]) * L,
                           (tr[best_idx, 1] - centers) * L], -1)
        conf_t = jnp.where(best_area >= maxn, 0,
                           lbl[best_idx]).astype(jnp.int32)
        loc_ng = jax.lax.stop_gradient(loc_p)
        iou = segment_iou_1d(loc_ng, loc_t)
        has_pos = jnp.any(conf_t > 0)
        max_iou = jnp.where(has_pos,
                            jnp.max(jnp.where(conf_t > 0, iou, -jnp.inf)),
                            2.0)
        thr = jnp.minimum(cfg.piou, max_iou)
        prop_conf_t = jnp.where(iou < thr, 0, conf_t)
        prop_w = loc_ng[:, 0] + loc_ng[:, 1]
        prop_loc_t = (loc_t - loc_ng) / (0.5 * prop_w[:, None])

        pos = conf_t > 0
        prop_pos = prop_conf_t > 0
        posf = pos.astype(jnp.float32)
        prop_posf = prop_pos.astype(jnp.float32)
        n = jnp.maximum(jnp.sum(posf), 1.0)
        pn = jnp.maximum(jnp.sum(prop_posf), 1.0)

        loss_l = jnp.sum(giou_loss_1d(loc_p, loc_t) * posf)
        loss_prop_l = jnp.sum(
            jnp.sum(_smooth_l1(prop_loc_p, prop_loc_t), -1) * prop_posf)

        # the reference does NOT detach the IoU target (anet
        # multisegment_loss.py:217-221): gradients flow through the
        # refined decode into loc/prop_loc — see the THUMOS twin
        # (losses/multisegment.py loss_ct) and the step-1 gradient
        # parity in tests/test_train_kstep_parity.py
        pre_w = (loc_p[:, 0] + loc_p[:, 1])[:, None]
        refined = 0.5 * pre_w * prop_loc_p + loc_p
        ious_raw = segment_iou_1d(refined, loc_t)
        # ge-mask, not jnp.maximum: torch clamp_(min=0) passes gradient
        # AT 0 and disjoint segments hit iou == 0 exactly
        ious_ct = jnp.where(ious_raw >= 0, ious_raw, 0.0)
        loss_ct = jnp.sum(_bce_with_logits(center_p, ious_ct) * posf)

        def cls_term(logits, tgt, state_in):
            if cfg.os_head:
                valid = tgt > 0
                t = jnp.maximum(tgt - 1, 0)
            else:
                valid = jnp.ones_like(tgt, dtype=bool)
                t = tgt
            if cfg.cls_type == 'focal':
                probs = jax.nn.softmax(logits, axis=1)
                return focal_loss(probs, t, valid, k,
                                  alpha=cfg.focal_alpha), state_in
            loss_val, new_state = evidence_loss(cfg.edl, logits, t, valid,
                                                state_in, epoch)
            return loss_val, new_state

        loss_c, state1 = cls_term(logit_p, conf_t, state)
        loss_prop_c, state2 = cls_term(prop_logit_p, prop_conf_t, state1)

        loss_l = loss_l / n
        loss_c = loss_c / n
        loss_prop_l = loss_prop_l / pn
        loss_prop_c = loss_prop_c / pn
        loss_ct = loss_ct / n
        if cfg.cls_type == 'edl' and cfg.edl is not None \
                and cfg.edl.iou_aware:
            loss_prop_c = loss_prop_c + iou_calibration(cfg.edl, prop_logit_p,
                                                        iou, mean=True)

        if cfg.os_head:
            all_valid = jnp.ones((p,), bool)
            la, an = actionness_loss(act_p, posf, all_valid,
                                     margin=cfg.act_margin,
                                     rank_weight=cfg.act_weight)
            lpa, pan = actionness_loss(prop_act_p, prop_posf, all_valid,
                                       margin=cfg.act_margin,
                                       rank_weight=cfg.act_weight)
            loss_act = la / jnp.maximum(an, 1.0)
            loss_prop_act = lpa / jnp.maximum(pan, 1.0)
        else:
            loss_act = jnp.asarray(0.0)
            loss_prop_act = jnp.asarray(0.0)

        losses = jnp.stack([loss_l, loss_c, loss_prop_l, loss_prop_c,
                            loss_ct, loss_act, loss_prop_act])
        return state2, losses

    dummy = jnp.zeros((b, p), jnp.float32)
    inputs = (loc, conf, prop_loc, prop_conf, center,
              act if act is not None else dummy,
              prop_act if prop_act is not None else dummy,
              truths, labels, gt_mask)
    final_state, per = jax.lax.scan(per_sample, state0, inputs)
    mean = jnp.mean(per, axis=0)
    names = ['loss_l', 'loss_c', 'loss_prop_l', 'loss_prop_c', 'loss_ct',
             'loss_act', 'loss_prop_act']
    losses = {nm: mean[i] for i, nm in enumerate(names)}
    return losses, (final_state if edl_state is not None else edl_state)
