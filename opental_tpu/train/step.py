"""Jitted training step: forward + full loss + Adam update.

Replaces the reference train loop body
(AFSD/thumos14/train.py:164-252) with a single pure function suitable for
jit/pjit over a data mesh axis. The SSL pass is computed unconditionally
and gated by a per-sample flag multiply (one static graph instead of the
reference's python-level branch, train.py:237-241).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from opental_tpu.losses.boundary import boundary_losses, triplet_margin_loss
from opental_tpu.losses.edl import EDLState
from opental_tpu.losses.multisegment import LossConfig, multisegment_loss

Array = jax.Array


class LossWeights(NamedTuple):
    """Scalar loss weights (reference argparse defaults,
    AFSD/common/config.py:23-28)."""
    lw: float = 1.0       # localization
    cw: float = 10.0      # classification
    ctw: float = 1.0      # centerness
    actw: float = 1.0     # actionness
    ssl: float = 0.1      # triplet


def device_ingest(batch: Dict[str, Array]) -> Dict[str, Array]:
    """Normalize raw uint8 clips on device: uint8 [0,255] -> f32 [-1,1].

    Same op order as the host transforms.normalize_clip
    (thumos_dataset.py:263). Eager execution is bit-identical to the
    host pipeline; under jit, XLA lowers the constant division to a
    reciprocal multiply, which rounds up to 1 ulp differently
    (measured, tests/test_uint8_ingest.py). dtype is a static trace
    property, so f32 batches pass through with a no-op graph. Ships 4x
    less host->device data per step when the dataset runs with
    uint8_ingest=True.

    ANet uint8 batches additionally carry per-frame `pad_masks` /
    `ssl_pad_masks` (B, T) companions marking frames the host f32
    pipeline fills with 127.5 (anet_dataset.py:231-234); 127.5
    normalizes to exactly 0.0, so where(pad, 0.0, x) reproduces the
    reference padding bit-for-bit. Mask keys are consumed here and never
    reach the loss."""
    out = dict(batch)
    for k, mk in (('clips', 'pad_masks'), ('ssl_clips', 'ssl_pad_masks')):
        if k in out and out[k].dtype == jnp.uint8:
            x = (out[k].astype(jnp.float32) / 255.0) * 2.0 - 1.0
            if mk in out:
                pad = out[mk].astype(bool)[:, :, None, None, None]
                x = jnp.where(pad, 0.0, x)
            out[k] = x
        out.pop(mk, None)
    return out


class TrainState(struct.PyTreeNode):
    params: Any
    constants: Any = struct.field(pytree_node=True)
    opt_state: Any = struct.field(pytree_node=True)
    edl_state: Optional[EDLState] = None
    step: Array = struct.field(default_factory=lambda: jnp.zeros((), jnp.int32))


def make_optimizer(learning_rate: float, weight_decay: float
                   ) -> optax.GradientTransformation:
    """torch Adam(+weight_decay) parity: wd added to the gradient BEFORE
    the Adam moments (NOT AdamW), betas (0.9, 0.999), eps 1e-8
    (thumos14/train.py:321-323)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-learning_rate),
    )


def make_anet_optimizer(learning_rate: float, weight_decay: float,
                        backbone_scale: float = 0.1
                        ) -> optax.GradientTransformation:
    """ANet variant: backbone params train at lr * 0.1
    (AFSD/anet/train.py:304-311)."""
    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: 'backbone' if any(
                getattr(p, 'key', None) == 'backbone' for p in path)
            else 'head', params)
    return optax.multi_transform(
        {'head': make_optimizer(learning_rate, weight_decay),
         'backbone': make_optimizer(learning_rate * backbone_scale,
                                    weight_decay)},
        label_fn)


def compute_losses(model, loss_cfg: LossConfig, weights: LossWeights,
                   params, constants, batch: Dict[str, Array],
                   edl_state: Optional[EDLState], epoch: Array,
                   dropout_rng: Optional[Array] = None,
                   train_bn: bool = False,
                   fuse_ssl: Optional[bool] = None
                   ) -> Tuple[Array, Dict[str, Array], Optional[EDLState],
                              Any]:
    """Full training objective (train.py:222-241). batch keys:
    clips (B,T,H,W,C), truths (B,N,2), labels (B,N), gt_mask (B,N),
    scores (B,2,T), ssl_clips, ssl_props (B,3,2), ssl_flags (B,).

    train_bn=True (freeze_bn: false) applies with mutable 'constants' so
    BN running stats EMA-update; the updated constants are returned
    (torch updates them on every forward incl. the SSL pass)."""
    variables = {'params': params, 'constants': constants}
    rngs = {'dropout': dropout_rng} if dropout_rng is not None else None
    # Fused main+SSL backbone pass (ONE conv batch of 2B) whenever BN is
    # frozen — exact same math as two sequential passes, and per-conv
    # MXU efficiency rises steeply with batch at train sizes
    # (BASELINE.md round-3). train_bn needs separate passes: torch
    # train-mode BN draws batch statistics per forward.
    # default OFF: measured on v5e (BASELINE.md round-3) the fusion is
    # throughput-neutral at bs=8 (42.3 vs 43.5 clips/s, within tunnel
    # variance) and worse at bs=10 — XLA already schedules the two
    # sequential passes efficiently. Kept as an equivalence-tested
    # switch for hardware where conv batch scaling pays.
    fuse_ssl = (bool(fuse_ssl) and not train_bn and weights.ssl > 0
                and 'ssl_clips' in batch)
    fused_trip = None
    if fuse_ssl:
        out, fused_trip = model.apply(
            variables, batch['clips'], batch['ssl_clips'],
            batch['ssl_props'], method='train_forward', rngs=rngs)
    elif train_bn:
        out, mut = model.apply(variables, batch['clips'], rngs=rngs,
                               mutable=['constants'])
        constants = mut['constants']
        variables = {'params': params, 'constants': constants}
    else:
        out = model.apply(variables, batch['clips'], rngs=rngs)

    if loss_cfg.variant == 'anet':
        from opental_tpu.losses.anet_multisegment import (
            anet_multisegment_loss)
        losses, new_edl_state = anet_multisegment_loss(
            loss_cfg, out, batch['truths'], batch['labels'],
            batch['gt_mask'], edl_state=edl_state, epoch=epoch)
        # ANet heatmaps carry (action, start, end) rows; proposal-level
        # targets subsample at the stride-8 feature rate
        loss_start, loss_end = boundary_losses(out, batch['scores'],
                                               start_row=1, end_row=2,
                                               downscale=8)
    else:
        losses, new_edl_state = multisegment_loss(
            loss_cfg, out, batch['truths'], batch['labels'],
            batch['gt_mask'], edl_state=edl_state, epoch=epoch)
        loss_start, loss_end = boundary_losses(out, batch['scores'])

    cost = (weights.lw * losses['loss_l'] + weights.cw * losses['loss_c']
            + weights.lw * losses['loss_prop_l']
            + weights.cw * losses['loss_prop_c']
            + weights.ctw * losses['loss_ct'] + loss_start + loss_end)
    if loss_cfg.os_head:
        cost = cost + weights.actw * (losses['loss_act']
                                      + losses['loss_prop_act'])

    loss_trip = jnp.asarray(0.0)
    if weights.ssl > 0 and 'ssl_clips' in batch:
        if fused_trip is not None:
            anchors, positives, negatives = fused_trip
        elif train_bn:
            (anchors, positives, negatives), mut = model.apply(
                variables, batch['ssl_clips'], batch['ssl_props'],
                method='ssl_forward', rngs=rngs, mutable=['constants'])
            constants = mut['constants']
        else:
            anchors, positives, negatives = model.apply(
                variables, batch['ssl_clips'], batch['ssl_props'],
                method='ssl_forward', rngs=rngs)
        scale_w = (1.0, 0.1, 0.1)
        per_scale = [w * triplet_margin_loss(a, p, n)
                     for a, p, n, w in zip(anchors, positives, negatives,
                                           scale_w)]
        # gate by the augmentation-success flag (train.py:237);
        # with per-sample batching we weight by the flagged fraction
        flag = jnp.mean(batch['ssl_flags'].astype(jnp.float32))
        loss_trip = sum(per_scale) * flag
        cost = cost + weights.ssl * loss_trip

    metrics = dict(losses)
    metrics.update({'loss_start': loss_start, 'loss_end': loss_end,
                    'loss_trip': loss_trip, 'cost': cost})
    return cost, metrics, new_edl_state, constants


def make_train_step(model, loss_cfg: LossConfig, weights: LossWeights,
                    tx: optax.GradientTransformation,
                    fuse_ssl: Optional[bool] = None):
    """Returns train_step(state, batch, epoch, rng) -> (state, metrics).
    Pure; jit or pjit it over a data-sharded batch.

    fuse_ssl: True fuses the main+SSL backbone passes into one conv
    batch of 2B (exact math under frozen BN, equivalence-tested).
    Default off — measured throughput-neutral on v5e at bs=8
    (BASELINE.md round-3); the switch exists for hardware where conv
    batch scaling pays."""

    # freeze_bn: false -> BN normalizes by batch stats and its running
    # stats EMA-update through the step (torch train-mode BN)
    train_bn = (not getattr(model, 'freeze_bn', True)
                and not getattr(model, 'deterministic', True))

    def train_step(state: TrainState, batch: Dict[str, Array],
                   epoch: Array, rng: Optional[Array] = None
                   ) -> Tuple[TrainState, Dict[str, Array]]:
        batch = device_ingest(batch)

        def loss_fn(params):
            cost, metrics, new_edl, new_consts = compute_losses(
                model, loss_cfg, weights, params, state.constants, batch,
                state.edl_state, epoch, dropout_rng=rng,
                train_bn=train_bn, fuse_ssl=fuse_ssl)
            return cost, (metrics, new_edl, new_consts)

        (_, (metrics, new_edl, new_consts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        # data-parallel gradient reduction is inserted by pjit/XLA from
        # the sharding annotations; nothing manual here
        gnorm = optax.global_norm(grads)
        metrics['grad_norm'] = gnorm
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(params=new_params, opt_state=new_opt_state,
                             edl_state=new_edl,
                             constants=(new_consts if train_bn
                                        else state.constants),
                             step=state.step + 1), metrics

    return train_step
