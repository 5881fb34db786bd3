"""Coarse-to-fine temporal detection pyramid (THUMOS14 variant).

Re-design of the reference CoarsePyramid/ProposalBranch
(AFSD/thumos14/BDNet.py:64-432) in channels-last flax. Everything is
static-shaped: the 6 pyramid levels (feat_t = 64, 32, 16, 8, 4, 2 for
256-frame clips), priors, and per-level proposal counts are compile-time
constants, so the whole detection head jits into one XLA graph.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from opental_tpu.models.layers import (ConvGNReLU1D, GN_EPS, RPLHead,
                                       ScaleExp, TransformerHead, Unit1D,
                                       Unit3D, interpolate_nearest_1d)
from opental_tpu.ops.boundary_pool import boundary_max_pool_auto as boundary_max_pool

Array = jax.Array

LAYER_NUM = 6
CONV_CHANNELS = 512


def make_priors(frame_num: int, layer_num: int = LAYER_NUM) -> np.ndarray:
    """Per-level center priors (c + 0.5) / t, concatenated (P, 1).

    (thumos14/BDNet.py:286-293). 126 priors for 256-frame clips.
    """
    feat_t = frame_num // 4
    priors = []
    t = feat_t
    for _ in range(layer_num):
        priors.append((np.arange(t, dtype=np.float32) + 0.5) / t)
        t //= 2
    return np.concatenate(priors)[:, None]


def level_sizes(frame_num: int, layer_num: int = LAYER_NUM) -> List[int]:
    feat_t = frame_num // 4
    return [feat_t // (1 << i) for i in range(layer_num)]


def expand_boundary_segments(left: Array, right: Array,
                             plus_one: bool = False) -> Array:
    """Expanded (start, end) pooling windows from coarse boundaries.

    Given decoded window edges (left, right) each (..., 1), returns the
    4-tuple [l-out, l+in, r-in, r+out] with in = clamp(w/4, 1),
    out = clamp(w/10, 1) and banker's rounding, matching
    thumos14/BDNet.py:355-384 (plus_one adds the reference's +1 to the
    width for frame-level windows, :376).
    """
    plen = right - left + (1.0 if plus_one else 0.0)
    in_plen = jnp.maximum(plen / 4.0, 1.0)
    out_plen = jnp.maximum(plen / 10.0, 1.0)
    return jnp.concatenate([
        jnp.round(left - out_plen),
        jnp.round(left + in_plen),
        jnp.round(right - in_plen),
        jnp.round(right + out_plen),
    ], axis=-1)


class ProposalBranch(nn.Module):
    """Boundary-pooled proposal refinement branch
    (thumos14/BDNet.py:64-113). All convs are 1x1 -> MXU matmuls."""

    proposal_channels: int = 512
    dtype: Any = None

    @nn.compact
    def __call__(self, feature: Array, frame_level_feature: Array,
                 segments: Array, frame_segments: Array
                 ) -> Tuple[Array, Array]:
        pc = self.proposal_channels
        fm_short = ConvGNReLU1D(pc, kernel=1, dtype=self.dtype,
                                name='cur_point_conv')(feature)
        feature = ConvGNReLU1D(pc * 2, kernel=1, dtype=self.dtype,
                               name='lr_conv')(feature)
        prop_feature = boundary_max_pool(feature, segments)
        prop_roi_feature = boundary_max_pool(frame_level_feature,
                                             frame_segments)
        prop_roi_feature = ConvGNReLU1D(pc, kernel=1, dtype=self.dtype,
                                        name='roi_conv')(prop_roi_feature)
        prop_feature = jnp.concatenate(
            [prop_roi_feature, prop_feature, fm_short], axis=-1)
        prop_feature = ConvGNReLU1D(feature.shape[-1] // 2, kernel=1,
                                    dtype=self.dtype,
                                    name='proposal_conv')(prop_feature)
        return prop_feature, feature


class Tower(nn.Module):
    """Stack of k3 conv-GN-relu blocks (loc/conf towers,
    thumos14/BDNet.py:170-203)."""

    features: int = CONV_CHANNELS
    depth: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.depth):
            x = ConvGNReLU1D(self.features, kernel=3, dtype=self.dtype,
                             name=f'block_{i}')(x)
        return x


class CoarsePyramid(nn.Module):
    """6-level temporal FPN with coarse heads + proposal refinement.

    Inputs: {'Mixed_4f': (B, T/4, 6, 6, 832), 'Mixed_5c': (B, T/8, 3, 3,
    1024)}. Output dict mirrors the reference 16-tuple
    (thumos14/BDNet.py:420-432) with identical key names in BDNet.
    """

    num_classes: int
    frame_num: int = 256
    os_head: bool = False
    use_rpl: bool = False
    transformer: bool = False
    dropout: float = 0.0
    deterministic: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, feat_dict: Dict[str, Array], ssl: bool = False,
                 get_feat: bool = False) -> Dict[str, Any]:
        oc = CONV_CHANNELS
        x1 = feat_dict['Mixed_4f']           # (B, T/4, 6, 6, 832)
        x2 = feat_dict['Mixed_5c']           # (B, T/8, 3, 3, 1024)
        batch = x1.shape[0]

        def in_conv(x, kernel, name):
            # Unit3D(spatial_valid, bias, no BN, no act) -> GN -> relu,
            # then drop the 1x1 spatial dims (thumos14/BDNet.py:129-155)
            x = Unit3D(oc, kernel=(1,) + kernel, padding='spatial_valid',
                       use_bias=True, use_batch_norm=False, activation=None,
                       dtype=self.dtype, name=f'{name}_conv')(x)
            x = nn.GroupNorm(num_groups=32, epsilon=GN_EPS,
                             name=f'{name}_gn')(x)
            x = nn.relu(x)
            return x.squeeze(axis=(2, 3))    # (B, t, 512)

        # spatial-VALID kernels spanning the full spatial extent collapse
        # H x W to 1x1 (the reference hardcodes (6, 6) / (3, 3) for 96x96
        # crops, thumos14/BDNet.py:130-149; we derive them so any crop size
        # works)
        pyramid_feats: List[Array] = []
        lvl0 = in_conv(x1, (x1.shape[2], x1.shape[3]), 'pyramid_0')
        lvl1 = in_conv(x2, (x2.shape[2], x2.shape[3]), 'pyramid_1')
        lvl0 = lvl0 + interpolate_nearest_1d(lvl1, lvl0.shape[1])
        pyramid_feats = [lvl0, lvl1]
        x = lvl1
        for i in range(2, LAYER_NUM):
            x = ConvGNReLU1D(oc, kernel=3, stride=2, dtype=self.dtype,
                             name=f'pyramid_{i}')(x)
            pyramid_feats.append(x)

        # frame-level feature: upsample level0 to frame_num + 3-conv stack
        # (thumos14/BDNet.py:324-331)
        frame_level_feat = interpolate_nearest_1d(lvl0, self.frame_num)
        for i, k in enumerate((3, 3, 1)):
            frame_level_feat = ConvGNReLU1D(oc, kernel=k, dtype=self.dtype,
                                            name=f'deconv_{i}'
                                            )(frame_level_feat)
        trip = [frame_level_feat]
        half = oc // 2
        out: Dict[str, Any] = {
            'start': frame_level_feat[..., :half],   # (B, frame_num, 256)
            'end': frame_level_feat[..., half:],
        }

        loc_tower = Tower(oc, dtype=self.dtype, name='loc_tower')
        conf_tower = Tower(oc, dtype=self.dtype, name='conf_tower')
        loc_head = Unit1D(2, kernel=3, activation=None, dtype=self.dtype,
                          name='loc_head')
        if self.transformer:
            conf_head = TransformerHead(self.num_classes,
                                        deterministic=self.deterministic,
                                        name='conf_head')
        elif self.use_rpl:
            conf_head = RPLHead(self.num_classes, name='conf_head')
        else:
            conf_head = Unit1D(self.num_classes, kernel=3, activation=None,
                               dtype=self.dtype, name='conf_head')
        if self.os_head:
            act_head = Unit1D(1, kernel=3, activation=None,
                              dtype=self.dtype, name='actionness_head')
            prop_act_head = Unit1D(1, kernel=1, activation=None,
                                   dtype=self.dtype,
                                   name='prop_actionness_head')
        loc_prop_branch = ProposalBranch(512, dtype=self.dtype,
                                         name='loc_proposal_branch')
        conf_prop_branch = ProposalBranch(512, dtype=self.dtype,
                                          name='conf_proposal_branch')
        prop_loc_head = Unit1D(2, kernel=1, activation=None,
                               dtype=self.dtype, name='prop_loc_head')
        if self.use_rpl:
            prop_conf_head = RPLHead(self.num_classes, name='prop_conf_head')
        else:
            prop_conf_head = Unit1D(self.num_classes, kernel=1,
                                    activation=None, dtype=self.dtype,
                                    name='prop_conf_head')
        center_head = Unit1D(1, kernel=3, activation=None, dtype=self.dtype,
                             name='center_head')
        dropout_layer = (nn.Dropout(self.dropout)
                         if self.dropout > 0 else None)

        locs, confs, acts, centers = [], [], [], []
        prop_locs, prop_confs, prop_acts = [], [], []
        ctr_feats, prop_ctr_feats = [], []
        feat_t = self.frame_num // 4

        for i, feat in enumerate(pyramid_feats):
            t = feat.shape[1]
            loc_feat = loc_tower(feat)
            conf_feat = conf_tower(feat)

            loc_out = ScaleExp(name=f'loc_scale_{i}')(loc_head(loc_feat))
            locs.append(loc_out)                          # (B, t, 2)
            head_input = conf_feat
            if dropout_layer is not None:
                head_input = dropout_layer(
                    head_input, deterministic=self.deterministic)
            if self.use_rpl or get_feat:
                ctr_feats.append(head_input)
            confs.append(conf_head(head_input))           # (B, t, K)
            if self.os_head:
                acts.append(act_head(conf_feat))          # (B, t, 1)

            # expanded pooling windows from the coarse localization, no-grad
            # (thumos14/BDNet.py:354-384)
            loc_ng = jax.lax.stop_gradient(loc_out)
            prior_center = ((jnp.arange(t, dtype=jnp.float32) + 0.5) / t
                            )[None, :, None]              # (1, t, 1)
            seg_scaled = loc_ng / self.frame_num * t
            new_priors = jnp.round(prior_center * t - 0.5)
            segments = expand_boundary_segments(
                new_priors - seg_scaled[..., :1],
                new_priors + seg_scaled[..., 1:])
            decoded = jnp.concatenate(
                [prior_center * self.frame_num - loc_ng[..., :1],
                 prior_center * self.frame_num + loc_ng[..., 1:]], axis=-1)
            frame_segments = expand_boundary_segments(
                decoded[..., :1], decoded[..., 1:], plus_one=True)

            loc_prop_feat, loc_prop_feat_ = loc_prop_branch(
                loc_feat, frame_level_feat, segments, frame_segments)
            conf_prop_feat, conf_prop_feat_ = conf_prop_branch(
                conf_feat, frame_level_feat, segments, frame_segments)
            if i == 0:
                trip.extend([loc_prop_feat_, conf_prop_feat_])
                ndim = loc_prop_feat_.shape[-1] // 2
                out['start_loc_prop'] = loc_prop_feat_[..., :ndim]
                out['end_loc_prop'] = loc_prop_feat_[..., ndim:]
                out['start_conf_prop'] = conf_prop_feat_[..., :ndim]
                out['end_conf_prop'] = conf_prop_feat_[..., ndim:]
                if ssl:
                    return {'trip': trip}
            prop_locs.append(prop_loc_head(loc_prop_feat))
            head_input = conf_prop_feat
            if dropout_layer is not None:
                head_input = dropout_layer(
                    head_input, deterministic=self.deterministic)
            if self.use_rpl or get_feat:
                prop_ctr_feats.append(head_input)
            prop_confs.append(prop_conf_head(head_input))
            if self.os_head:
                prop_acts.append(prop_act_head(conf_prop_feat))
            centers.append(center_head(loc_prop_feat))

        cat = lambda xs: jnp.concatenate(xs, axis=1)
        out.update({
            'loc': cat(locs),                 # (B, P, 2)
            'conf': cat(confs),               # (B, P, K)
            'prop_loc': cat(prop_locs),
            'prop_conf': cat(prop_confs),
            'center': cat(centers),           # (B, P, 1)
            'priors': jnp.asarray(make_priors(self.frame_num)),  # (P, 1)
            'act': cat(acts) if self.os_head else None,
            'prop_act': cat(prop_acts) if self.os_head else None,
            'ctr_feat': cat(ctr_feats) if ctr_feats else None,
            'prop_ctr_feat': (cat(prop_ctr_feats)
                              if prop_ctr_feats else None),
        })
        if self.use_rpl:
            # expose learned reciprocal points for the RPL loss
            # (thumos14/BDNet.py:528-532); the loss's learnable radius
            # (reference RPLoss.radius, cls_loss.py:349) lives here so it
            # rides the model optimizer like any parameter
            out['cls_ctr'] = self.get_variable('params',
                                               'conf_head')['centers']
            out['prop_cls_ctr'] = self.get_variable(
                'params', 'prop_conf_head')['centers']
            out['rpl_radius'] = self.param(
                'rpl_radius', nn.initializers.zeros, (1,))
        return out
