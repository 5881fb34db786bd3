"""Coarse-to-fine pyramid, ActivityNet variant (768-frame clips).

Re-design of AFSD/anet/BDNet.py:120-391. Differences from the THUMOS
pyramid (models/pyramid.py):
 * level 0 comes from Mixed_5c only (no Mixed_4f merge), feat_t = T/8
 * per-level localization outputs are scaled by fpn_strides [4..128]
 * priors carry (center, level index) -> (P, 2); the level index drives
   the per-level regression-range constraints in the ANet matcher
 * the nine tower/head module groups get a normal(0, 0.01) Conv1d
   re-init (+ zero bias) on top of glorot (anet/BDNet.py:435-451),
   applied by `reinit_anet_heads` from train.loop.init_state when
   training an anet-arch model from scratch
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from opental_tpu.models.layers import (ConvGNReLU1D, GN_EPS, ScaleExp,
                                       Unit1D, Unit3D,
                                       interpolate_nearest_1d)
from opental_tpu.models.pyramid import (LAYER_NUM, CONV_CHANNELS,
                                        ProposalBranch, Tower,
                                        expand_boundary_segments)

Array = jax.Array

FPN_STRIDES = (4, 8, 16, 32, 64, 128)
# per-level regression ranges used by the ANet matcher
# (anet/multisegment_loss.py:69)
LEVEL_BOUNDS = ((0, 30), (15, 60), (30, 120), (60, 240), (96, 768),
                (256, 768))


def make_anet_priors(frame_num: int = 768,
                     layer_num: int = LAYER_NUM) -> np.ndarray:
    """(P, 2) priors: [(c + 0.5) / t, level] (anet/BDNet.py:262-269).
    189 priors for 768-frame clips (feat_t = 96)."""
    feat_t = frame_num // 8
    rows = []
    t = feat_t
    for lvl in range(layer_num):
        centers = (np.arange(t, dtype=np.float32) + 0.5) / t
        rows.append(np.stack([centers, np.full(t, lvl, np.float32)], 1))
        t //= 2
    return np.concatenate(rows, 0)


# module groups whose nn.Conv1d layers the reference re-initializes
# (anet/BDNet.py:439-447); actionness heads, deconv stack, and the
# pyramid ladder keep their glorot init
ANET_REINIT_MODULES = ('loc_tower', 'conf_tower', 'loc_head', 'conf_head',
                       'loc_proposal_branch', 'conf_proposal_branch',
                       'prop_loc_head', 'prop_conf_head', 'center_head')


def reinit_anet_heads(params: Dict[str, Any], rng: Array,
                      std: float = 0.01) -> Dict[str, Any]:
    """normal(0, std) re-init of tower/head Conv1d kernels and zeroed
    biases, after the glorot base init (anet/BDNet.py:448-451:
    `normal_(layer.weight, 0, 0.01); constant_(layer.bias, 0)` for every
    nn.Conv1d in the nine listed module groups).

    `params` is the full BDNet param tree (with a 'pyramid' subtree);
    returns a new tree. Conv1d kernels are the ndim-3 (k, in, out)
    leaves; GroupNorm scale/bias (ndim 1 under gn/) are untouched.
    """
    def visit(path, leaf):
        parts = [getattr(p, 'key', '') for p in path]
        if not (parts and parts[0] == 'pyramid'
                and len(parts) >= 2 and parts[1] in ANET_REINIT_MODULES):
            return leaf
        if 'gn' in parts:
            return leaf
        if parts[-1] == 'kernel' and leaf.ndim == 3:
            # stable per-leaf key (str hash() is salted per process)
            import zlib
            fold = zlib.crc32('/'.join(parts).encode()) & 0x7fffffff
            key = jax.random.fold_in(rng, fold)
            return std * jax.random.normal(key, leaf.shape, leaf.dtype)
        if parts[-1] == 'bias':
            return jnp.zeros_like(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, params)


class AnetCoarsePyramid(nn.Module):
    """6-level pyramid over Mixed_5c with stride-scaled localization."""

    num_classes: int
    frame_num: int = 768
    os_head: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, feat_dict: Dict[str, Array], ssl: bool = False,
                 get_feat: bool = False) -> Dict[str, Any]:
        del get_feat  # feature taps are a THUMOS/OpenMax-only path
        oc = CONV_CHANNELS
        x1 = feat_dict['Mixed_5c']            # (B, T/8, h, w, 1024)

        x = Unit3D(oc, kernel=(1, x1.shape[2], x1.shape[3]),
                   padding='spatial_valid', use_bias=True,
                   use_batch_norm=False, activation=None,
                   dtype=self.dtype, name='pyramid_0_conv')(x1)
        x = nn.GroupNorm(num_groups=32, epsilon=GN_EPS,
                         name='pyramid_0_gn')(x)
        x = nn.relu(x).squeeze(axis=(2, 3))   # (B, feat_t, 512)
        pyramid_feats: List[Array] = [x]
        for i in range(1, LAYER_NUM):
            x = ConvGNReLU1D(oc, kernel=3, stride=2, dtype=self.dtype,
                             name=f'pyramid_{i}')(x)
            pyramid_feats.append(x)

        frame_level_feat = interpolate_nearest_1d(pyramid_feats[0],
                                                  self.frame_num)
        for i, k in enumerate((3, 3, 1)):
            frame_level_feat = ConvGNReLU1D(oc, kernel=k, dtype=self.dtype,
                                            name=f'deconv_{i}'
                                            )(frame_level_feat)
        trip = [frame_level_feat]
        half = oc // 2
        out: Dict[str, Any] = {
            'start': frame_level_feat[..., :half],
            'end': frame_level_feat[..., half:],
        }

        loc_tower = Tower(oc, dtype=self.dtype, name='loc_tower')
        conf_tower = Tower(oc, dtype=self.dtype, name='conf_tower')
        loc_head = Unit1D(2, kernel=3, activation=None, dtype=self.dtype,
                          name='loc_head')
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
        prop_conf_head = Unit1D(self.num_classes, kernel=1,
                                activation=None, dtype=self.dtype,
                                name='prop_conf_head')
        center_head = Unit1D(1, kernel=3, activation=None,
                             dtype=self.dtype, name='center_head')

        locs, confs, acts, centers = [], [], [], []
        prop_locs, prop_confs, prop_acts = [], [], []

        for i, feat in enumerate(pyramid_feats):
            t = feat.shape[1]
            loc_feat = loc_tower(feat)
            conf_feat = conf_tower(feat)

            # stride-scaled localization (anet/BDNet.py:307-311)
            loc_out = ScaleExp(name=f'loc_scale_{i}')(loc_head(loc_feat)) \
                * FPN_STRIDES[i]
            locs.append(loc_out)
            confs.append(conf_head(conf_feat))
            if self.os_head:
                acts.append(act_head(conf_feat))

            loc_ng = jax.lax.stop_gradient(loc_out)
            prior_center = ((jnp.arange(t, dtype=jnp.float32) + 0.5) / t
                            )[None, :, None]
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
            prop_confs.append(prop_conf_head(conf_prop_feat))
            if self.os_head:
                prop_acts.append(prop_act_head(conf_prop_feat))
            centers.append(center_head(loc_prop_feat))

        cat = lambda xs: jnp.concatenate(xs, axis=1)
        out.update({
            'loc': cat(locs),
            'conf': cat(confs),
            'prop_loc': cat(prop_locs),
            'prop_conf': cat(prop_confs),
            'center': cat(centers),
            'priors': jnp.asarray(make_anet_priors(self.frame_num)),
            'act': cat(acts) if self.os_head else None,
            'prop_act': cat(prop_acts) if self.os_head else None,
            'ctr_feat': None,
            'prop_ctr_feat': None,
        })
        return out
