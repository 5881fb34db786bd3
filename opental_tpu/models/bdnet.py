"""BDNet: I3D backbone + coarse-to-fine pyramid + evidential head.

Top-level detection model (reference: AFSD/thumos14/BDNet.py:435-561),
rebuilt as a pure-functional flax module. The SSL (cut-paste boundary
triplet) path and the main detection path are separate methods so each
jits into its own static graph.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from opental_tpu.models.i3d import InceptionI3d
from opental_tpu.models.pyramid import CoarsePyramid, expand_boundary_segments
from opental_tpu.ops.boundary_pool import boundary_max_pool_auto as boundary_max_pool

Array = jax.Array


def evidence_fn(logit: Array, evidence: str = 'exp') -> Array:
    """Dirichlet evidence transform (thumos14/BDNet.py:544-550)."""
    if evidence == 'relu':
        return nn.relu(logit)
    if evidence == 'exp':
        return jnp.exp(jnp.clip(logit, -10.0, 10.0))
    if evidence == 'softplus':
        return jax.nn.softplus(logit)
    raise ValueError(evidence)


def dirichlet_uncertainty(logit: Array, evidence: str = 'exp') -> Array:
    """Vacuity u = K / S with S = sum(alpha), alpha = evidence + 1
    (thumos14/BDNet.py:552-556)."""
    k = logit.shape[-1]
    alpha = evidence_fn(logit, evidence) + 1.0
    return k / jnp.sum(alpha, axis=-1)


def dirichlet_expected_prob(logit: Array, evidence: str = 'exp') -> Array:
    """Expected class probability alpha / S (thumos14/BDNet.py:558-561)."""
    alpha = evidence_fn(logit, evidence) + 1.0
    return alpha / jnp.sum(alpha, axis=-1, keepdims=True)


class BDNet(nn.Module):
    """Boundary detection network for (open-set) TAL.

    Input clips are channels-last (B, T, H, W, C) in [-1, 1].
    `__call__` returns the reference out_dict (same keys,
    thumos14/BDNet.py:508-535); `ssl_forward` returns the
    (anchor, positive, negative) triplet features (:479-503).
    """

    in_channels: int = 3
    num_classes: int = 16        # includes background channel
    os_head: bool = False
    use_edl: bool = False
    use_rpl: bool = False
    evidence: str = 'exp'
    transformer: bool = False
    dropout: float = 0.0
    frame_num: int = 256
    arch: str = 'thumos'         # 'thumos' | 'anet' pyramid variant
    deterministic: bool = True
    trunk_tfold: bool = False    # trunk 3x3x3 convs via temporal fold
    stem_pallas: bool = False    # stem pack via Pallas kernel (TPU only)
    remat: bool = False          # backbone block rematerialization
    freeze_bn: bool = True       # thumos14/BDNet.py:39-49 freeze modes
    freeze_bn_affine: bool = True
    dtype: Any = None            # compute dtype (e.g. jnp.bfloat16)

    @property
    def head_classes(self) -> int:
        # os_head drops the background channel (thumos14/BDNet.py:440)
        return self.num_classes - 1 if self.os_head else self.num_classes

    def setup(self):
        self.backbone = InceptionI3d(
            dtype=self.dtype, trunk_tfold=self.trunk_tfold,
            remat=self.remat,
            stem_pallas=self.stem_pallas, freeze_bn=self.freeze_bn,
            freeze_bn_affine=self.freeze_bn_affine,
            bn_train=not self.freeze_bn and not self.deterministic)
        if self.arch == 'anet':
            from opental_tpu.models.anet_pyramid import AnetCoarsePyramid
            self.pyramid = AnetCoarsePyramid(
                num_classes=self.head_classes, frame_num=self.frame_num,
                os_head=self.os_head, dtype=self.dtype)
        else:
            self.pyramid = CoarsePyramid(
                num_classes=self.head_classes, frame_num=self.frame_num,
                os_head=self.os_head, use_rpl=self.use_rpl,
                transformer=self.transformer, dropout=self.dropout,
                deterministic=self.deterministic, dtype=self.dtype)

    def __call__(self, x: Array, get_feat: bool = False) -> Dict[str, Any]:
        return self.detect_from_features(self.backbone(x),
                                         get_feat=get_feat)

    def backbone_features(self, x: Array) -> Dict[str, Array]:
        """Backbone-only pass. Shared-backbone inference runs this ONCE
        over a span covering many overlapping test windows (reference
        runs the full net per window, test.py:227-235 — at stride 128 /
        clip 256 that computes every frame's backbone twice)."""
        return self.backbone(x)

    def detect_from_features(self, feat_dict: Dict[str, Array],
                             get_feat: bool = False) -> Dict[str, Any]:
        """Pyramid + heads on precomputed backbone features; the tail
        of __call__ after the backbone (same out_dict contract)."""
        out = self.pyramid(feat_dict, get_feat=get_feat)
        if self.use_edl:
            out['unct'] = dirichlet_uncertainty(out['conf'], self.evidence)
            out['prop_unct'] = dirichlet_uncertainty(out['prop_conf'],
                                                     self.evidence)
        if get_feat:
            out['conf_feat'] = out['ctr_feat']
            out['prop_conf_feat'] = out['prop_ctr_feat']
        return out

    def train_forward(self, x: Array, ssl_x: Array, proposals: Array
                      ) -> Tuple[Dict[str, Any], Tuple[list, list, list]]:
        """Fused main + SSL forward: ONE backbone pass over the
        concatenated clip batch (conv batch 2B instead of two B passes —
        measured: per-conv MXU efficiency rises steeply with batch at
        train sizes; BASELINE.md round-3 train notes).

        Math-exact vs separate __call__ + ssl_forward ONLY when BN is
        frozen (running stats; per-sample convs/pools are batch
        independent) — the train step auto-selects this path iff
        freeze_bn (the shipped configs). Reference semantics being
        fused: train.py:222-241 (two sequential forwards)."""
        b = x.shape[0]
        feat_dict = self.backbone(jnp.concatenate([x, ssl_x], 0))
        # ONE pyramid pass too (@nn.compact allows a single call per
        # trace): the SSL trip features are exactly the concatenated
        # (start, end) pairs the out dict already carries
        # (pyramid.py trip[0..2] construction), so slice them back out
        # of the 2B outputs instead of a second pyramid call. The only
        # waste is the ssl half riding through the prop/center heads
        # (~3.5% of model time).
        full = self.pyramid(feat_dict)
        cat = jnp.concatenate
        trip = [cat([full['start'][b:], full['end'][b:]], -1),
                cat([full['start_loc_prop'][b:],
                     full['end_loc_prop'][b:]], -1),
                cat([full['start_conf_prop'][b:],
                     full['end_conf_prop'][b:]], -1)]
        # batched outputs get their main half; shared tensors (priors,
        # RPL centers/radius) pass through untouched
        unbatched = {'priors', 'cls_ctr', 'prop_cls_ctr', 'rpl_radius'}
        out = {k: (v[:b] if k not in unbatched
                   and isinstance(v, jnp.ndarray) else v)
               for k, v in full.items()}
        if self.use_edl:
            out['unct'] = dirichlet_uncertainty(out['conf'],
                                                self.evidence)
            out['prop_unct'] = dirichlet_uncertainty(out['prop_conf'],
                                                     self.evidence)
        return out, self._ssl_triplets(trip, proposals)

    def _ssl_triplets(self, trip, proposals: Array
                      ) -> Tuple[list, list, list]:
        decoded = proposals[..., :2]                        # (B, 3, 2)
        frame_segments = expand_boundary_segments(
            decoded[..., :1], decoded[..., 1:], plus_one=True)
        scales = (1.0, 4.0, 4.0)
        anchor, positive, negative = [], [], []
        for feat, scale in zip(trip, scales):
            bound = boundary_max_pool(feat, frame_segments / scale)
            ndim = bound.shape[-1] // 2                      # (1, 3, C)
            anchor.append(bound[:, 0, ndim:])
            positive.append(bound[:, 1, :ndim])
            negative.append(bound[:, 2, :ndim])
        return anchor, positive, negative

    def ssl_forward(self, x: Array, proposals: Array
                    ) -> Tuple[list, list, list]:
        """Boundary-contrastive features for the SSL triplet loss.

        proposals: (B, 3, 2) cut-paste segments in frame units per sample
        (the reference uses targets[0] with batch 1,
        thumos14/BDNet.py:484; this generalizes to any batch).
        Returns per-scale (anchor, positive, negative) (B, C/2) features.
        """
        feat_dict = self.backbone(x)
        trip = self.pyramid(feat_dict, ssl=True)['trip']
        return self._ssl_triplets(trip, proposals)
