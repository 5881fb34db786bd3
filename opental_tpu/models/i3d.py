"""Inception-v1 I3D video backbone (flax, channels-last).

Re-design of the reference backbone (AFSD/common/i3d_backbone.py:90-342)
as a single jitted XLA graph. Input is (B, T, H, W, C); the detection
pyramid consumes the 'Mixed_4f' (832ch) and 'Mixed_5c' (1024ch) endpoints
(thumos14/BDNet.py:307-308).

Endpoint and branch names match the public I3D checkpoint key layout
('Conv3d_1a_7x7', 'Mixed_3b.b1a', ...) so torch checkpoints
(models/i3d_models/rgb_imagenet.pt) convert mechanically — see
opental_tpu.utils.torch_convert.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
from flax import linen as nn

from opental_tpu.models.layers import (FrozenBatchNorm, SpaceToDepthConv3d,
                                       Unit3D, max_pool_3d_same)

Array = jax.Array

# (branch output channels) per inception module, keyed by endpoint
# (i3d_backbone.py:229-295)
INCEPTION_SPECS: Dict[str, Sequence[int]] = {
    'Mixed_3b': (64, 96, 128, 16, 32, 32),
    'Mixed_3c': (128, 128, 192, 32, 96, 64),
    'Mixed_4b': (192, 96, 208, 16, 48, 64),
    'Mixed_4c': (160, 112, 224, 24, 64, 64),
    'Mixed_4d': (128, 128, 256, 24, 64, 64),
    'Mixed_4e': (112, 144, 288, 32, 64, 64),
    'Mixed_4f': (256, 160, 320, 32, 128, 128),
    'Mixed_5b': (256, 160, 320, 32, 128, 128),
    'Mixed_5c': (384, 192, 384, 48, 128, 128),
}

# endpoint order up to Mixed_5c (i3d_backbone.py:140-159)
ENDPOINTS: Tuple[str, ...] = (
    'Conv3d_1a_7x7', 'MaxPool3d_2a_3x3', 'Conv3d_2b_1x1', 'Conv3d_2c_3x3',
    'MaxPool3d_3a_3x3', 'Mixed_3b', 'Mixed_3c', 'MaxPool3d_4a_3x3',
    'Mixed_4b', 'Mixed_4c', 'Mixed_4d', 'Mixed_4e', 'Mixed_4f',
    'MaxPool3d_5a_2x2', 'Mixed_5b', 'Mixed_5c',
)

MAXPOOL_SPECS = {
    'MaxPool3d_2a_3x3': ((1, 3, 3), (1, 2, 2)),
    'MaxPool3d_3a_3x3': ((1, 3, 3), (1, 2, 2)),
    'MaxPool3d_4a_3x3': ((3, 3, 3), (2, 2, 2)),
    'MaxPool3d_5a_2x2': ((2, 2, 2), (2, 2, 2)),
}


class Stem(nn.Module):
    """Conv3d_1a_7x7 block with the space-to-depth conv. Param paths
    ('conv/kernel', 'bn/*') match the plain Unit3D layout."""

    features: int = 64
    use_pallas: bool = False
    bn_freeze_stats: bool = True
    bn_freeze_affine: bool = True
    bn_train: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = SpaceToDepthConv3d(self.features, kernel=(7, 7, 7),
                               in_channels=x.shape[-1], dtype=self.dtype,
                               use_pallas=self.use_pallas,
                               name='conv')(x)
        x = FrozenBatchNorm(self.features,
                            freeze_stats=self.bn_freeze_stats,
                            freeze_affine=self.bn_freeze_affine,
                            train_mode=self.bn_train, name='bn')(x)
        return jax.numpy.maximum(x, 0)


class InceptionModule(nn.Module):
    """4-branch inception block (i3d_backbone.py:90-121)."""

    out_channels: Sequence[int]
    fold_temporal: bool = False
    bn_freeze_stats: bool = True
    bn_freeze_affine: bool = True
    bn_train: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        oc = self.out_channels
        kw = dict(use_batch_norm=True, use_bias=False, dtype=self.dtype,
                  bn_freeze_stats=self.bn_freeze_stats,
                  bn_freeze_affine=self.bn_freeze_affine,
                  bn_train=self.bn_train)
        kw3 = dict(kw, fold_temporal=self.fold_temporal)
        b0 = Unit3D(oc[0], kernel=(1, 1, 1), name='b0', **kw)(x)
        b1 = Unit3D(oc[1], kernel=(1, 1, 1), name='b1a', **kw)(x)
        b1 = Unit3D(oc[2], kernel=(3, 3, 3), name='b1b', **kw3)(b1)
        b2 = Unit3D(oc[3], kernel=(1, 1, 1), name='b2a', **kw)(x)
        b2 = Unit3D(oc[4], kernel=(3, 3, 3), name='b2b', **kw3)(b2)
        b3 = max_pool_3d_same(x, kernel=(3, 3, 3), stride=(1, 1, 1))
        b3 = Unit3D(oc[5], kernel=(1, 1, 1), name='b3b', **kw)(b3)
        return jax.numpy.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionI3d(nn.Module):
    """I3D feature extractor up to Mixed_5c.

    __call__ returns {'Mixed_4f': (B,T/8,6,6,832),
                      'Mixed_5c': (B,T/16,3,3,1024)} for 96x96 inputs,
    i.e. exactly the endpoints the pyramid consumes; pass
    keep='all' to materialize every endpoint
    (reference extract_features, i3d_backbone.py:335-342).
    """

    final_endpoint: str = 'Mixed_5c'
    keep: Sequence[str] = ('Mixed_4f', 'Mixed_5c')
    # stem via exact space-to-depth rewrite (8x MXU lane utilization on
    # the 3-channel 7x7x7 stride-2 conv, ~90% of backbone time otherwise)
    s2d_stem: bool = True
    # trunk 3x3x3 convs via temporal-channel fold (one wide 2D conv on a
    # 3-tap channel concat) instead of native conv3d
    trunk_tfold: bool = False
    # stem packing via the Pallas kernel (TPU only)
    stem_pallas: bool = False
    # reference freeze modes (thumos14/BDNet.py:39-49): freeze_bn keeps
    # running stats; freeze_bn_affine additionally freezes gamma/beta;
    # bn_train=True (train step, freeze_bn: false) uses batch stats and
    # EMA-updates the running stats (mutable 'constants')
    freeze_bn: bool = True
    freeze_bn_affine: bool = True
    bn_train: bool = False
    # rematerialize each block in the backward pass: activation memory
    # drops from every conv intermediate to the endpoint outputs only,
    # letting the train step scale past the bs=16 f32 HBM wall at the
    # cost of one extra forward recompute per block
    remat: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        keep = set(ENDPOINTS) if self.keep == 'all' else set(self.keep)
        out: Dict[str, Array] = {}
        bn_kw = dict(bn_freeze_stats=self.freeze_bn,
                     bn_freeze_affine=self.freeze_bn
                     and self.freeze_bn_affine,
                     bn_train=self.bn_train)
        kw = dict(use_batch_norm=True, use_bias=False, dtype=self.dtype,
                  **bn_kw)
        if self.remat:
            # lifted transforms keep module names, so param/constants
            # trees are identical with remat on or off. prevent_cse must
            # stay True (the default): under plain jit, XLA's CSE
            # otherwise merges the recomputation back into the saved
            # forward and the memory saving evaporates (observed: bs=16
            # still OOMed with prevent_cse=False).
            StemM, UnitM, IncM = (nn.remat(Stem), nn.remat(Unit3D),
                                  nn.remat(InceptionModule))
        else:
            StemM, UnitM, IncM = Stem, Unit3D, InceptionModule
        for ep in ENDPOINTS:
            if ep == 'Conv3d_1a_7x7':
                if self.s2d_stem:
                    x = StemM(64, dtype=self.dtype,
                              use_pallas=self.stem_pallas, name=ep,
                              **bn_kw)(x)
                else:
                    x = UnitM(64, kernel=(7, 7, 7), stride=(2, 2, 2),
                              name=ep, **kw)(x)
            elif ep == 'Conv3d_2b_1x1':
                x = UnitM(64, kernel=(1, 1, 1), name=ep, **kw)(x)
            elif ep == 'Conv3d_2c_3x3':
                x = UnitM(192, kernel=(3, 3, 3), name=ep,
                          fold_temporal=self.trunk_tfold, **kw)(x)
            elif ep in MAXPOOL_SPECS:
                kernel, stride = MAXPOOL_SPECS[ep]
                x = max_pool_3d_same(x, kernel, stride)
            else:
                x = IncM(INCEPTION_SPECS[ep], name=ep,
                         fold_temporal=self.trunk_tfold,
                         dtype=self.dtype, **bn_kw)(x)
            if ep in keep:
                out[ep] = x
            if ep == self.final_endpoint:
                break
        return out
