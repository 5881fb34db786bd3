"""Config -> component factory.

Centralizes the wiring the reference does ad-hoc at the top of each
entry script (AFSD/thumos14/train.py:17-44,306-330, test.py:259-288):
model flags, loss config, optimizer, and checkpoint paths all derive
from one YAML Config.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

from opental_tpu.config import Config
from opental_tpu.losses.edl import EDLConfig
from opental_tpu.losses.multisegment import LossConfig
from opental_tpu.models.bdnet import BDNet
from opental_tpu.train.step import LossWeights


def model_flags(cfg: Config) -> Dict[str, Any]:
    model = cfg.get_path('model', {})
    return {
        'in_channels': model.get('in_channels', 3),
        'num_classes': cfg.get_path('dataset.num_classes', 16),
        'os_head': model.get('os_head', False),
        'use_edl': model.get('use_edl', False),
        'use_rpl': model.get('use_rpl', False),
        'evidence': model.get('evidence', 'exp'),
        'transformer': model.get('transformer', False),
        'dropout': model.get('dropout', 0.0),
        'arch': model.get('arch', 'thumos'),
    }


def build_model(cfg: Config, frame_num: Optional[int] = None,
                deterministic: bool = True, dtype=None,
                in_channels: Optional[int] = None) -> BDNet:
    flags = model_flags(cfg)
    # reference BN freeze modes (thumos14/BDNet.py:39-49): freeze_bn
    # keeps running stats, freeze_bn_affine additionally freezes
    # gamma/beta; freeze_bn: false trains BN with batch statistics and
    # EMA running-stat updates (train step applies with mutable
    # 'constants')
    flags['freeze_bn'] = bool(cfg.get_path('model.freeze_bn', True))
    flags['freeze_bn_affine'] = bool(
        cfg.get_path('model.freeze_bn_affine', True))
    if in_channels is not None:
        flags['in_channels'] = in_channels
    if dtype is None:
        # optional config knob: model.compute_dtype: bfloat16 runs the
        # conv stack in bf16 (params stay f32); default f32
        name = cfg.get_path('model.compute_dtype')
        if name in ('bfloat16', 'bf16'):
            import jax.numpy as jnp
            dtype = jnp.bfloat16
    frame = frame_num or cfg.get_path('dataset.training.clip_length', 256)
    # optional measured perf knobs (exact-math formulation switches,
    # default off — see BASELINE.md trunk/stem A/B):
    flags['trunk_tfold'] = bool(cfg.get_path('model.trunk_tfold', False))
    flags['stem_pallas'] = bool(cfg.get_path('model.stem_pallas', False))
    # model.remat: true rematerializes backbone blocks in the backward
    # pass — trades one forward recompute for activation memory, for
    # large-batch training (see BASELINE.md train scaling)
    flags['remat'] = bool(cfg.get_path('model.remat', False))
    return BDNet(frame_num=frame, deterministic=deterministic, dtype=dtype,
                 **flags)


def cls_loss_type(cfg: Config) -> str:
    if cfg.get_path('training.edl_loss', False):
        return 'edl'
    if cfg.get_path('training.rpl_loss', False):
        return 'rpl'
    return 'focal'


def build_loss_config(cfg: Config) -> LossConfig:
    flags = model_flags(cfg)
    num_cls = flags['num_classes'] - (1 if flags['os_head'] else 0)
    kind = cls_loss_type(cfg)
    edl = None
    if kind == 'edl':
        e = cfg.get_path('training.edl_config', {}) or {}
        edl = EDLConfig(
            num_classes=num_cls,
            loss_type=e.get('loss_type', 'log'),
            evidence=e.get('evidence', 'exp'),
            with_focal=e.get('with_focal', False),
            alpha=e.get('alpha', 0.25),
            gamma=e.get('gamma', 2.0),
            soft_label=e.get('soft_label', 0.0),
            iou_aware=e.get('iou_aware', False),
            with_ghm=e.get('with_ghm', False),
            with_ibloss=e.get('with_ibloss', False),
            with_ibm=e.get('with_ibm', False),
            num_bins=e.get('num_bins', 50),
            momentum=e.get('momentum', 0.99),
            ghm_start=e.get('ghm_start', 0),
            ib_start=e.get('ib_start', 10),
            ibm_start=e.get('ibm_start', 0),
        )
    arch = flags['arch']
    if edl is not None and arch == 'anet' and edl.with_ibm:
        # ANet ships the older exp-form MIB (anet/cls_loss.py:225-231)
        e = cfg.get_path('training.edl_config', {}) or {}
        edl = edl._replace(ibm_exp=True,
                           ibm_coeff=e.get('ibm_coeff', 10.0))
    act = cfg.get_path('training.act_config', {}) or {}
    rpl = cfg.get_path('training.rpl_config', {}) or {}
    return LossConfig(
        num_classes=num_cls,
        clip_length=cfg.get_path('dataset.training.clip_length', 256),
        piou=cfg.get_path('training.piou', 0.0),
        cls_type=kind,
        edl=edl,
        os_head=flags['os_head'],
        act_margin=act.get('margin', 1.0),
        act_weight=act.get('weight', 0.1),
        rpl_weight_pl=rpl.get('weight_pl', 0.1),
        rpl_temperature=rpl.get('temperature', 1.0),
        rpl_gcpl=rpl.get('gcpl', False),
        variant=arch,
    )


def build_loss_weights(cfg: Config) -> LossWeights:
    tr = cfg.get_path('training', {})
    return LossWeights(lw=tr.get('lw', 1.0), cw=tr.get('cw', 10.0),
                       ctw=tr.get('ctw', 1.0), actw=tr.get('actw', 1.0),
                       ssl=tr.get('ssl', 0.1))
