"""Generate the shipped YAML config set.

One base template per dataset + per-method override table, mirroring the
reference config matrix (configs/*.yaml + configs/ablations/*.yaml) so
experiments port 1:1. Run `python configs/generate.py` to refresh.
"""

import copy
import os

import yaml

HERE = os.path.dirname(os.path.abspath(__file__))

THUMOS_BASE = {
    'dataset': {
        'num_classes': 16,
        'class_info_path': './datasets/thumos14/annotations_open/'
                           'split_{id:d}/Class_Index_Known.txt',
        'training': {
            'video_mp4_path': './datasets/thumos14/validation/',
            'video_info_path': './datasets/thumos14/annotations_open/'
                               'val_video_info.csv',
            'video_anno_path': './datasets/thumos14/annotations_open/'
                               'split_{id:d}/val_Annotation_known.csv',
            'video_data_path': './datasets/thumos14/validation_npy/',
            'clip_length': 256,
            'clip_stride': 30,
            'crop_size': 96,
        },
        'testing': {
            'video_mp4_path': './datasets/thumos14/test/',
            'video_info_path': './datasets/thumos14/annotations_open/'
                               'test_video_info.csv',
            'video_anno_path': './datasets/thumos14/annotations_open/'
                               'split_{id:d}/test_Annotation_known.csv',
            'video_anno_open_path': './datasets/thumos14/annotations_open/'
                                    'test_Annotation_open.csv',
            'video_data_path': './datasets/thumos14/test_npy/',
            'crop_size': 96,
            'clip_length': 256,
            'clip_stride': 128,
        },
    },
    'model': {
        'in_channels': 3,
        'freeze_bn': True,
        'freeze_bn_affine': True,
        'backbone_model': './models/i3d_models/rgb_imagenet.pt',
    },
    'training': {
        'batch_size': 1,
        'learning_rate': '1e-5',
        'weight_decay': '1e-3',
        'max_epoch': 25,
        'focal_loss': False,
        'random_seed': 2020,
    },
    'testing': {
        'conf_thresh': 0.01,
        'top_k': 5000,
        'nms_thresh': 0.5,
        'nms_sigma': 0.5,
        'output_json': 'detection_results.json',
    },
}

ANET_BASE = {
    'dataset': {
        'num_classes': 151,
        'class_info_path': 'datasets/activitynet/annotations_open/'
                           'split_{id:d}/action_known.txt',
        'training': {
            'video_mp4_path': 'datasets/activitynet/train_val_npy_112',
            'video_info_path': 'datasets/activitynet/annotations_open/'
                               'split_{id:d}/'
                               'video_info_trainval_openset.json',
            'video_anno_path': 'None',
            'video_data_path': 'None',
            'clip_length': 768,
            'clip_stride': 768,
            'crop_size': 96,
        },
        'testing': {
            'video_mp4_path': 'datasets/activitynet/train_val_npy_112',
            'video_info_path': 'datasets/activitynet/annotations_open/'
                               'split_{id:d}/'
                               'video_info_trainval_openset.json',
            'video_anno_path': 'None',
            'video_data_path': 'None',
            'crop_size': 96,
            'clip_length': 768,
            'clip_stride': 768,
        },
    },
    'model': {
        'in_channels': 3,
        'arch': 'anet',
        'freeze_bn': True,
        'freeze_bn_affine': True,
        'backbone_model': 'models/i3d_models/rgb_imagenet.pt',
    },
    'training': {
        'batch_size': 2,
        'learning_rate': '1e-4',
        'weight_decay': '1e-4',
        'max_epoch': 25,
        'focal_loss': False,
        'random_seed': 2020,
    },
    'testing': {
        'conf_thresh': 0.01,
        'top_k': 5000,
        'nms_thresh': 0.5,
        'nms_sigma': 0.85,
        'output_json': 'detection_results.json',
    },
}

EDL_BASE = {'evidence': 'exp', 'loss_type': 'log', 'soft_label': 0,
            'with_focal': False, 'alpha': 0.25, 'gamma': 2}
MIB = {'with_ibm': True, 'ibm_start': 10, 'momentum': 0.99, 'num_bins': 50}


def paths(tag, split_dir=True):
    s = 'split_{id:d}' if split_dir else ''
    return {
        'training.checkpoint_path': f'./models/thumos14/{tag}/{s}/',
        'testing.checkpoint_path':
            f'./models/thumos14/{tag}/{s}/checkpoint-latest.ckpt',
        'testing.output_path': f'./output/{tag}/{s}',
    }


def apply(cfg, dotted, value):
    cur = cfg
    parts = dotted.split('.')
    for p in parts[:-1]:
        cur = cur.setdefault(p, {})
    cur[parts[-1]] = value


def build(base, overrides):
    cfg = copy.deepcopy(base)
    for dotted, value in overrides.items():
        apply(cfg, dotted, value)
    return cfg


def edl_cfg(**extra):
    d = dict(EDL_BASE)
    d.update(extra)
    return d


CONFIGS = {
    # plain closed-set AFSD baseline: the full 21-class detection
    # annotation set (no open split templating), the config every
    # open-set variant diffs against (reference configs/thumos14.yaml)
    'thumos14.yaml': build(THUMOS_BASE, {
        'dataset.num_classes': 21,
        'dataset.class_info_path':
            './datasets/thumos14/annotations/Class_Index_Detection.txt',
        'dataset.training.video_info_path':
            './datasets/thumos14/annotations/val_video_info.csv',
        'dataset.training.video_anno_path':
            './datasets/thumos14/annotations/val_Annotation_ours.csv',
        'dataset.testing.video_info_path':
            './datasets/thumos14/annotations/test_video_info.csv',
        'dataset.testing.video_anno_path':
            './datasets/thumos14/annotations/test_Annotation_ours.csv',
        'training.max_epoch': 16, 'training.focal_loss': True,
        'training.checkpoint_path': './models/thumos14/',
        'testing.checkpoint_path':
            './models/thumos14/checkpoint-latest.ckpt',
        'testing.output_path': './output'}),
    # closed-set AFSD softmax baseline
    'thumos14_softmax.yaml': build(THUMOS_BASE, {
        'training.max_epoch': 16, 'training.focal_loss': True,
        **paths('softmax')}),
    # plain EDL open-set variant
    'thumos14_open_edl.yaml': build(THUMOS_BASE, {
        'model.use_edl': True, 'model.evidence': 'exp', 'model.dropout': 0,
        'training.edl_loss': True, 'training.edl_config': edl_cfg(),
        **paths('open_edl')}),
    # OpenTAL final: MIB-EDL + PU actionness + IoU calibration
    'thumos14_opental_final.yaml': build(THUMOS_BASE, {
        'model.use_edl': True, 'model.evidence': 'exp', 'model.dropout': 0,
        'model.os_head': True,
        'training.edl_loss': True,
        'training.edl_config': edl_cfg(iou_aware=True, **MIB),
        'training.act_config': {'margin': 1.0, 'weight': 0},
        **paths('opental_final')}),
    # reciprocal-point baselines
    'thumos14_open_rpl.yaml': build(THUMOS_BASE, {
        'model.use_rpl': True, 'training.rpl_loss': True,
        'training.rpl_config': {'temperature': 1, 'weight_pl': 0.1},
        **paths('open_rpl')}),
    'thumos14_open_gcpl.yaml': build(THUMOS_BASE, {
        'model.use_rpl': True, 'training.rpl_loss': True,
        'training.rpl_config': {'gcpl': True, 'temperature': 1,
                                'weight_pl': 0.1},
        **paths('open_gcpl')}),
    # openmax runs on the closed softmax model with feature taps
    'thumos14_openmax.yaml': build(THUMOS_BASE, {
        'training.max_epoch': 16, 'training.focal_loss': True,
        **paths('softmax'),
        'testing.output_path': './output/openmax/split_{id:d}'}),
    # ANet variants
    'anet_opental.yaml': build(ANET_BASE, {
        'model.use_edl': True, 'model.evidence': 'exp',
        'model.os_head': True,
        'training.edl_loss': True,
        'training.edl_config': edl_cfg(iou_aware=True, **MIB),
        'training.checkpoint_path': 'models/anet/opental/split_{id:d}/',
        'testing.checkpoint_path':
            'models/anet/opental/split_{id:d}/checkpoint-latest.ckpt',
        'testing.output_path': 'output/anet/opental/split_{id:d}'}),
    'anet_edl.yaml': build(ANET_BASE, {
        'model.use_edl': True, 'model.evidence': 'exp',
        'training.edl_loss': True, 'training.edl_config': edl_cfg(),
        'training.checkpoint_path': 'models/anet/edl/split_{id:d}/',
        'testing.checkpoint_path':
            'models/anet/edl/split_{id:d}/checkpoint-latest.ckpt',
        'testing.output_path': 'output/anet/edl/split_{id:d}'}),
    'anet_softmax.yaml': build(ANET_BASE, {
        'training.focal_loss': True,
        'training.checkpoint_path': 'models/anet/softmax/split_{id:d}/',
        'testing.checkpoint_path':
            'models/anet/softmax/split_{id:d}/checkpoint-latest.ckpt',
        'testing.output_path': 'output/anet/softmax/split_{id:d}'}),
}

# closed-set runs have no open-split annotation file (reference
# configs/thumos14.yaml carries no such key)
del CONFIGS['thumos14.yaml']['dataset']['testing']['video_anno_open_path']

_FINAL = CONFIGS['thumos14_opental_final.yaml']

ABLATIONS = {
    'thumos14_opental_focal.yaml': {
        'training.edl_config': edl_cfg(iou_aware=True, with_focal=True),
        **paths('opental_focal')},
    'thumos14_opental_ghm.yaml': {
        'training.edl_config': edl_cfg(iou_aware=True, with_ghm=True,
                                       num_bins=30, momentum=0.85,
                                       ghm_start=10),
        **paths('opental_ghm')},
    'thumos14_opental_hardmib.yaml': {
        'training.edl_config': edl_cfg(iou_aware=True, **{**MIB,
                                                          'momentum': 0}),
        **paths('opental_hardmib')},
    'thumos14_opental_ib.yaml': {
        'training.edl_config': edl_cfg(iou_aware=True, with_ibloss=True,
                                       ib_start=10),
        **paths('opental_ib')},
    'thumos14_opental_noACT.yaml': {
        'model.os_head': False, **paths('opental_noACT')},
    'thumos14_opental_noIoUC.yaml': {
        'training.edl_config': edl_cfg(iou_aware=False, **MIB),
        **paths('opental_noIoUC')},
    'thumos14_opental_noMIB.yaml': {
        'training.edl_config': edl_cfg(iou_aware=True),
        **paths('opental_noMIB')},
}


def main():
    os.makedirs(os.path.join(HERE, 'ablations'), exist_ok=True)
    for name, cfg in CONFIGS.items():
        with open(os.path.join(HERE, name), 'w') as f:
            yaml.safe_dump(cfg, f, sort_keys=False)
    for name, overrides in ABLATIONS.items():
        cfg = build(_FINAL, overrides)
        with open(os.path.join(HERE, 'ablations', name), 'w') as f:
            yaml.safe_dump(cfg, f, sort_keys=False)
    print(f'wrote {len(CONFIGS)} configs + {len(ABLATIONS)} ablations')


if __name__ == '__main__':
    main()
