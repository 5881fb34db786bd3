"""Synthetic THUMOS-style dataset generator.

Produces a miniature but format-complete dataset (npy videos, video_info
CSVs, annotation CSVs, class index txt, GT JSON, YAML config) so the full
train -> test -> eval workflow runs end-to-end without real data. Used by
the e2e tests and as a smoke harness.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Tuple

import numpy as np
import yaml

CLASS_NAMES = ['Run', 'Jump', 'Swim', 'Dive', 'Lift']


def make_synthetic_dataset(root: str, n_train: int = 3, n_test: int = 2,
                           clip_length: int = 128, crop_size: int = 32,
                           spatial: int = 40, num_known: int = 4,
                           seed: int = 0) -> str:
    """Build the dataset tree under `root`; returns the config path.

    Classes 1..num_known are known; the last class is 'unknown' (dropped
    from train annotations, kept in the open GT json).
    """
    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)
    anno = os.path.join(root, 'annotations')
    os.makedirs(anno, exist_ok=True)
    known = CLASS_NAMES[:num_known]
    unknown = CLASS_NAMES[num_known:]

    with open(os.path.join(anno, 'Class_Index_Known.txt'), 'w') as f:
        for i, name in enumerate(known):
            f.write(f'{i + 1} {name}\n')

    database: Dict[str, dict] = {}

    def gen_phase(phase: str, n_videos: int, subset: str
                  ) -> Tuple[str, str]:
        data_dir = os.path.join(root, f'{phase}_npy')
        os.makedirs(data_dir, exist_ok=True)
        info_rows = ['video,fps,sample_fps,count,sample_count']
        # column order matches the real THUMOS annotation CSVs the
        # reference parser expects (thumos_dataset.py:36-44: idx 2 is
        # the origin class index, last two are frame bounds)
        anno_rows = ['video,type,type_idx,start,end,startFrame,endFrame']
        for v in range(n_videos):
            name = f'{phase}_video_{v:03d}'
            t = int(rng.randint(clip_length + 20, clip_length * 3))
            video = rng.randint(0, 255, (t, spatial, spatial, 3),
                                dtype=np.uint8)
            anns = []
            for _ in range(rng.randint(1, 4)):
                length = rng.randint(clip_length // 8, clip_length // 2)
                start = rng.randint(0, t - length)
                cls = int(rng.randint(1, len(CLASS_NAMES) + 1))
                cls_name = CLASS_NAMES[cls - 1]
                # brighten the action segment so there is signal
                video[start:start + length] = np.clip(
                    video[start:start + length].astype(np.int32) + 60,
                    0, 255).astype(np.uint8)
                anns.append((start, start + length, cls, cls_name))
            np.save(os.path.join(data_dir, name + '.npy'), video)
            fps = 10.0
            info_rows.append(f'{name},{fps},{fps},{t},{t}')
            db_anns = []
            for (s, e, cls, cls_name) in anns:
                if cls_name in known:
                    anno_rows.append(
                        f'{name},{cls_name},{cls},{s / fps:.2f},'
                        f'{e / fps:.2f},{s},{e}')
                db_anns.append({'segment': [s / fps, e / fps],
                                'label': cls_name})
            database[name] = {'subset': subset, 'annotations': db_anns}
        info_path = os.path.join(anno, f'{phase}_video_info.csv')
        with open(info_path, 'w') as f:
            f.write('\n'.join(info_rows) + '\n')
        anno_path = os.path.join(anno, f'{phase}_Annotation_known.csv')
        with open(anno_path, 'w') as f:
            f.write('\n'.join(anno_rows) + '\n')
        return info_path, anno_path

    gen_phase('val', n_train, 'validation')
    gen_phase('test', n_test, 'test')

    with open(os.path.join(anno, 'gt_open.json'), 'w') as f:
        json.dump({'database': database}, f)

    cfg = {
        'dataset': {
            'num_classes': num_known + 1,
            'class_info_path': os.path.join(anno,
                                            'Class_Index_Known.txt'),
            'training': {
                'video_info_path': os.path.join(anno,
                                                'val_video_info.csv'),
                'video_anno_path': os.path.join(
                    anno, 'val_Annotation_known.csv'),
                'video_data_path': os.path.join(root, 'val_npy'),
                'clip_length': clip_length,
                'clip_stride': clip_length // 2,
                'crop_size': crop_size,
            },
            'testing': {
                'video_info_path': os.path.join(anno,
                                                'test_video_info.csv'),
                'video_anno_path': os.path.join(
                    anno, 'test_Annotation_known.csv'),
                'video_data_path': os.path.join(root, 'test_npy'),
                'clip_length': clip_length,
                'clip_stride': clip_length // 2,
                'crop_size': crop_size,
            },
        },
        'model': {
            'in_channels': 3,
            'freeze_bn': True,
            'freeze_bn_affine': True,
            'use_edl': True,
            'evidence': 'exp',
            'dropout': 0,
            'os_head': True,
            'backbone_model': '',
        },
        'training': {
            'batch_size': 1,
            'learning_rate': 1e-4,
            'weight_decay': 1e-3,
            'max_epoch': 1,
            'focal_loss': False,
            'edl_loss': True,
            'edl_config': {
                'evidence': 'exp', 'loss_type': 'log', 'iou_aware': True,
                'with_focal': False, 'alpha': 0.25, 'gamma': 2,
                'with_ibm': True, 'ibm_start': 10, 'momentum': 0.99,
                'num_bins': 50,
            },
            'act_config': {'margin': 1.0, 'weight': 0},
            'checkpoint_path': os.path.join(root, 'models'),
            'random_seed': 2020,
        },
        'testing': {
            'conf_thresh': 0.01,
            'top_k': 200,
            'nms_thresh': 0.5,
            'nms_sigma': 0.5,
            'checkpoint_path': os.path.join(root, 'models',
                                            'checkpoint-latest'),
            'output_path': os.path.join(root, 'output'),
            'output_json': 'detection_results.json',
        },
    }
    cfg_path = os.path.join(root, 'config.yaml')
    with open(cfg_path, 'w') as f:
        yaml.safe_dump(cfg, f)
    return cfg_path
