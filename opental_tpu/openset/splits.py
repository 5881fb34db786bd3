"""Open-set known/unknown split generation.

Reference: datasets/openset_split_thumos14.py (seed 123, 5 random splits
of the 20 THUMOS classes into 5 unknown / 15 known; writes per-split
Class_Index_{Known,Unknown}.txt, class-filtered annotation CSVs, and
known/unknown GT JSONs) and datasets/openset_split_anet.py (50 unknown /
150 known of 200). The same unknown-class draws are reproduced exactly
(same seed, same np.random.choice sequence).
"""

from __future__ import annotations

import copy
import csv
import json
import os
import shutil
from typing import Dict, List, Sequence, Tuple

import numpy as np


def read_class_index(class_info_path: str
                     ) -> Tuple[Dict[int, int], Dict[int, str]]:
    originidx_to_idx: Dict[int, int] = {}
    idx_to_class: Dict[int, str] = {}
    with open(class_info_path) as f:
        rows = [ln.split() for ln in f.read().splitlines() if ln.strip()]
    for i, (origin, name) in enumerate(rows):
        originidx_to_idx[int(origin)] = i + 1
        idx_to_class[i + 1] = name
    return originidx_to_idx, idx_to_class


def write_class_index(path: str, idx_to_class: Dict[int, str],
                      originidx_to_idx: Dict[int, int]) -> None:
    with open(path, 'w') as f:
        for ori_idx, idx in originidx_to_idx.items():
            f.write(f'{ori_idx} {idx_to_class[idx]}\n')


def filter_annotation_csv(src_csv: str, dst_csv: str,
                          drop_classes: Sequence[str]) -> None:
    """Drop annotation rows whose 'type' column is in drop_classes
    (reference csv_filtering)."""
    drop = set(drop_classes)
    with open(src_csv) as f:
        reader = csv.reader(f)
        rows = list(reader)
    header = rows[0]
    type_col = header.index('type')
    kept = [header] + [
        r for r in rows[1:]
        if any(c.strip() for c in r) and r[type_col] not in drop]
    with open(dst_csv, 'w', newline='') as f:
        csv.writer(f).writerows(kept)


def filter_gt_json(src_json: str, dst_json: str,
                   drop_classes: Sequence[str]) -> None:
    """Drop annotations of the given classes; drop videos left empty
    (reference json_filtering)."""
    drop = set(drop_classes)
    with open(src_json) as f:
        data = json.load(f)
    new_gt = copy.deepcopy(data)
    for videoid, v in data['database'].items():
        anns = [a for a in v['annotations'] if a['label'] not in drop]
        if anns:
            v_new = copy.deepcopy(v)
            v_new['annotations'] = anns
            new_gt['database'][videoid] = v_new
        else:
            new_gt['database'].pop(videoid)
    with open(dst_json, 'w') as f:
        json.dump(new_gt, f)


def generate_thumos_splits(anno_path: str, result_anno_path: str,
                           num_splits: int = 5, num_unknown: int = 5,
                           seed: int = 123) -> List[Dict[int, str]]:
    """Generate the open-set split directory tree. Returns the per-split
    unknown class maps. Seeded identically to the reference so split
    membership matches."""
    np.random.seed(seed)
    os.makedirs(result_anno_path, exist_ok=True)
    class_info_file = os.path.join(anno_path, 'Class_Index_Detection.txt')
    shutil.copyfile(class_info_file,
                    os.path.join(result_anno_path,
                                 'Class_Index_Detection.txt'))
    originidx_to_idx, idx_to_class = read_class_index(class_info_file)

    unknown_maps = []
    for i in range(num_splits):
        split_path = os.path.join(result_anno_path, f'split_{i}')
        os.makedirs(split_path, exist_ok=True)
        # NOTE reference quirk kept: np.random.choice over
        # len(idx_to_class) draws indices 0..K-1 but idx_to_class keys
        # are 1..K, so index 0 never maps to a class and the draw of
        # class ids is over {1..K} ∩ {0..K-1}
        unknown = np.random.choice(len(idx_to_class), size=num_unknown,
                                   replace=False)
        idx_to_unknown = {k: v for k, v in idx_to_class.items()
                          if k in unknown}
        ori_unknown = {k: v for k, v in originidx_to_idx.items()
                       if v in unknown}
        write_class_index(os.path.join(split_path,
                                       'Class_Index_Unknown.txt'),
                          idx_to_unknown, ori_unknown)
        idx_to_known = {k: v for k, v in idx_to_class.items()
                        if k not in unknown}
        ori_known = {k: v for k, v in originidx_to_idx.items()
                     if v not in unknown}
        write_class_index(os.path.join(split_path,
                                       'Class_Index_Known.txt'),
                          idx_to_known, ori_known)
        unknown_names = list(idx_to_unknown.values())
        known_names = list(idx_to_known.values())
        for phase in ('val', 'test'):
            src = os.path.join(anno_path, f'{phase}_Annotation_ours.csv')
            if not os.path.exists(src):
                continue
            filter_annotation_csv(
                src, os.path.join(split_path,
                                  f'{phase}_Annotation_known.csv'),
                unknown_names)
            filter_annotation_csv(
                src, os.path.join(split_path,
                                  f'{phase}_Annotation_unknown.csv'),
                known_names)
        gt = os.path.join(anno_path, 'thumos_gt.json')
        if os.path.exists(gt):
            filter_gt_json(gt, os.path.join(split_path, 'known_gt.json'),
                           unknown_names)
            filter_gt_json(gt, os.path.join(split_path, 'unknown_gt.json'),
                           known_names)
        unknown_maps.append(idx_to_unknown)

    for name in ('val_video_info.csv', 'test_video_info.csv'):
        src = os.path.join(anno_path, name)
        if os.path.exists(src):
            shutil.copyfile(src, os.path.join(result_anno_path, name))
    src = os.path.join(anno_path, 'test_Annotation_ours.csv')
    if os.path.exists(src):
        shutil.copyfile(src, os.path.join(result_anno_path,
                                          'test_Annotation_open.csv'))
    return unknown_maps
