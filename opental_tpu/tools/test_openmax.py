"""OpenMax baseline pipeline CLI.

Reference: AFSD/thumos14/test_openmax.py — three idempotent stages:
 1. MAV extraction: run the trained closed-set model with feature taps
    over train clips, collect conf-tower features of positive-matched
    priors per class, save per-class MAV + eucos distances (:248-327);
 2. Weibull fitting of the top-20 distance tails (:331-354);
 3. test-time inference where per-proposal logits are OpenMax-
    recalibrated (unknown mass takes the background slot,
    :358-403, openmax.py:42-86).

CLI: python -m opental_tpu.tools.test_openmax <cfg.yaml> [flags]
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from opental_tpu import factory
from opental_tpu.config import Config, config_from_args
from opental_tpu.data import transforms
from opental_tpu.data.thumos import (ThumosTrainDataset,
                                     get_class_index_map, get_video_anno,
                                     get_video_info)
from opental_tpu.infer.pipeline import (stack_windows, window_offsets)
from opental_tpu.openset.openmax import (OpenMax, accumulate_mavs,
                                         extract_positive_features,
                                         save_mav_dist, weibull_fitting)
from opental_tpu.ops.nms import soft_nms_numpy
from opental_tpu.tools.test import load_variables


def compute_mav_dist(cfg: Config, mav_dist_dir: str,
                     max_clips: Optional[int] = None) -> None:
    clip_length = cfg.get_path('dataset.training.clip_length', 256)
    crop_size = cfg.get_path('dataset.training.crop_size', 96)
    model = factory.build_model(cfg, frame_num=clip_length)
    variables = load_variables(
        model, cfg.testing['checkpoint_path'],
        (1, clip_length, crop_size, crop_size, model.in_channels))
    _, idx_to_class = get_class_index_map(
        cfg.get_path('dataset.class_info_path'))

    infos = get_video_info(cfg.get_path(
        'dataset.training.video_info_path'))
    annos = get_video_anno(infos,
                           cfg.get_path('dataset.training.video_anno_path'),
                           cfg.get_path('dataset.class_info_path'))
    dataset = ThumosTrainDataset(
        cfg.get_path('dataset.training.video_data_path'), infos, annos,
        clip_length=clip_length, crop_size=crop_size,
        stride=cfg.get_path('dataset.training.clip_stride', 30),
        training=False)

    def batch_iter():
        for i in range(len(dataset) if max_clips is None
                       else min(max_clips, len(dataset))):
            s = dataset.sample(i)
            yield {k: v[None] for k, v in s.items()
                   if k in ('clips', 'truths', 'labels', 'gt_mask')}

    coarse, refined = extract_positive_features(
        model, variables, batch_iter(), clip_length, idx_to_class,
        overlap_thresh=cfg.get_path('training.piou', 0.5) or 0.5)
    save_mav_dist(mav_dist_dir, accumulate_mavs(coarse),
                  accumulate_mavs(refined))


def run_openmax_test(cfg: Config, mav_dist_dir: str, tailsize: int = 20,
                     max_videos: Optional[int] = None) -> str:
    te = cfg.testing
    clip_length = cfg.get_path('dataset.testing.clip_length', 256)
    crop_size = cfg.get_path('dataset.testing.crop_size', 96)
    stride = cfg.get_path('dataset.testing.clip_stride', 128)
    model = factory.build_model(cfg, frame_num=clip_length)
    variables = load_variables(
        model, te['checkpoint_path'],
        (1, clip_length, crop_size, crop_size, model.in_channels))
    _, idx_to_class = get_class_index_map(
        cfg.get_path('dataset.class_info_path'))
    num_classes = model.head_classes

    class_names = [idx_to_class[i] for i in sorted(idx_to_class)]
    wm, wpm = weibull_fitting(mav_dist_dir, class_names, tailsize)
    openmax = OpenMax(wm)
    openmax_prop = OpenMax(wpm)

    @jax.jit
    def forward(variables, clips):
        out = model.apply(variables, clips, get_feat=True)
        loc, prop_loc = out['loc'], out['prop_loc']
        pre_w = loc[..., :1] + loc[..., 1:]
        fused = 0.5 * pre_w * prop_loc + loc
        priors = out['priors'][None, :, :1]
        segs = jnp.clip(jnp.concatenate(
            [priors * clip_length - fused[..., :1],
             priors * clip_length + fused[..., 1:]], -1), 0, clip_length)
        return (segs, out['conf'], out['prop_conf'],
                jax.nn.sigmoid(out['center'][..., 0]),
                out['conf_feat'], out['prop_conf_feat'])

    infos = get_video_info(cfg.get_path(
        'dataset.testing.video_info_path'))
    npy = cfg.get_path('dataset.testing.video_data_path')
    result_dict: Dict[str, List[dict]] = {}
    for name in list(infos)[:max_videos]:
        info = infos[name]
        data = transforms.center_crop(
            np.load(os.path.join(npy, name + '.npy')), crop_size)
        offsets = window_offsets(info['sample_count'], clip_length, stride)
        clips = stack_windows(data, offsets, clip_length)
        segs, conf, prop_conf, center, feat, prop_feat = [
            np.asarray(a) for a in forward(variables,
                                           jnp.asarray(clips))]
        n = len(offsets)
        segs, conf, prop_conf = segs[:n], conf[:n], prop_conf[:n]
        center, feat, prop_feat = center[:n], feat[:n], prop_feat[:n]
        seconds = (segs + np.asarray(offsets, np.float32)[:, None, None]) \
            / info['sample_fps']

        # OpenMax recalibration per window batch: drop the background
        # logit column, unknown mass takes its slot (test_openmax.py:158)
        p, k = conf.shape[1], conf.shape[2]
        probs = openmax(conf[..., 1:].reshape(-1, k - 1),
                        feat.reshape(-1, feat.shape[-1])).reshape(n, p, k)
        prop_probs = openmax_prop(
            prop_conf[..., 1:].reshape(-1, k - 1),
            prop_feat.reshape(-1, prop_feat.shape[-1])).reshape(n, p, k)
        scores = (probs + prop_probs) / 2.0 * center[..., None]

        seconds_flat = seconds.reshape(-1, 2)
        scores_flat = scores.reshape(-1, k)
        props = []
        for cl in range(1, num_classes):
            mask = scores_flat[:, cl] > te.get('conf_thresh', 0.01)
            if not mask.any():
                continue
            block = np.concatenate(
                [seconds_flat[mask], scores_flat[mask, cl][:, None]], 1)
            kept, _ = soft_nms_numpy(block, sigma=te.get('nms_sigma', 0.5),
                                     top_k=te.get('top_k', 5000))
            for row in kept:
                if row[2] <= 0:
                    continue
                props.append({'label': idx_to_class[cl],
                              'score': float(row[2]),
                              'segment': [float(row[0]), float(row[1])],
                              'uncertainty': 0.0, 'actionness': 0.0})
        result_dict[name] = props

    payload = {'version': 'THUMOS14', 'results': result_dict,
               'external_data': {}}
    os.makedirs(te.get('output_path', './output'), exist_ok=True)
    out_path = os.path.join(te.get('output_path', './output'),
                            te.get('output_json',
                                   'detection_results.json'))
    with open(out_path, 'w') as f:
        json.dump(payload, f)
    return out_path


def main(argv=None) -> None:
    cfg = config_from_args(argv)
    mav_dist_dir = os.path.join(cfg.testing.get('output_path', './output'),
                                'mav_dist')
    # stage idempotence as in test_openmax.py:407-414
    _, idx_to_class = get_class_index_map(
        cfg.get_path('dataset.class_info_path'))
    ready = all(os.path.exists(os.path.join(mav_dist_dir, f'{n}.npz'))
                for n in idx_to_class.values())
    if not ready:
        compute_mav_dist(cfg, mav_dist_dir)
    print('wrote', run_openmax_test(cfg, mav_dist_dir))


if __name__ == '__main__':
    main()
