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
from opental_tpu.infer.pipeline import (ingest_windows, stack_windows,
                                        stack_windows_u8, window_offsets)
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
    assert not model.os_head and not model.use_edl, (
        'OpenMax requires the closed-set softmax architecture '
        '(see OpenMaxInference)')
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
        # MAV extraction scans the whole TRAINING set: ship raw uint8
        # and normalize inside the jitted feature forward (4x less
        # transfer, same as every other driver since round 5)
        training=False, uint8_ingest=True)

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
                  accumulate_mavs(refined),
                  class_names=list(idx_to_class.values()))


class OpenMaxInference:
    """Recalibrated window-batched inference shared by the in-domain
    and cross-data OpenMax drivers.

    u8_staging (default ON, like every other driver): windows ship as
    raw uint8 with per-window frames-valid and normalize inside the
    jitted forward (ingest_windows) — 4x less host->device transfer
    than f32 staging, which matters triply here because the OpenMax
    protocol runs a train-set MAV pass + test pass + cross-data pass
    (reference test_openmax.py:248-327). Equivalent to the f32 path up
    to the jitted /255 lowering's 1 ulp (tests/test_openmax_parity.py).
    """

    def __init__(self, cfg: Config, mav_dist_dir: str, tailsize: int = 20,
                 u8_staging: bool = True):
        te = cfg.testing
        self.cfg = cfg
        self.clip_length = cfg.get_path('dataset.testing.clip_length', 256)
        self.crop_size = cfg.get_path('dataset.testing.crop_size', 96)
        self.stride = cfg.get_path('dataset.testing.clip_stride', 128)
        self.conf_thresh = te.get('conf_thresh', 0.01)
        self.nms_sigma = te.get('nms_sigma', 0.5)
        self.top_k = te.get('top_k', 5000)
        model = factory.build_model(cfg, frame_num=self.clip_length)
        assert not model.os_head and not model.use_edl, (
            'OpenMax is a closed-set softmax baseline: it recalibrates '
            'background-column logits (decode_output drops conf[:, 1:], '
            'test_openmax.py:158) and the reference openmax config sets '
            'neither os_head nor EDL (configs/thumos14_openmax.yaml). '
            'Use tools/test.py for os_head/EDL checkpoints.')
        self.variables = load_variables(
            model, te['checkpoint_path'],
            (1, self.clip_length, self.crop_size, self.crop_size,
             model.in_channels))
        _, self.idx_to_class = get_class_index_map(
            cfg.get_path('dataset.class_info_path'))
        self.num_classes = model.head_classes
        class_names = [self.idx_to_class[i]
                       for i in sorted(self.idx_to_class)]
        wm, wpm = weibull_fitting(mav_dist_dir, class_names, tailsize)
        self.openmax = OpenMax(wm)
        self.openmax_prop = OpenMax(wpm)
        clip_length = self.clip_length
        self.u8_staging = u8_staging

        def forward(variables, clips):
            out = model.apply(variables, clips, get_feat=True)
            loc, prop_loc = out['loc'], out['prop_loc']
            pre_w = loc[..., :1] + loc[..., 1:]
            fused = 0.5 * pre_w * prop_loc + loc
            priors = out['priors'][None, :, :1]
            segs = jnp.clip(jnp.concatenate(
                [priors * clip_length - fused[..., :1],
                 priors * clip_length + fused[..., 1:]], -1), 0,
                clip_length)
            return (segs, out['conf'], out['prop_conf'],
                    jax.nn.sigmoid(out['center'][..., 0]),
                    out['conf_feat'], out['prop_conf_feat'])

        self._forward = jax.jit(forward)

        @jax.jit
        def forward_u8(variables, clips_u8, valid):
            return forward(variables, ingest_windows(clips_u8, valid))

        self._forward_u8 = forward_u8

    def run_video(self, data: np.ndarray, sample_count: int,
                  sample_fps: float) -> List[dict]:
        data = transforms.center_crop(data, self.crop_size)
        offsets = window_offsets(sample_count, self.clip_length,
                                 self.stride)
        if self.u8_staging:
            clips, valid = stack_windows_u8(data, offsets,
                                            self.clip_length)
            outs = self._forward_u8(self.variables, jnp.asarray(clips),
                                    jnp.asarray(valid))
        else:
            clips = stack_windows(data, offsets, self.clip_length)
            outs = self._forward(self.variables, jnp.asarray(clips))
        segs, conf, prop_conf, center, feat, prop_feat = [
            np.asarray(a) for a in outs]
        n = len(offsets)
        segs, conf, prop_conf = segs[:n], conf[:n], prop_conf[:n]
        center, feat, prop_feat = center[:n], feat[:n], prop_feat[:n]
        seconds = (segs + np.asarray(offsets, np.float32)[:, None, None]) \
            / sample_fps

        # OpenMax recalibration per window batch: drop the background
        # logit column, unknown mass takes its slot (test_openmax.py:158)
        p, k = conf.shape[1], conf.shape[2]
        probs = self.openmax(
            conf[..., 1:].reshape(-1, k - 1),
            feat.reshape(-1, feat.shape[-1])).reshape(n, p, k)
        prop_probs = self.openmax_prop(
            prop_conf[..., 1:].reshape(-1, k - 1),
            prop_feat.reshape(-1, prop_feat.shape[-1])).reshape(n, p, k)
        scores = (probs + prop_probs) / 2.0 * center[..., None]

        seconds_flat = seconds.reshape(-1, 2)
        scores_flat = scores.reshape(-1, k)
        props: List[dict] = []
        for cl in range(1, self.num_classes):
            mask = scores_flat[:, cl] > self.conf_thresh
            if not mask.any():
                continue
            block = np.concatenate(
                [seconds_flat[mask], scores_flat[mask, cl][:, None]], 1)
            kept, _ = soft_nms_numpy(block, sigma=self.nms_sigma,
                                     top_k=self.top_k)
            for row in kept:
                if row[2] <= 0:
                    continue
                props.append({'label': self.idx_to_class[cl],
                              'score': float(row[2]),
                              'segment': [float(row[0]), float(row[1])],
                              'uncertainty': 0.0, 'actionness': 0.0})
        return props


def run_openmax_test(cfg: Config, mav_dist_dir: str, tailsize: int = 20,
                     max_videos: Optional[int] = None) -> str:
    te = cfg.testing
    om = OpenMaxInference(cfg, mav_dist_dir, tailsize)
    infos = get_video_info(cfg.get_path(
        'dataset.testing.video_info_path'))
    npy = cfg.get_path('dataset.testing.video_data_path')
    result_dict: Dict[str, List[dict]] = {}
    for name in list(infos)[:max_videos]:
        info = infos[name]
        data = np.load(os.path.join(npy, name + '.npy'))
        result_dict[name] = om.run_video(data, info['sample_count'],
                                         info['sample_fps'])

    payload = {'version': 'THUMOS14', 'results': result_dict,
               'external_data': {}}
    os.makedirs(te.get('output_path', './output'), exist_ok=True)
    out_path = os.path.join(te.get('output_path', './output'),
                            te.get('output_json',
                                   'detection_results.json'))
    with open(out_path, 'w') as f:
        json.dump(payload, f)
    return out_path


def run_openmax_cross_data(cfg: Config, mav_dist_dir: str,
                           anet_video_info: str, anet_npy_dir: str,
                           overlapping_class_file: str,
                           tailsize: int = 20,
                           max_videos: Optional[int] = None) -> str:
    """OpenMax over ANet unknowns merged with the THUMOS results
    (reference test_openmax_cross_data.py)."""
    from opental_tpu.data.anet import get_video_info as anet_info
    from opental_tpu.tools.test_cross_data import exclude_overlapping
    te = cfg.testing
    thumos_path = run_openmax_test(cfg, mav_dist_dir, tailsize, max_videos)
    with open(thumos_path) as f:
        thumos_out = json.load(f)

    om = OpenMaxInference(cfg, mav_dist_dir, tailsize)
    infos = anet_info(anet_video_info, 'validation')
    results: Dict[str, List[dict]] = {}
    names = [n for n in infos
             if os.path.exists(os.path.join(anet_npy_dir, n + '.npy'))]
    for name in names[:max_videos]:
        # the reference pads short ANet videos to 768 frames with f32
        # 127.5 (test_cross_data.py:80-89); 127.5 normalizes to exactly
        # 0.0 — the same value both staging paths fill beyond the real
        # frames (stack_windows pad / u8 frames-valid zero-mask) — so
        # shipping the RAW uint8 frames with the padded sample_count is
        # bit-equivalent. Host 127.5-padding here would TRUNCATE to
        # uint8 127 in the u8_staging path (-0.0039 after normalize,
        # inside frames-valid): same fix as test_cross_data's
        # _anet_item_raw.
        data = np.load(os.path.join(anet_npy_dir, name + '.npy'))
        key = name[2:] if name.startswith('v_') else name
        results[key] = om.run_video(data, max(data.shape[0], 768),
                                    infos[name]['fps'])
    filtered = exclude_overlapping(results, infos, overlapping_class_file)
    merged = dict(thumos_out['results'])
    merged.update(filtered)
    out_path = os.path.join(te.get('output_path', './output'),
                            'thumos14_anet_merged.json')
    with open(out_path, 'w') as f:
        json.dump({'version': 'THUMOS14', 'results': merged,
                   'external_data': {}}, f)
    return out_path


def main(argv=None) -> None:
    argv = list(argv) if argv is not None else None
    import sys
    raw = argv if argv is not None else sys.argv[1:]
    cross = '--cross_data' in raw
    raw = [a for a in raw if a != '--cross_data']
    cfg = config_from_args(raw)
    mav_dist_dir = os.path.join(cfg.testing.get('output_path', './output'),
                                'mav_dist')
    # stage idempotence as in test_openmax.py:407-414
    _, idx_to_class = get_class_index_map(
        cfg.get_path('dataset.class_info_path'))
    ready = all(os.path.exists(os.path.join(mav_dist_dir, f'{n}.npz'))
                for n in idx_to_class.values())
    if not ready:
        compute_mav_dist(cfg, mav_dist_dir)
    if cross:
        print('wrote', run_openmax_cross_data(
            cfg, mav_dist_dir,
            'datasets/activitynet/annotations/video_info_train_val.json',
            'datasets/activitynet/train_val_npy_112',
            'datasets/activitynet/overlapping_classes_in_thumos.txt'))
    else:
        print('wrote', run_openmax_test(cfg, mav_dist_dir))


if __name__ == '__main__':
    main()
