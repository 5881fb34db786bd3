"""Post-processing hyper-parameter grid search.

Reference: AFSD/thumos14/search_param.py — cache raw network outputs
once, then grid-search post-processing parameters (soft-NMS sigma) by
re-running decode + eval per candidate (:112-150, :210-275). Here the
cache holds the device-decoded per-video arrays (segments in seconds,
fused scores, uncertainty, actionness), so each candidate is pure host
numpy: filter + soft-NMS + JSON + mAP.

CLI: python -m opental_tpu.tools.search_param <cfg.yaml> --gt_json ...
     [--sigmas 0.3 0.4 0.5 ...]
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from opental_tpu.config import Config, build_arg_parser, config_from_args
from opental_tpu.data.thumos import get_class_index_map, get_video_info
from opental_tpu.eval.detection import DetectionEvaluator
from opental_tpu.infer.pipeline import proposals_to_json
from opental_tpu.tools.test import build_pipeline


def cache_raw_outputs(cfg: Config, cache_dir: str,
                      max_videos: Optional[int] = None) -> List[str]:
    """Run inference once, caching pre-NMS decoded arrays per video."""
    os.makedirs(cache_dir, exist_ok=True)
    pipe, video_infos, _ = build_pipeline(cfg)
    npy = cfg.get_path('dataset.testing.video_data_path')
    names = list(video_infos)[:max_videos]
    for name in names:
        out_file = os.path.join(cache_dir, name + '.npz')
        if os.path.exists(out_file):
            continue
        info = video_infos[name]
        data = np.load(os.path.join(npy, name + '.npy'))

        # reuse the pipeline internals up to (seconds, conf, unct, act)
        from opental_tpu.data import transforms
        from opental_tpu.infer.pipeline import (stack_windows,
                                                window_offsets)
        import jax.numpy as jnp
        cropped = transforms.center_crop(data, pipe.crop_size)
        offsets = window_offsets(info['sample_count'], pipe.clip_length,
                                 pipe.stride)
        clips = stack_windows(cropped, offsets, pipe.clip_length)
        dec = pipe._forward_decode(pipe.variables, jnp.asarray(clips),
                                   None, None)
        n = len(offsets)
        seconds = (np.asarray(dec.segments)[:n]
                   + np.asarray(offsets, np.float32)[:, None, None]) \
            / info['sample_fps']
        np.savez(out_file, seconds=seconds,
                 conf=np.asarray(dec.scores)[:n],
                 unct=(np.asarray(dec.uncertainty)[:n]
                       if dec.uncertainty is not None else None),
                 act=(np.asarray(dec.actionness)[:n]
                      if dec.actionness is not None else None))
    return names


def evaluate_candidate(cfg: Config, cache_dir: str, names: List[str],
                       sigma: float, gt_json: str, workdir: str) -> float:
    pipe, _, idx_to_class = _cached_pipeline(cfg)
    pipe.nms_sigma = sigma
    results: Dict[str, list] = {}
    for name in names:
        z = np.load(os.path.join(cache_dir, name + '.npz'),
                    allow_pickle=True)
        unct = z['unct'] if z['unct'].dtype != object else None
        act = z['act'] if z['act'].dtype != object else None
        results[name] = pipe._post_process(z['seconds'], z['conf'], unct,
                                           act)
    pred = proposals_to_json(results, idx_to_class, workdir,
                             f'search_sigma_{sigma:.2f}.json')
    ev = DetectionEvaluator(gt_json, pred,
                            cfg.get_path('dataset.class_info_path'),
                            tiou_thresholds=np.asarray([0.3, 0.4, 0.5,
                                                        0.6, 0.7]),
                            subset=['test'], openset=False)
    maps, avg_map, _ = ev.evaluate('AP')
    return float(avg_map)


_PIPE_CACHE: dict = {}


def _cached_pipeline(cfg: Config):
    key = id(cfg)
    if key not in _PIPE_CACHE:
        _PIPE_CACHE[key] = build_pipeline(cfg)
    return _PIPE_CACHE[key]


def main(argv=None) -> None:
    parser = build_arg_parser()
    parser.add_argument('--gt_json', type=str, required=True)
    parser.add_argument('--sigmas', nargs='+', type=float,
                        default=[0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.85,
                                 0.9, 0.95, 1.0])
    args, _ = parser.parse_known_args(argv)
    cfg = config_from_args([a for a in (argv or [])
                            if not a.startswith('--gt_json')
                            and not a.startswith('--sigmas')])
    out_path = cfg.testing.get('output_path', './output')
    cache_dir = os.path.join(out_path, 'raw_cache')
    names = cache_raw_outputs(cfg, cache_dir)
    best = (None, -1.0)
    for sigma in args.sigmas:
        score = evaluate_candidate(cfg, cache_dir, names, sigma,
                                   args.gt_json, out_path)
        print(f'sigma={sigma:.2f}: average mAP={score:.5f}')
        if score > best[1]:
            best = (sigma, score)
    print(f'best: sigma={best[0]} (average mAP={best[1]:.5f})')


if __name__ == '__main__':
    main()
