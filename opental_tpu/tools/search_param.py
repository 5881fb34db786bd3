"""Post-processing hyper-parameter grid search.

Reference: AFSD/thumos14/search_param.py — run the network ONCE caching
its raw head outputs per video (:112-150), then grid-search
post-processing parameters by re-running everything downstream of the
network (decode -> filter -> soft-NMS -> eval) per candidate
(:210-275). Because the cache is raw (loc/conf/prop_loc/prop_conf/
center/act/unct per window), any post-network stage is sweepable:
soft-NMS sigma, confidence threshold, score composition.

CLI: python -m opental_tpu.tools.search_param <cfg.yaml> --gt_json ...
     [--sigmas 0.3 ...] [--conf_threshs 0.01 ...]
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional

import numpy as np

from opental_tpu.config import (Config, build_arg_parser,
                                config_from_namespace)
from opental_tpu.eval.detection import DetectionEvaluator
from opental_tpu.infer.pipeline import proposals_to_json

# raw head outputs the decode stage consumes (test.py:79-109)
RAW_KEYS = ('loc', 'conf', 'prop_loc', 'prop_conf', 'center', 'priors',
            'unct', 'prop_unct', 'act', 'prop_act')


def cache_raw_outputs(cfg: Config, cache_dir: str,
                      max_videos: Optional[int] = None) -> List[str]:
    """Run the network once per video, caching RAW head outputs so every
    downstream stage can be swept (search_param.py:112-150)."""
    import jax.numpy as jnp

    from opental_tpu.data import transforms
    from opental_tpu.infer.pipeline import (ingest_windows,
                                            stack_windows_u8,
                                            window_offsets)
    from opental_tpu.tools.test import build_pipeline

    os.makedirs(cache_dir, exist_ok=True)
    pipe, video_infos, _ = build_pipeline(cfg)
    npy = cfg.get_path('dataset.testing.video_data_path')
    names = list(video_infos)[:max_videos]
    import jax
    # uint8 window staging + in-jit normalize, like every other driver
    # since round 5 (4x less host->device transfer on the one full
    # network pass this tool makes)
    raw_forward = jax.jit(
        lambda v, c, val: pipe.model.apply(v, ingest_windows(c, val)))
    for name in names:
        out_file = os.path.join(cache_dir, name + '.npz')
        if os.path.exists(out_file):
            continue
        info = video_infos[name]
        data = np.load(os.path.join(npy, name + '.npy'))
        cropped = transforms.center_crop(data, pipe.crop_size)
        offsets = window_offsets(info['sample_count'], pipe.clip_length,
                                 pipe.stride)
        clips, valid = stack_windows_u8(cropped, offsets,
                                        pipe.clip_length)
        out = raw_forward(pipe.variables, jnp.asarray(clips),
                          jnp.asarray(valid))
        n = len(offsets)
        arrays = {'offsets': np.asarray(offsets, np.float32),
                  'sample_fps': np.float32(info['sample_fps'])}
        for k in RAW_KEYS:
            v = out.get(k)
            if v is None:
                continue
            v = np.asarray(v, np.float32)
            arrays[k] = v if k == 'priors' else v[:n]
        np.savez(out_file, **arrays)
    return names


@functools.lru_cache(maxsize=4)
def _jitted_decode(clip_length: int, use_edl: bool, os_head: bool,
                   score_func: str, evidence: str, negate_conf: bool):
    import jax

    from opental_tpu.infer.decode import decode_windows
    return jax.jit(lambda out: decode_windows(
        out, clip_length, use_edl=use_edl, os_head=os_head,
        score_func=score_func, evidence=evidence,
        negate_conf=negate_conf))


def evaluate_candidate(cfg: Config, cache_dir: str, names: List[str],
                       gt_json: str, workdir: str, sigma: float,
                       conf_thresh: Optional[float] = None) -> float:
    """Re-run decode -> filter -> NMS -> JSON -> mAP from the raw cache
    with candidate post-processing parameters."""
    pipe, _, idx_to_class = _cached_pipeline(cfg)
    pipe.nms_sigma = sigma
    if conf_thresh is not None:
        pipe.conf_thresh = conf_thresh
    decode = _jitted_decode(pipe.clip_length, pipe.use_edl, pipe.os_head,
                            'dirichlet' if pipe.use_edl else 'softmax',
                            pipe.evidence, pipe.use_gcpl)
    results: Dict[str, list] = {}
    for name in names:
        z = np.load(os.path.join(cache_dir, name + '.npz'))
        out = {k: z[k] for k in RAW_KEYS if k in z.files}
        for k in RAW_KEYS:
            out.setdefault(k, None)
        dec = decode(out)
        seconds = (np.asarray(dec.segments)
                   + z['offsets'][:, None, None]) / float(z['sample_fps'])
        unct = (np.asarray(dec.uncertainty)
                if dec.uncertainty is not None else None)
        act = (np.asarray(dec.actionness)
               if dec.actionness is not None else None)
        results[name] = pipe._post_process(seconds, np.asarray(dec.scores),
                                           unct, act)
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
    from opental_tpu.tools.test import build_pipeline
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
    parser.add_argument('--conf_threshs', nargs='+', type=float,
                        default=[None])
    args = parser.parse_args(argv)
    cfg = config_from_namespace(args)
    out_path = cfg.testing.get('output_path', './output')
    cache_dir = os.path.join(out_path, 'raw_cache')
    names = cache_raw_outputs(cfg, cache_dir)
    best = (None, None, -1.0)
    for ct in args.conf_threshs:
        for sigma in args.sigmas:
            score = evaluate_candidate(cfg, cache_dir, names,
                                       args.gt_json, out_path, sigma,
                                       conf_thresh=ct)
            tag = f'sigma={sigma:.2f}' + (
                f' conf_thresh={ct}' if ct is not None else '')
            print(f'{tag}: average mAP={score:.5f}')
            if score > best[2]:
                best = (sigma, ct, score)
    print(f'best: sigma={best[0]} conf_thresh={best[1]} '
          f'(average mAP={best[2]:.5f})')


if __name__ == '__main__':
    main()
