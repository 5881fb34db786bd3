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


def _checkpoint_fingerprint(cfg: Config) -> str:
    """Identity of the weights the cache was computed with: realpath
    (resolving the checkpoint-latest symlink) + mtime."""
    path = os.path.realpath(cfg.get_path('testing.checkpoint_path', ''))
    mtime = os.path.getmtime(path) if os.path.exists(path) else 0.0
    flow = cfg.get_path('testing.flow_checkpoint_path', '')
    if flow:
        flow = os.path.realpath(flow)
        mtime = max(mtime, os.path.getmtime(flow)
                    if os.path.exists(flow) else 0.0)
    return f'{path}@{mtime}'


def sync_cache_manifest(cache_dir: str, fingerprint: str) -> None:
    """Drop cached npz entries computed with different weights: the
    skip-if-exists cache would otherwise silently sweep OLD head
    outputs after a retrain/checkpoint repoint (the reference keeps its
    raw outputs in memory per run, so this disk cache is our hazard to
    manage)."""
    import json as _json
    os.makedirs(cache_dir, exist_ok=True)
    manifest_path = os.path.join(cache_dir, 'manifest.json')
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            stale = _json.load(f).get('checkpoint') != fingerprint
        if stale:
            for fn in os.listdir(cache_dir):
                if fn.endswith('.npz'):
                    os.remove(os.path.join(cache_dir, fn))
    with open(manifest_path, 'w') as f:
        _json.dump({'checkpoint': fingerprint}, f)


def cache_raw_outputs(cfg: Config, cache_dir: str,
                      max_videos: Optional[int] = None) -> List[str]:
    """Run the network once per video, caching RAW head outputs so every
    downstream stage can be swept (search_param.py:112-150).

    With `testing.fusion` the RGB and flow streams both run and the
    cached outputs are their head-wise average (fuse_streams) — the
    reference caches both streams and averages at decode time
    (search_param.py:59-71 builds both nets; parse_output averages),
    which is the same math since fusion IS head averaging upstream of
    decode. RGB/flow test npys come from testing.rgb_data_path /
    testing.flow_data_path (reference :49-52).

    The cache is keyed to the checkpoint identity (realpath + mtime):
    a retrained/re-pointed checkpoint invalidates stale npz entries
    instead of silently sweeping old weights."""
    import jax.numpy as jnp

    from opental_tpu.data import transforms
    from opental_tpu.infer.pipeline import (ingest_windows,
                                            stack_windows_u8,
                                            window_offsets)

    sync_cache_manifest(cache_dir, _checkpoint_fingerprint(cfg))

    pipe, video_infos, _ = _cached_pipeline(cfg)
    fusion = pipe.flow_model is not None
    npy = (cfg.get_path('testing.rgb_data_path',
                        './datasets/thumos14/test_npy/') if fusion
           else cfg.get_path('dataset.testing.video_data_path'))
    flow_dir = cfg.get_path('testing.flow_data_path',
                            './datasets/thumos14/test_flow_npy/')
    names = list(video_infos)[:max_videos]
    import jax
    # uint8 window staging + in-jit normalize, like every other driver
    # since round 5 (4x less host->device transfer on the one full
    # network pass this tool makes)
    if fusion:
        from opental_tpu.infer.decode import fuse_streams

        @jax.jit
        def raw_forward(v, c, val, fvar, fc, fval):
            out = pipe.model.apply(v, ingest_windows(c, val))
            fout = pipe.flow_model.apply(fvar, ingest_windows(fc, fval))
            return fuse_streams(out, fout)
    else:
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
        if fusion:
            fdata = np.load(os.path.join(flow_dir, name + '.npy'))
            fclips, fvalid = stack_windows_u8(
                transforms.center_crop(fdata, pipe.crop_size), offsets,
                pipe.clip_length)
            out = raw_forward(pipe.variables, jnp.asarray(clips),
                              jnp.asarray(valid), pipe.flow_variables,
                              jnp.asarray(fclips), jnp.asarray(fvalid))
        else:
            out = raw_forward(pipe.variables, jnp.asarray(clips),
                              jnp.asarray(valid))
        n = len(offsets)
        # cache the FULL bucket-padded rows + the real count: trimming
        # to n would give the sweep's jitted decode a distinct shape
        # per video (tens of 3-5 min remote recompiles); padded rows
        # are sliced off after decode
        arrays = {'offsets': np.asarray(offsets, np.float32),
                  'sample_fps': np.float32(info['sample_fps']),
                  'n': np.int32(n)}
        for k in RAW_KEYS:
            v = out.get(k)
            if v is None:
                continue
            arrays[k] = np.asarray(v, np.float32)
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
    # always assign: a conf_thresh=None candidate after a non-None one
    # must restore the config default, not inherit the previous sweep
    # value (the cached pipeline persists across candidates)
    pipe.conf_thresh = (conf_thresh if conf_thresh is not None
                        else cfg.get_path('testing.conf_thresh', 0.01))
    decode = _jitted_decode(pipe.clip_length, pipe.use_edl, pipe.os_head,
                            'dirichlet' if pipe.use_edl else 'softmax',
                            pipe.evidence, pipe.use_gcpl)
    results: Dict[str, list] = {}
    for name in names:
        z = np.load(os.path.join(cache_dir, name + '.npz'))
        out = {k: z[k] for k in RAW_KEYS if k in z.files}
        for k in RAW_KEYS:
            out.setdefault(k, None)
        # caches store bucket-padded window rows (one decode jit shape
        # per bucket, not per video); slice the real count after decode
        n = int(z['n']) if 'n' in z.files else len(z['offsets'])
        dec = decode(out)
        seconds = (np.asarray(dec.segments)[:n]
                   + z['offsets'][:, None, None]) / float(z['sample_fps'])
        unct = (np.asarray(dec.uncertainty)[:n]
                if dec.uncertainty is not None else None)
        act = (np.asarray(dec.actionness)[:n]
               if dec.actionness is not None else None)
        results[name] = pipe._post_process(seconds,
                                           np.asarray(dec.scores)[:n],
                                           unct, act)
    tag = f'search_sigma_{sigma:.2f}' + (
        f'_ct_{conf_thresh:g}' if conf_thresh is not None else '')
    pred = proposals_to_json(results, idx_to_class, workdir,
                             tag + '.json')
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
        # hold the cfg object too: keying by id() alone would let a
        # garbage-collected Config's recycled id alias another config's
        # pipeline (wrong weights, no error)
        _PIPE_CACHE[key] = (cfg, build_pipeline(cfg))
    return _PIPE_CACHE[key][1]


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
