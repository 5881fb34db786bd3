"""ActivityNet inference CLI:
python -m opental_tpu.tools.test_anet <cfg.yaml> [flags].

Reference: AFSD/anet/test.py (single 768-frame window per video;
multi-GPU sharding via multiprocessing, :195-273). TPU-native design:
since every video is exactly one window, videos batch directly into the
window axis — one jitted forward scores many videos at once, replacing
the reference's process-per-GPU fan-out. Raw-uint8 npys ship as raw
bytes with per-video frames-valid and normalize on device (4x less
host->device transfer; exact — the reference's 127.5 pad normalizes to
0.0, see prepare_window_u8).

Output keys strip the 'v_' prefix and segments clamp to the video
duration (anet/test.py:183-239). The binary-actionness variant
(num_classes=2 + external video-level classes, test_binary.py) is
supported via --binary and cuhk-style classifier files.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from opental_tpu import factory
from opental_tpu.config import config_from_args
from opental_tpu.data import transforms
from opental_tpu.data.anet import get_video_info
from opental_tpu.infer.decode import decode_windows
from opental_tpu.ops.nms import soft_nms_device, soft_nms_numpy
from opental_tpu.tools.test import load_variables


def build_device_post(cls_cols, use_edl: bool, os_head: bool,
                      binary: bool, sigma: float, top_k: int,
                      n_candidates: int = 512):
    """One jitted call post-processes a whole video batch: per-video
    per-class filter + soft-NMS vmapped over (videos, classes) on
    device, replacing the host's videos x classes python NMS loops (the
    reference's per-proposal hot spot, anet/test.py:134-160). With 189
    ANet priors the n_candidates preselect keeps every candidate, so
    results equal the host path exactly (soft_nms_device ==
    soft_nms_numpy, tests/test_soft_nms.py)."""
    conf_floor = 1e-9 if binary else 0.001   # test_binary.py:125
    # binary mode also lowers the soft-NMS score floor to 1e-9
    # (test_binary.py:155 vs test.py:166's 0.001): low-score proposals
    # survive NMS and only die at the kept-row score>0 filter
    nms_floor = 1e-9 if binary else 1e-3

    def post(segments, scores, unct, act, fps):
        # segments (B,P,2) frames; scores (B,P,K); fps (B,)
        seconds = segments / fps[:, None, None]
        k_eff = min(n_candidates, segments.shape[1])

        def per_video(sec, sc, un, ac):
            def per_class(cl_scores):
                m = cl_scores > conf_floor
                if os_head and not binary:
                    m = m & (ac > 0.5)          # (anet/test.py:135)
                s = jnp.where(m, cl_scores, 0.0)
                top_sc, idx = jax.lax.top_k(s, k_eff)
                cols = [sec[idx], top_sc[:, None]]
                if use_edl:
                    cols.append(un[idx][:, None])
                if os_head:
                    cols.append(ac[idx][:, None])
                block = jnp.concatenate(cols, -1)
                kept, _ = soft_nms_device(block, sigma=sigma,
                                          top_k=top_k,
                                          score_threshold=nms_floor,
                                          valid=top_sc > 0)
                return kept

            stacked = jnp.stack([sc[:, c] for c in cls_cols], 0)
            return jax.vmap(per_class)(stacked)

        zeros = jnp.zeros(segments.shape[:2], segments.dtype)
        return jax.vmap(per_video)(seconds, scores,
                                   unct if use_edl else zeros,
                                   act if os_head else zeros)

    return jax.jit(post)


def load_class_names(class_info_path: str) -> Dict[int, str]:
    with open(class_info_path) as f:
        lines = [ln.strip() for ln in f.read().splitlines() if ln.strip()]
    return {i + 1: name for i, name in enumerate(lines)}


def prepare_window(npy_path: str, clip_length: int, crop_size: int
                   ) -> np.ndarray:
    data = np.load(npy_path).astype(np.float32)
    data = transforms.center_crop(data, crop_size)
    t = data.shape[0]
    if t < clip_length:
        pad = np.full((clip_length - t,) + data.shape[1:], 127.5,
                      np.float32)  # (anet/test.py:87-89)
        data = np.concatenate([data, pad], 0)
    else:
        data = data[:clip_length]
    return (data / 255.0) * 2.0 - 1.0


def prepare_window_u8(npy_path: str, clip_length: int, crop_size: int
                      ) -> tuple:
    """prepare_window's uint8 twin: ship raw bytes (4x less transfer)
    and normalize on device. The reference's 127.5 pad (anet/test.py:
    87-89) normalizes to exactly 0.0, so zero-filling frames >= valid
    inside the jitted ingest (infer.pipeline.ingest_windows) reproduces
    it bit-for-bit up to the jitted /255 lowering (<=1 ulp)."""
    from opental_tpu.infer.pipeline import _require_u8
    data = np.load(npy_path)
    # staging_u8 is decided from the FIRST npy of the run; a stray
    # float npy later would silently truncate into the uint8 buffer
    _require_u8(data, f'frames ({os.path.basename(npy_path)})')
    data = transforms.center_crop(data, crop_size)
    t = data.shape[0]
    valid = min(t, clip_length)
    out = np.zeros((clip_length,) + data.shape[1:], np.uint8)
    out[:valid] = data[:valid]
    return out, np.int32(valid)


def pad_video_batch(arr: Optional[np.ndarray], video_batch: int
                    ) -> Optional[np.ndarray]:
    """Pad a ragged tail chunk to video_batch by repeating the last
    row: without it the final chunk's smaller batch dim retraces
    forward_decode AND the device post (~minutes per extra jit through
    the remote compile helper); padded rows are never read back (the
    result loop enumerates the real chunk only)."""
    if arr is None or arr.shape[0] == video_batch:
        return arr
    reps = np.repeat(arr[-1:], video_batch - arr.shape[0], 0)
    return np.concatenate([arr, reps], 0)


def run_test_anet(cfg, max_videos: Optional[int] = None,
                  video_batch: int = 4, binary: bool = False,
                  cls_score_file: Optional[str] = None,
                  subset: str = 'validation',
                  video_names=None) -> str:
    te = cfg.testing
    clip_length = cfg.get_path('dataset.testing.clip_length', 768)
    crop_size = cfg.get_path('dataset.testing.crop_size', 96)
    flags = factory.model_flags(cfg)
    use_edl, os_head = flags['use_edl'], flags['os_head']
    num_classes = flags['num_classes'] - (1 if os_head else 0)
    fusion = te.get('fusion', False)

    model = factory.build_model(cfg, frame_num=clip_length,
                                dtype=jnp.bfloat16)
    variables = load_variables(
        model, te['checkpoint_path'],
        (1, clip_length, crop_size, crop_size, model.in_channels))
    flow_model = flow_vars = None
    if fusion:
        # RGB+flow late fusion by head-wise averaging
        # (AFSD/anet/test_fusion.py)
        flow_model = factory.build_model(cfg, frame_num=clip_length,
                                         dtype=jnp.bfloat16,
                                         in_channels=2)
        flow_vars = load_variables(
            flow_model, te['flow_checkpoint_path'],
            (1, clip_length, crop_size, crop_size, 2))

    score_func = 'dirichlet' if use_edl else 'softmax'

    def _forward_decode(variables, clips, flow_variables=None,
                        flow_clips=None):
        out = model.apply(variables, clips)
        if flow_model is not None and flow_clips is not None:
            from opental_tpu.infer.decode import fuse_streams
            out = fuse_streams(out, flow_model.apply(flow_variables,
                                                     flow_clips))
        return decode_windows(out, clip_length, use_edl=use_edl,
                              os_head=os_head, score_func=score_func,
                              evidence=flags['evidence'])

    forward_decode = jax.jit(_forward_decode)

    @jax.jit
    def forward_decode_u8(variables, clips_u8, valid, flow_variables=None,
                          flow_u8=None, fvalid=None):
        # raw uint8 video batches + per-video frames-valid normalize on
        # device (exact: the 127.5 pad normalizes to 0.0 — see
        # prepare_window_u8)
        from opental_tpu.infer.pipeline import ingest_windows
        clips = ingest_windows(clips_u8, valid)
        flow_clips = (None if flow_u8 is None
                      else ingest_windows(flow_u8, fvalid))
        return _forward_decode(variables, clips, flow_variables,
                               flow_clips)

    video_infos = get_video_info(
        cfg.get_path('dataset.testing.video_info_path'), subset)
    idx_to_class = load_class_names(cfg.get_path(
        'dataset.class_info_path'))
    npy_dir = cfg.get_path('dataset.testing.video_mp4_path')
    flow_dir = te.get('flow_data_path', npy_dir)
    names = [n for n in video_infos
             if os.path.exists(os.path.join(npy_dir, n + '.npy'))]
    if video_names is not None:
        # caller-restricted video set (threshold calibration intersects
        # with the classifier-file videos, anet/threshold.py:35-38)
        allowed = set(video_names)
        names = [n for n in names if n in allowed]
    names = names[:max_videos]

    # uint8 staging when the stored npys are raw bytes (ours and the
    # reference's both are); pre-normalized float npys fall back to the
    # f32 path. Decided once so the whole run uses one jit graph.
    def _npy_is_u8(d, n):
        return np.load(os.path.join(d, n + '.npy'),
                       mmap_mode='r').dtype == np.uint8
    staging_u8 = bool(names) and _npy_is_u8(npy_dir, names[0]) and (
        not fusion or _npy_is_u8(flow_dir, names[0]))

    # binary-actionness mode: a video-level classifier file supplies the
    # labels; format {'results': {name: [200 scores]}, 'class': [200
    # names]} (test_binary.py:195-211, result_tsn_val.json schema)
    cls_scores: Dict[str, List[float]] = {}
    cls_actions: List[str] = []
    if binary and cls_score_file:
        with open(cls_score_file) as f:
            cls_data = json.load(f)
        cls_scores = cls_data['results']
        cls_actions = cls_data['class']

    def _stage(d, chunk):
        if staging_u8:
            outs = [prepare_window_u8(os.path.join(d, n + '.npy'),
                                      clip_length, crop_size)
                    for n in chunk]
            return (np.stack([o[0] for o in outs]),
                    np.asarray([o[1] for o in outs], np.int32))
        return np.stack([prepare_window(
            os.path.join(d, n + '.npy'), clip_length, crop_size)
            for n in chunk]), None

    def _pad_batch(arr):
        return pad_video_batch(arr, video_batch)

    def assemble(i):
        # runs on the prefetch thread: load + crop (+ normalize on the
        # f32 fallback) batch i+1 while the device scores batch i
        # (np.load drops the GIL)
        chunk = names[i:i + video_batch]
        clips, valid = _stage(npy_dir, chunk)
        clips, valid = _pad_batch(clips), _pad_batch(valid)
        fclips = fvalid = None
        if fusion:
            fclips, fvalid = _stage(flow_dir, chunk)
            fclips = jnp.asarray(_pad_batch(fclips))
            fvalid = _pad_batch(fvalid)
        return i, chunk, clips, valid, fclips, fvalid

    from opental_tpu.data.prefetch import prefetch
    cls_rng = list(range(0, num_classes) if os_head
                   else range(1, num_classes))
    sigma = te.get('nms_sigma', 0.85)
    top_k = te.get('top_k', 5000)
    # fused on-device post-processing by default (189 priors fit the
    # candidate preselect, so results == host path; testing.device_nms:
    # false restores the host numpy loop)
    post_fn = (build_device_post(cls_rng, use_edl, os_head, binary,
                                 sigma, top_k,
                                 te.get('n_candidates', 512))
               if te.get('device_nms', True) else None)
    result_dict: Dict[str, List[dict]] = {}
    for i, chunk, clips, valid, fclips, fvalid in prefetch(
            range(0, len(names), video_batch), assemble):
        if staging_u8:
            dec = forward_decode_u8(variables, jnp.asarray(clips),
                                    jnp.asarray(valid), flow_vars,
                                    fclips,
                                    None if fvalid is None
                                    else jnp.asarray(fvalid))
        else:
            dec = forward_decode(variables, jnp.asarray(clips),
                                 flow_vars, fclips)
        if post_fn is not None:
            fps_list = [video_infos[n]['fps'] for n in chunk]
            # pad to video_batch with the last fps (matches _pad_batch;
            # 1.0 would divide the padded rows' segments by ~0-fps)
            fps_list += [fps_list[-1]] * (video_batch - len(fps_list))
            fps_arr = jnp.asarray(fps_list, jnp.float32)
            blocks = np.asarray(post_fn(dec.segments, dec.scores,
                                        dec.uncertainty, dec.actionness,
                                        fps_arr))   # (B, C, k_eff, D+1)
        else:
            segs = np.asarray(dec.segments)
            scores = np.asarray(dec.scores)
            unct = (np.asarray(dec.uncertainty) if use_edl else None)
            act = (np.asarray(dec.actionness) if os_head else None)
        for vi, name in enumerate(chunk):
            fps = video_infos[name]['fps']
            duration = video_infos[name]['duration']
            props = []
            for ci, cl in enumerate(cls_rng):
                if post_fn is not None:
                    blk = blocks[vi, ci]
                    kept = blk[(blk[:, -1] > 0) & (blk[:, 2] > 0)][:, :-1]
                else:
                    seconds = segs[vi] / fps
                    if binary:
                        # binary filtering keeps everything above 1e-9,
                        # no actionness gate (test_binary.py:125)
                        mask = scores[vi, :, cl] > 1e-9
                    else:
                        mask = scores[vi, :, cl] > 0.001  # (test.py:134)
                        if os_head:
                            mask &= act[vi] > 0.5
                    if not mask.any():
                        continue
                    cols = [seconds[mask],
                            scores[vi, mask, cl][:, None]]
                    if use_edl:
                        cols.append(unct[vi, mask][:, None])
                    if os_head:
                        cols.append(act[vi, mask][:, None])
                    block = np.concatenate(cols, 1)
                    kept, _ = soft_nms_numpy(
                        block, sigma=sigma, top_k=top_k,
                        # binary mode: 1e-9 floor (test_binary.py:155)
                        score_threshold=1e-9 if binary else 1e-3)
                cl_idx = cl + 1 if os_head else cl
                for row in kept:
                    if row[2] <= 0:
                        continue
                    start_t = max(0.0, float(row[0]))
                    end_t = min(duration, float(row[1]))
                    if end_t <= start_t:
                        continue
                    props.append({
                        'label': idx_to_class.get(cl_idx, str(cl_idx)),
                        'score': float(row[2]),
                        'segment': [start_t, end_t],
                        'uncertainty': float(row[3]) if use_edl else 0.0,
                        'actionness': float(row[-1]) if os_head else 0.0,
                    })
            key = name[2:] if name.startswith('v_') else name
            if binary and key in cls_scores:
                # binary-actionness: the video carries ONE class — the
                # classifier argmax — and proposal scores fuse with the
                # video-level confidence (test_binary.py:210-211,
                # get_video_prediction:163,176)
                v_scores = cls_scores[key]
                pred_class = cls_actions[int(np.argmax(v_scores))]
                pred_conf = float(np.max(v_scores))
                props = [dict(p, label=pred_class,
                              score=p['score'] * pred_conf)
                         for p in props]
            result_dict[key] = props
        print(f'[{min(i + video_batch, len(names))}/{len(names)}] videos')

    payload = {'version': 'ActivityNet-v1.3', 'results': result_dict,
               'external_data': {}}
    os.makedirs(te.get('output_path', './output'), exist_ok=True)
    out_path = os.path.join(te.get('output_path', './output'),
                            te.get('output_json',
                                   'detection_results.json'))
    with open(out_path, 'w') as f:
        json.dump(payload, f)
    return out_path


def main(argv=None) -> None:
    # tool-local flags on top of the shared config surface
    # (reference analogs: test_binary.py's cls file + ngpu sharding)
    import argparse
    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument('--binary', action='store_true',
                       help='binary-actionness mode (anet/test_binary.py)')
    extra.add_argument('--cls_score_file', type=str, default=None,
                       help='video-level classifier json '
                            '(result_tsn_val.json schema)')
    extra.add_argument('--video_batch', type=int, default=4,
                       help='videos per jitted forward (window-axis '
                            'batching)')
    extra.add_argument('--max_videos', type=int, default=None)
    ns, rest = extra.parse_known_args(argv)
    cfg = config_from_args(rest)
    print('wrote', run_test_anet(cfg, max_videos=ns.max_videos,
                                 video_batch=ns.video_batch,
                                 binary=ns.binary,
                                 cls_score_file=ns.cls_score_file))


if __name__ == '__main__':
    main()
