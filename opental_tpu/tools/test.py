"""Inference CLI: python -m opental_tpu.tools.test <cfg.yaml> [flags].

Command-surface parity with `python AFSD/thumos14/test.py <cfg>`
(AFSD/thumos14/test.py:203-294): slides windows over every test video,
runs the (optionally RGB+flow fused) model, and writes the detection
JSON. Checkpoints may be native orbax directories or reference torch
.ckpt files (converted on the fly).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from opental_tpu import factory
from opental_tpu.config import Config, config_from_args
from opental_tpu.data.prefetch import prefetch
from opental_tpu.data.thumos import get_class_index_map, get_video_info
from opental_tpu.infer.pipeline import InferencePipeline, proposals_to_json
from opental_tpu.utils.torch_convert import (align_bn_collections,
                                             convert_bdnet_checkpoint,
                                             merge_variables)


def packed_frames(te: dict) -> int:
    """frames_capacity for the packed modes, shared by every
    dataset-scale driver (test / threshold / cross-data): ingest flushes
    stage a full frame buffer each — 16384 frames (~450 MB at crop 96)
    keeps 3 buffers in flight under the HBM budget; the window/span
    staged paths use their measured 32768 (BASELINE.md)."""
    return te.get('packed_frames',
                  16384 if te.get('device_ingest', True) else 32768)


def resolve_checkpoint(path: str) -> str:
    """Follow the 'checkpoint-latest' symlink convention
    (test.py:15-22)."""
    if os.path.lexists(path):
        return os.path.realpath(path) if os.path.islink(path) else path
    raise FileNotFoundError(path)


def load_variables(model, checkpoint_path: str, sample_shape) -> dict:
    """Load model variables from an orbax dir or a torch .ckpt."""
    path = resolve_checkpoint(checkpoint_path)
    # jitted init: un-jitted tracing dispatches thousands of single ops,
    # minutes through the remote-TPU tunnel (CLAUDE.md gotcha)
    template = jax.jit(model.init)(jax.random.PRNGKey(0),
                                   jnp.zeros(sample_shape, jnp.float32))
    if os.path.isdir(path):
        from opental_tpu.train import checkpoint as ckpt
        state, _, _ = ckpt.restore(os.path.dirname(path),
                                   epoch=int(path.split('-')[-1])
                                   if path.split('-')[-1].isdigit()
                                   else None)
        return {'params': state['params'] if isinstance(state, dict)
                else state.params,
                'constants': state['constants'] if isinstance(state, dict)
                else state.constants}
    loaded = convert_bdnet_checkpoint(path)
    loaded = align_bn_collections(loaded, template['params'])
    return {'params': merge_variables(template['params'],
                                      loaded['params'], strict=True),
            'constants': merge_variables(template['constants'],
                                         loaded['constants'], strict=True)}


def build_pipeline(cfg: Config) -> Tuple[InferencePipeline, dict, dict]:
    te = cfg.testing
    clip_length = cfg.get_path('dataset.testing.clip_length', 256)
    crop_size = cfg.get_path('dataset.testing.crop_size', 96)
    flags = factory.model_flags(cfg)
    use_gcpl = cfg.get_path('training.rpl_config.gcpl', False) \
        if flags['use_rpl'] else False
    fusion = te.get('fusion', False)

    # compute dtype: bf16 by default for TPU throughput; set
    # model.compute_dtype: float32 for bit-level parity runs
    dtype = (jnp.float32
             if cfg.get_path('model.compute_dtype') in ('float32', 'f32')
             else jnp.bfloat16)
    model = factory.build_model(cfg, frame_num=clip_length, dtype=dtype)
    shape = (1, clip_length, crop_size, crop_size, model.in_channels)
    variables = load_variables(model, te['checkpoint_path'], shape)
    flow_model = flow_vars = None
    if fusion:
        flow_model = factory.build_model(cfg, frame_num=clip_length,
                                         dtype=dtype, in_channels=2)
        flow_ckpt = te.get('flow_checkpoint_path')
        flow_vars = load_variables(
            flow_model, flow_ckpt,
            (1, clip_length, crop_size, crop_size, 2))

    pipe = InferencePipeline(
        model, variables, clip_length=clip_length,
        stride=cfg.get_path('dataset.testing.clip_stride', 128),
        crop_size=crop_size, conf_thresh=te.get('conf_thresh', 0.01),
        top_k=te.get('top_k', 5000), nms_sigma=te.get('nms_sigma', 0.5),
        use_edl=flags['use_edl'], os_head=flags['os_head'],
        use_gcpl=use_gcpl, evidence=flags['evidence'],
        flow_model=flow_model, flow_variables=flow_vars,
        # testing.device_nms (default TRUE since round 3) -> fused
        # on-device post-processing (per-class top-k preselect + vmapped
        # soft-NMS, one call per video; composed-parity-guarded in
        # tests/test_composed_parity.py level 1b). Set false for the
        # byte-exact reference host path — the only semantic difference
        # is the per-class candidate preselect bound (n_candidates,
        # default 2048; the host path has no bound). device_ingest:
        # ship raw uint8 video, window + normalize on device (4x fewer
        # host->device bytes)
        device_post=te.get('device_nms', True),
        n_candidates=te.get('n_candidates', 2048),
        # device_ingest default TRUE since round 5: raw uint8 frames ship
        # once and window/normalize on device — equivalence-tested to the
        # host-staged path with no parity deviation, and the link is the
        # measured bottleneck (BASELINE.md "Transfer bandwidth"). Set
        # false for host-side f32 staging.
        device_ingest=te.get('device_ingest', True),
        # testing.shared_backbone (default OFF): one backbone pass per
        # span of 4 consecutive windows instead of per overlapping
        # window (1.58x fewer backbone FLOPs at stride 128, +12.5%
        # measured at 48 spans). Composes with fusion (both streams
        # share span geometry). Deviation: windows see real temporal
        # context through conv receptive fields instead of the
        # reference's per-window zero padding (PARITY.md)
        shared_backbone=te.get('shared_backbone', False))

    video_infos = get_video_info(
        cfg.get_path('dataset.testing.video_info_path'))
    _, idx_to_class = get_class_index_map(
        cfg.get_path('dataset.class_info_path'))
    return pipe, video_infos, idx_to_class


def run_test(cfg: Config, max_videos: Optional[int] = None) -> str:
    te = cfg.testing
    pipe, video_infos, idx_to_class = build_pipeline(cfg)
    npy_path = (te.get('rgb_data_path',
                       './datasets/thumos14/test_npy/')
                if te.get('fusion', False)
                else cfg.get_path('dataset.testing.video_data_path'))
    flow_path = te.get('flow_data_path',
                       './datasets/thumos14/test_flow_npy/')

    names = list(video_infos.keys())[:max_videos]
    fusion = te.get('fusion', False)

    # testing.packed (default TRUE since round 5, composing with the
    # device_ingest default into run_videos_ingest — the measured-fastest
    # dataset-scale mode, equivalence-tested with no parity deviation):
    # throughput-optimal batch regardless of video length (short videos
    # underfill per-video batches; BASELINE.md "Window-batch sweep").
    # Same results as per-video runs up to last-ulp batch tiling
    # differences (tests/test_packed_inference.py). Three flavors by
    # composition (run_videos routes): with testing.device_ingest the
    # videos' RAW frames pack into a contiguous device buffer and
    # windows gather on device — each frame ships ONCE, staging
    # overlaps compute (run_videos_ingest; the fastest e2e mode on a
    # transfer-bound link and the recommended dataset-scale config;
    # fusion stages twin RGB/flow frame buffers); with
    # testing.shared_backbone it packs k-window SPANS across videos
    # (run_videos_shared — full 48-span chunks dataset-wide); plain
    # packed stages overlapping windows host-side.
    if te.get('packed', True):
        def stream():
            for video_name in names:
                info = video_infos[video_name]
                data = np.load(os.path.join(npy_path,
                                            video_name + '.npy'))
                item = (video_name, data, info['sample_count'],
                        info['sample_fps'])
                if fusion:
                    item += (np.load(os.path.join(
                        flow_path, video_name + '.npy')),)
                yield item

        # load video i+1 from disk while the device chews on video i
        # (run_videos blocks on device fetches; np.load releases the GIL)
        result_dict = pipe.run_videos(
            prefetch(stream()), max_batch=te.get('packed_batch', 128),
            frames_capacity=packed_frames(te))
        for i, video_name in enumerate(names):
            print(f'[{i + 1}/{len(names)}] {video_name}: '
                  f'{len(result_dict[video_name])} proposals')
        return proposals_to_json(result_dict, idx_to_class,
                                 te.get('output_path', './output'),
                                 te.get('output_json',
                                        'detection_results.json'))

    def load(video_name):
        data = np.load(os.path.join(npy_path, video_name + '.npy'))
        flow = (np.load(os.path.join(flow_path, video_name + '.npy'))
                if fusion else None)
        return video_name, data, flow

    result_dict = {}
    for i, (video_name, data, flow) in enumerate(prefetch(names, load)):
        info = video_infos[video_name]
        result_dict[video_name] = pipe.run_video(
            data, sample_count=info['sample_count'],
            sample_fps=info['sample_fps'], flow_data=flow)
        print(f'[{i + 1}/{len(names)}] {video_name}: '
              f'{len(result_dict[video_name])} proposals')

    return proposals_to_json(result_dict, idx_to_class,
                             te.get('output_path', './output'),
                             te.get('output_json',
                                    'detection_results.json'))


def main(argv=None) -> None:
    cfg = config_from_args(argv)
    path = run_test(cfg)
    print('wrote', path)


if __name__ == '__main__':
    main()
