"""RGB+flow fusion end-to-end: tools/test.py --fusion builds a second
2-channel flow model, runs both streams per window, averages every head
(reference AFSD/thumos14/test.py parse_output :91-108), and writes the
standard detection JSON. Slow (two CPU model jits)."""

import json
import os

import jax
import numpy as np
import pytest


@pytest.mark.slow
def test_fusion_e2e(tmp_path):
    from opental_tpu import factory
    from opental_tpu.config import load_config
    from opental_tpu.losses.edl import EDLConfig, EDLState
    from opental_tpu.tools.test import run_test
    from opental_tpu.train import checkpoint as ckpt
    from opental_tpu.train.step import TrainState, make_optimizer
    from opental_tpu.utils.synthetic import make_synthetic_dataset

    root = str(tmp_path / 'synth')
    cfg_path = make_synthetic_dataset(root, clip_length=128, crop_size=32)
    cfg = load_config(cfg_path)
    clip = 128

    def save_ckpt(model, path, sample_channels):
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0 if sample_channels == 3 else 1),
            np.zeros((1, clip, 32, 32, sample_channels), np.float32))
        tx = make_optimizer(1e-5, 1e-3)
        state = TrainState(params=variables['params'],
                           constants=variables['constants'],
                           opt_state=tx.init(variables['params']),
                           edl_state=EDLState.create(
                               EDLConfig(num_classes=4)))
        ckpt.save(path, 1, state, jax.random.PRNGKey(0))

    rgb_model = factory.build_model(cfg, frame_num=clip)
    save_ckpt(rgb_model, cfg.training['checkpoint_path'], 3)
    flow_ckpt_dir = os.path.join(root, 'flow_ckpts')
    flow_model = factory.build_model(cfg, frame_num=clip, in_channels=2)
    assert flow_model.in_channels == 2
    save_ckpt(flow_model, flow_ckpt_dir, 2)

    # synthetic flow npys alongside the rgb ones (uint8, 2-channel, same
    # [-1,1] decode as rgb — gen_denseflow_npy.py stores clipped uint8)
    rgb_dir = cfg.get_path('dataset.testing.video_data_path')
    flow_dir = os.path.join(root, 'test_flow_npy')
    os.makedirs(flow_dir, exist_ok=True)
    rng = np.random.RandomState(7)
    for name in os.listdir(rgb_dir):
        t = np.load(os.path.join(rgb_dir, name)).shape[0]
        np.save(os.path.join(flow_dir, name),
                rng.randint(0, 255, (t, 32, 32, 2), dtype=np.uint8))

    # baseline: rgb-only run
    out_rgb = run_test(cfg)
    rgb_payload = json.load(open(out_rgb))

    cfg.testing['fusion'] = True
    cfg.testing['rgb_data_path'] = rgb_dir
    cfg.testing['flow_data_path'] = flow_dir
    cfg.testing['flow_checkpoint_path'] = os.path.join(
        flow_ckpt_dir, 'checkpoint-latest')
    cfg.testing['output_json'] = 'fused.json'
    out_path = run_test(cfg)
    payload = json.load(open(out_path))

    assert set(payload) == {'version', 'results', 'external_data'}
    assert set(payload['results']) == set(rgb_payload['results'])
    fused_props = sum(len(v) for v in payload['results'].values())
    assert fused_props > 0
    for props in payload['results'].values():
        for p in props:
            assert np.isfinite(p['score']) and len(p['segment']) == 2

    # the flow stream must actually contribute: fused scores differ from
    # the rgb-only run
    def flat_scores(pl):
        return sorted(round(p['score'], 6)
                      for v in pl['results'].values() for p in v)
    assert flat_scores(payload) != flat_scores(rgb_payload)
