"""ANet end-to-end workflow on a synthetic dataset: train (with the
normal(0,0.01) head re-init), checkpoint, video-batched inference via
the ANet driver (incl. the binary-actionness variant), threshold
calibration on the training subset, and open-set eval at tIoU 0.1:0.5
(the ANet protocol, anet/eval_open.py:16). Slow (CPU jit of the full
768-style train step at toy shapes)."""

import json
import os

import jax
import numpy as np
import pytest


def test_prepare_window_u8_matches_f32(tmp_path):
    """uint8 staging (prepare_window_u8 + device ingest_windows) must
    reproduce the f32 prepare_window path — including the reference's
    127.5 tail pad (anet/test.py:87-89), which normalizes to exactly
    0.0 — for videos shorter, equal to, and longer than clip_length."""
    from opental_tpu.infer.pipeline import ingest_windows
    from opental_tpu.tools.test_anet import (prepare_window,
                                             prepare_window_u8)

    rng = np.random.RandomState(0)
    clip, crop = 64, 16
    for i, t in enumerate((40, 64, 90)):
        path = str(tmp_path / f'v{i}.npy')
        np.save(path, rng.randint(0, 256, (t, crop + 4, crop + 6, 3),
                                  np.uint8))
        ref = prepare_window(path, clip, crop)
        u8, valid = prepare_window_u8(path, clip, crop)
        assert u8.dtype == np.uint8 and valid == min(t, clip)
        got = np.asarray(jax.jit(ingest_windows)(
            u8[None], np.asarray([valid], np.int32)))[0]
        np.testing.assert_allclose(got, ref, atol=2e-7)


@pytest.mark.slow
def test_anet_train_test_threshold_eval(tmp_path):
    from opental_tpu.config import load_config
    from opental_tpu.eval.detection import DetectionEvaluator
    from opental_tpu.openset.threshold import calibrate_anet
    from opental_tpu.tools.test_anet import run_test_anet
    from opental_tpu.train import checkpoint as ckpt
    from opental_tpu.train.loop import train
    from opental_tpu.utils.synthetic import make_synthetic_anet_dataset

    root = str(tmp_path / 'synth_anet')
    cfg_path = make_synthetic_anet_dataset(root, clip_length=256,
                                           crop_size=32)
    cfg = load_config(cfg_path)

    state = train(cfg, max_steps_per_epoch=1)
    assert int(state.step) >= 1
    ckpt.save(cfg.training['checkpoint_path'], 1, state,
              jax.random.PRNGKey(0))

    out_path = run_test_anet(cfg, video_batch=2)
    payload = json.load(open(out_path))
    assert payload['version'] == 'ActivityNet-v1.3'
    assert len(payload['results']) == 2  # both validation videos
    # output keys strip the v_ prefix (anet/test.py:183)
    assert all(not k.startswith('v_') for k in payload['results'])

    # device post-processing (the default above) must equal the host
    # numpy path: 189 priors fit inside the candidate preselect, and
    # soft_nms_device == soft_nms_numpy is separately exact-tested
    host_cfg = cfg.clone()
    host_cfg['testing']['device_nms'] = False
    host_cfg['testing']['output_json'] = 'detections_host.json'
    host_payload = json.load(open(run_test_anet(host_cfg,
                                                video_batch=2)))
    assert set(host_payload['results']) == set(payload['results'])
    for vid in payload['results']:
        dev = sorted(payload['results'][vid],
                     key=lambda p: (p['label'], -p['score']))
        host = sorted(host_payload['results'][vid],
                      key=lambda p: (p['label'], -p['score']))
        assert len(dev) == len(host), vid
        for a, b in zip(dev, host):
            assert a['label'] == b['label']
            np.testing.assert_allclose(a['score'], b['score'],
                                       rtol=1e-5)
            np.testing.assert_allclose(a['segment'], b['segment'],
                                       rtol=1e-4, atol=1e-4)

    # ragged tail: video_batch=3 > the 2 validation videos exercises
    # pad_video_batch (chunk padded by repeating the last video; padded
    # rows never read back) — results must equal the exact-batch run
    pad_cfg = cfg.clone()
    pad_cfg['testing']['output_json'] = 'detections_pad.json'
    pad_payload = json.load(open(run_test_anet(pad_cfg, video_batch=3)))
    assert pad_payload['results'].keys() == payload['results'].keys()
    from opental_tpu.utils.propmatch import pair_proposals
    askey = lambda p: dict(p, cls=p['label'])  # noqa: E731
    for vid in payload['results']:
        a, b = payload['results'][vid], pad_payload['results'][vid]
        assert len(a) == len(b), vid
        # tie-robust pairing: batch-tiling float noise between the
        # batch-2 and padded batch-3 forwards can flip sort order of
        # near-tied scores (utils/propmatch.py)
        for pa, pb in pair_proposals([askey(p) for p in a],
                                     [askey(p) for p in b]):
            assert pa['cls'] == pb['cls']
            np.testing.assert_allclose(pa['score'], pb['score'],
                                       rtol=1e-4, atol=1e-6)
            np.testing.assert_allclose(pa['segment'], pb['segment'],
                                       rtol=1e-4, atol=1e-4)

    ev = DetectionEvaluator(
        os.path.join(root, 'annotations', 'gt_open.json'), out_path,
        os.path.join(root, 'annotations', 'action_known.txt'),
        tiou_thresholds=np.arange(0.1, 0.6, 0.1),
        ood_scoring='uncertainty', subset=['validation'], openset=True,
        dataset='anet')
    ev.pre_evaluate()
    auc_roc, auc_pr, far = ev.evaluate('AUC')
    assert np.all(np.isfinite(auc_roc))

    # threshold calibration over the TRAINING subset
    # (anet/threshold.py:31-63)
    thr_cfg = cfg.clone()
    thr_cfg['testing']['output_json'] = 'thresholding.json'
    threshold = calibrate_anet(thr_cfg)
    assert np.isfinite(threshold)
    thr_payload = json.load(open(os.path.join(
        root, 'output', 'thresholding.json')))
    assert thr_payload['external_data']['threshold'] == threshold

    # binary-actionness variant: external video-level classifier file
    # (test_binary.py:195-211 result_tsn schema)
    val_keys = list(payload['results'])
    cls_file = str(tmp_path / 'cls_scores.json')
    classes = [f'Act{i:02d}' for i in range(1, 5)]
    rng = np.random.RandomState(0)
    with open(cls_file, 'w') as f:
        json.dump({'results': {k: rng.rand(4).tolist() for k in val_keys},
                   'class': classes}, f)
    bin_cfg = cfg.clone()
    bin_cfg['testing']['output_json'] = 'detections_binary.json'
    bin_path = run_test_anet(bin_cfg, video_batch=2, binary=True,
                             cls_score_file=cls_file)
    bin_payload = json.load(open(bin_path))
    with open(cls_file) as f:
        cls_data = json.load(f)
    for vid, props in bin_payload['results'].items():
        want = classes[int(np.argmax(cls_data['results'][vid]))]
        assert all(p['label'] == want for p in props), vid


@pytest.mark.slow
def test_anet_fusion_e2e(tmp_path):
    """RGB+flow fusion through the ANet driver (testing.fusion: true):
    builds a second 2-channel flow model, averages every head per video
    window, and writes ActivityNet-format JSON — the synthetic-data
    regression guard for AFSD/anet/test_fusion.py:1-262 semantics."""
    from opental_tpu import factory
    from opental_tpu.config import load_config
    from opental_tpu.losses.edl import EDLState
    from opental_tpu.tools.test_anet import run_test_anet
    from opental_tpu.train import checkpoint as ckpt
    from opental_tpu.train.step import TrainState, make_optimizer

    root = str(tmp_path / 'synth_anet')
    clip, crop = 256, 32
    from opental_tpu.utils.synthetic import make_synthetic_anet_dataset
    cfg_path = make_synthetic_anet_dataset(root, clip_length=clip,
                                           crop_size=crop)
    cfg = load_config(cfg_path)
    edl_cfg = factory.build_loss_config(cfg).edl

    def save_ckpt(model, path, channels, seed):
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(seed),
            np.zeros((1, clip, crop, crop, channels), np.float32))
        tx = make_optimizer(1e-4, 1e-4)
        state = TrainState(params=variables['params'],
                           constants=variables['constants'],
                           opt_state=tx.init(variables['params']),
                           edl_state=(EDLState.create(edl_cfg)
                                      if edl_cfg else None))
        ckpt.save(path, 1, state, jax.random.PRNGKey(seed))

    rgb_model = factory.build_model(cfg, frame_num=clip)
    assert rgb_model.arch == 'anet'
    save_ckpt(rgb_model, cfg.training['checkpoint_path'], 3, 0)
    flow_ckpt_dir = os.path.join(root, 'flow_ckpts')
    flow_model = factory.build_model(cfg, frame_num=clip, in_channels=2)
    assert flow_model.in_channels == 2
    save_ckpt(flow_model, flow_ckpt_dir, 2, 1)

    # synthetic 2-channel flow npys for the validation videos
    npy_dir = cfg.get_path('dataset.testing.video_mp4_path')
    flow_dir = os.path.join(root, 'flow_npy')
    os.makedirs(flow_dir, exist_ok=True)
    rng = np.random.RandomState(7)
    for name in os.listdir(npy_dir):
        t = np.load(os.path.join(npy_dir, name)).shape[0]
        np.save(os.path.join(flow_dir, name),
                rng.randint(0, 255, (t, crop, crop, 2), dtype=np.uint8))

    out_rgb = run_test_anet(cfg, video_batch=2)
    rgb_payload = json.load(open(out_rgb))

    cfg.testing['fusion'] = True
    cfg.testing['flow_checkpoint_path'] = os.path.join(
        flow_ckpt_dir, 'checkpoint-latest')
    cfg.testing['flow_data_path'] = flow_dir
    cfg.testing['output_json'] = 'fused_anet.json'
    out_path = run_test_anet(cfg, video_batch=2)
    payload = json.load(open(out_path))

    assert payload['version'] == 'ActivityNet-v1.3'
    assert set(payload['results']) == set(rgb_payload['results'])
    fused_props = sum(len(v) for v in payload['results'].values())
    assert fused_props > 0
    for props in payload['results'].values():
        for p in props:
            assert np.isfinite(p['score']) and len(p['segment']) == 2
            assert np.isfinite(p['uncertainty'])

    # the flow stream must actually move the fused heads
    def score_map(payload):
        return {v: tuple(round(p['score'], 6) for p in props)
                for v, props in payload['results'].items()}
    assert score_map(payload) != score_map(rgb_payload)
