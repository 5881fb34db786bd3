"""Composed-pipeline metric parity: the reference's OWN test driver
(AFSD/thumos14/test.py:203-256) vs our tools/test.py, on identical
weights and identical synthetic videos, compared at three levels:

1. per-proposal detection-JSON match (segments/scores/uncertainty/
   actionness after decode + Soft-NMS + top-k),
2. identical open-set metrics (mAP/AUC/FAR95/OSDR) from OUR evaluator on
   both JSONs,
3. identical metrics from the reference ANETdetection evaluator and ours
   on the SAME (our) JSON.

This is the regression guard that turns "bit-for-metric parity" from a
claim into a tested fact: any drift in window offsets (test.py:48-56),
clip normalization (:67-76), decode fusion (:112-140), filtering
(:143-162), Soft-NMS (segment_utils.py:128-162), JSON schema (:254-256),
or the evaluator makes it fail.

Slow: ~6 torch 256-frame CPU forwards + the jitted jax pipeline.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip('torch')

from reference_stubs import (STUB_CONFIG, install_reference_stubs,  # noqa: E402
                             patch_cuda_to_cpu)

from opental_tpu.config import load_config  # noqa: E402
from opental_tpu.utils.synthetic import make_synthetic_dataset  # noqa: E402

TIOUS = np.array([0.3, 0.5, 0.7])


def _randomized_reference_net():
    """Reference BDNet, seeded glorot init + randomized BN stats and
    decisive head biases (pushes actionness/conf away from the 0.5/0.01
    decision boundaries so fp32 jax-vs-torch noise cannot flip the
    filtering gates of test.py:143-162)."""
    from AFSD.thumos14.BDNet import BDNet as TorchBDNet

    torch.manual_seed(0)
    net = TorchBDNet(in_channels=3, training=False, use_edl=True,
                     use_rpl=False)
    with torch.no_grad():
        for mod in net.modules():
            if isinstance(mod, torch.nn.BatchNorm3d):
                mod.running_mean.normal_(0, 0.2)
                mod.running_var.uniform_(0.8, 1.2)
        g = torch.Generator().manual_seed(1)
        for name, p in net.named_parameters():
            if p.ndim == 1 and any(h in name for h in
                                   ('actionness', 'center', 'conf')):
                p.add_(torch.randn(p.shape, generator=g) * 2.0)
    net.eval()
    return net


# tie-aware matcher shared with the packed cross-data parity check
from proposal_matching import assert_proposal_parity  # noqa: E402,F401


@pytest.mark.slow
def test_composed_pipeline_parity(tmp_path, monkeypatch):
    install_reference_stubs()
    patch_cuda_to_cpu(monkeypatch)

    root = str(tmp_path / 'data')
    # 15 known classes + 1 => num_classes 16, matching the session-wide
    # reference stub (reference_stubs.STUB_CONFIG binds it at import)
    cfg_path = make_synthetic_dataset(
        root, n_train=1, n_test=2, clip_length=256, crop_size=96,
        spatial=104, num_known=15, seed=7, video_len_range=(280, 420),
        temporal_ramp=True, ensure_class_coverage=True)
    anno = os.path.join(root, 'annotations')

    ref_net = _randomized_reference_net()
    ckpt_path = str(tmp_path / 'checkpoint-7.ckpt')
    torch.save(ref_net.state_dict(), ckpt_path)

    # ---- reference driver, verbatim, on CPU ----
    import AFSD.thumos14.test as ref_test
    STUB_CONFIG['dataset']['class_info_path'] = os.path.join(
        anno, 'Class_Index_Known.txt')
    STUB_CONFIG['dataset']['testing'].update({
        'video_info_path': os.path.join(anno, 'test_video_info.csv'),
        'video_data_path': os.path.join(root, 'test_npy'),
        'crop_size': 96, 'clip_length': 256, 'clip_stride': 128})
    STUB_CONFIG['testing'].update({
        'checkpoint_path': ckpt_path, 'fusion': False,
        'output_path': str(tmp_path / 'ref_out'), 'output_json':
        'dets.json', 'conf_thresh': 0.01, 'top_k': 200, 'nms_sigma': 0.5})
    ref_cfg = ref_test.get_basic_config(STUB_CONFIG)
    # build_model reads a module-global `cfg` set only in __main__
    # (test.py:28,41,293)
    monkeypatch.setattr(ref_test, 'cfg', ref_cfg, raising=False)
    ref_test.test(ref_cfg)
    with open(os.path.join(str(tmp_path / 'ref_out'), 'dets.json')) as f:
        ref_json = json.load(f)

    # ---- our driver on the same ckpt/videos ----
    # byte-exact host staging + host NMS (the parity-reference mode;
    # packed/device_ingest/device_nms — all default-on since round 5 —
    # are pinned OFF here and covered by level 1b below)
    from opental_tpu.tools.test import run_test
    cfg = load_config(cfg_path, overrides={
        'testing.checkpoint_path': ckpt_path,
        'testing.top_k': 200,
        'model.compute_dtype': 'float32',
        'dataset.testing.clip_stride': 128,
        'testing.device_nms': False,
        'testing.device_ingest': False,
        'testing.packed': False,
    })
    our_path = run_test(cfg)
    with open(our_path) as f:
        our_json = json.load(f)

    # ---- level 1: per-proposal parity ----
    assert_proposal_parity(ref_json, our_json)

    # ---- level 1b: the DEFAULT CLI mode (packed frame-staged ingest +
    # fused device post-processing, all default-on in tools/test.py
    # since round 5) composes to the same proposals as the reference
    # driver ----
    dev_cfg = load_config(cfg_path, overrides={
        'testing.checkpoint_path': ckpt_path,
        'testing.top_k': 200,
        'model.compute_dtype': 'float32',
        'dataset.testing.clip_stride': 128,
        'testing.output_json': 'dets_device.json',
    })
    dev_path = run_test(dev_cfg)
    with open(dev_path) as f:
        dev_json = json.load(f)
    assert_proposal_parity(ref_json, dev_json)

    # ---- level 2+3: metric parity through both evaluators ----
    if not hasattr(np, 'float'):
        np.float = float  # reference evaluator predates numpy 1.24
    import joblib

    from AFSD.evaluation import eval_detection as ref_eval_mod

    from opental_tpu.eval.detection import DetectionEvaluator
    monkeypatch.setattr(
        ref_eval_mod, 'Parallel',
        lambda n_jobs=None, **kw: joblib.Parallel(n_jobs=1, **kw))

    gt_file = os.path.join(anno, 'gt_open.json')
    cls_file = os.path.join(anno, 'Class_Index_Known.txt')
    kwargs = dict(tiou_thresholds=TIOUS, ood_scoring='uncertainty',
                  subset=['test'], openset=True, dataset='thumos14')

    def run_eval(make, pred):
        ev = make(gt_file, pred, cls_idx_detection=cls_file, **kwargs)
        mAP, _, _ = ev.evaluate('AP')
        ev.pre_evaluate()
        auc = ev.evaluate('AUC')  # (far95, auc_roc, auc_pr)
        osdr = ev.evaluate('OSDR')
        return np.concatenate([np.atleast_1d(np.asarray(x, np.float64))
                               for x in (mAP, *auc, osdr)])

    ours_on_ours = run_eval(DetectionEvaluator, our_path)
    ours_on_ref = run_eval(DetectionEvaluator,
                           os.path.join(str(tmp_path / 'ref_out'),
                                        'dets.json'))
    # same metrics whether the JSON came from our pipeline or the
    # reference's (proposal-level parity implies this; guards both)
    np.testing.assert_allclose(ours_on_ours, ours_on_ref, atol=5e-3)
    # reference evaluator on OUR json == our evaluator on OUR json
    ref_on_ours = run_eval(ref_eval_mod.ANETdetection, our_path)
    np.testing.assert_allclose(ours_on_ours, ref_on_ours, atol=1e-7)
