"""Shared-backbone inference (one backbone pass per window group,
features sliced per overlapping window — infer/pipeline.py
_build_shared_forward).

Exactness caveat: windows see their real temporal context through conv
receptive fields instead of the per-window path's SAME zero padding, so
outputs deviate near window edges BY DESIGN (PARITY.md). What must be
exact, and is tested here:
  * feature-slice alignment — an interior window's Mixed_4f/Mixed_5c
    features, at temporal steps whose receptive field lies fully inside
    the window, match the per-window backbone bit-for-bit (any stride
    or offset bug shifts the grid and fails loudly);
  * host post vs fused device post through the shared path;
  * tail-offset snapping and short-video grouping.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opental_tpu.infer.pipeline import InferencePipeline
from opental_tpu.utils.propmatch import pair_proposals
from opental_tpu.models.bdnet import BDNet

CLIP, STRIDE, CROP = 128, 32, 32


def _model_and_vars():
    model = BDNet(num_classes=16, os_head=True, use_edl=True,
                  frame_num=CLIP)
    x0 = jnp.zeros((1, CLIP, CROP, CROP, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
    return model, variables


def _video(t, seed=0, hw=40):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 255, (t, hw, hw, 3), dtype=np.uint8)


@pytest.mark.slow
def test_interior_feature_slices_match_per_window():
    """Mixed_4f (stride 4) / Mixed_5c (stride 8) slices of a full-span
    backbone pass equal the per-window backbone at interior temporal
    steps (receptive field ~111 input frames -> steps with |support|
    fully inside the 128-frame window: 4f [14, 18), 5c [7, 9))."""
    model, variables = _model_and_vars()
    video = _video(384)
    xf = (video[:, 4:36, 4:36].astype(np.float32) / 255.0) * 2.0 - 1.0

    feats_full = model.apply(variables, jnp.asarray(xf)[None],
                             method=type(model).backbone_features)
    off = 128
    win = jnp.asarray(xf[off:off + CLIP])[None]
    feats_win = model.apply(variables, win,
                            method=type(model).backbone_features)

    f4_shared = np.asarray(feats_full['Mixed_4f'][0, off // 4:
                                                  off // 4 + CLIP // 4])
    f4_win = np.asarray(feats_win['Mixed_4f'][0])
    np.testing.assert_allclose(f4_shared[14:18], f4_win[14:18],
                               atol=2e-5, rtol=1e-5)
    # edge steps MUST differ (real context vs zero padding) — if they
    # match, the slice test above is vacuous
    assert np.abs(f4_shared[0] - f4_win[0]).max() > 1e-4

    f8_shared = np.asarray(feats_full['Mixed_5c'][0, off // 8:
                                                  off // 8 + CLIP // 8])
    f8_win = np.asarray(feats_win['Mixed_5c'][0])
    np.testing.assert_allclose(f8_shared[7:9], f8_win[7:9],
                               atol=2e-5, rtol=1e-5)


@pytest.mark.slow
def test_shared_pipeline_runs_and_posts_match():
    """The shared path produces a valid proposal list; host post and
    fused device post agree exactly on the shared decodes; the snapped
    tail offset keeps segments inside the video."""
    model, variables = _model_and_vars()
    kwargs = dict(clip_length=CLIP, stride=STRIDE, crop_size=CROP,
                  conf_thresh=0.01, top_k=50, nms_sigma=0.5,
                  use_edl=True, os_head=True)
    # 443 frames: tail offset 315 snaps up to 320 (multiple of 8)
    video = _video(443)

    shared_host = InferencePipeline(model, variables,
                                    shared_backbone=True, **kwargs)
    props_h = shared_host.run_video(video, sample_count=443,
                                    sample_fps=10.0)
    assert props_h, 'shared pipeline returned no proposals'
    for p in props_h:
        assert 0.0 <= p['score'] <= 1.0
        assert p['segment'][0] < p['segment'][1]
        assert p['segment'][1] <= (443 + 8) / 10.0 + 1e-6

    shared_dev = InferencePipeline(model, variables, shared_backbone=True,
                                   device_post=True, n_candidates=1024,
                                   **kwargs)
    props_d = shared_dev.run_video(video, sample_count=443,
                                   sample_fps=10.0)
    assert len(props_h) == len(props_d)
    # tie-robust pairing (utils/propmatch.py): near-tied scores re-pair
    # by segment so last-ulp cross-path noise cannot zip crosswise
    for a, b in pair_proposals(props_h, props_d):
        assert a['cls'] == b['cls']
        np.testing.assert_allclose(a['score'], b['score'], rtol=1e-4)
        np.testing.assert_allclose(a['segment'], b['segment'],
                                   rtol=1e-4, atol=1e-3)


@pytest.mark.slow
def test_shared_mesh_matches_single_device():
    """Sequence-parallel shared-backbone inference (span groups sharded
    across the 8-device CPU mesh) matches the single-device shared path
    exactly — same math, groups distributed."""
    from opental_tpu.parallel import mesh as meshlib

    model, variables = _model_and_vars()
    kwargs = dict(clip_length=CLIP, stride=STRIDE, crop_size=CROP,
                  conf_thresh=0.01, top_k=50, nms_sigma=0.5,
                  use_edl=True, os_head=True, shared_backbone=True)
    single = InferencePipeline(model, variables, **kwargs)
    sharded = InferencePipeline(model, variables,
                                mesh=meshlib.make_mesh(), **kwargs)

    video = _video(400, seed=5)
    props_a = single.run_video(video, sample_count=400, sample_fps=10.0)
    props_b = sharded.run_video(video, sample_count=400, sample_fps=10.0)

    assert props_a and len(props_a) == len(props_b)
    for a, b in zip(props_a, props_b):
        assert a['cls'] == b['cls']
        np.testing.assert_allclose(a['score'], b['score'], rtol=1e-5)
        np.testing.assert_allclose(a['segment'], b['segment'], rtol=1e-5)


@pytest.mark.slow
def test_shared_backbone_cli_wiring(tmp_path):
    """`testing.shared_backbone: true` reaches the pipeline from the
    tools/test.py config surface and writes a valid detection JSON over
    the synthetic dataset."""
    import json
    import os

    from opental_tpu import factory
    from opental_tpu.config import load_config
    from opental_tpu.losses.edl import EDLConfig, EDLState
    from opental_tpu.tools.test import build_pipeline, run_test
    from opental_tpu.train import checkpoint as ckpt
    from opental_tpu.train.step import TrainState, make_optimizer
    from opental_tpu.utils.synthetic import make_synthetic_dataset

    root = str(tmp_path / 'synth')
    cfg_path = make_synthetic_dataset(root, clip_length=128, crop_size=32)
    cfg = load_config(cfg_path)

    model = factory.build_model(cfg, frame_num=128)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((1, 128, 32, 32, 3), np.float32))
    tx = make_optimizer(1e-5, 1e-3)
    state = TrainState(params=variables['params'],
                       constants=variables['constants'],
                       opt_state=tx.init(variables['params']),
                       edl_state=EDLState.create(EDLConfig(num_classes=4)))
    ckpt.save(cfg.training['checkpoint_path'], 1, state,
              jax.random.PRNGKey(0))

    cfg.testing['shared_backbone'] = True
    pipe, _, _ = build_pipeline(cfg)
    assert pipe.shared_backbone, 'config key did not reach the pipeline'

    cfg.testing['output_json'] = 'shared.json'
    out_path = run_test(cfg)
    payload = json.load(open(out_path))
    assert set(payload) == {'version', 'results', 'external_data'}
    assert len(payload['results']) == 2
    assert sum(len(v) for v in payload['results'].values()) > 0
    for props in payload['results'].values():
        for p in props:
            assert np.isfinite(p['score']) and len(p['segment']) == 2
    assert os.path.exists(out_path)


@pytest.mark.slow
def test_shared_fusion_two_streams_contribute():
    """Fusion through the shared path: both streams share span geometry
    and fuse head-wise (test.py:91-108 averaging) before decode. The
    flow stream must actually change the fused scores."""
    model, variables = _model_and_vars()
    flow_model = BDNet(num_classes=16, os_head=True, use_edl=True,
                       frame_num=CLIP, in_channels=2)
    flow_vars = jax.jit(flow_model.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, CLIP, CROP, CROP, 2),
                                         jnp.float32))
    kwargs = dict(clip_length=CLIP, stride=STRIDE, crop_size=CROP,
                  conf_thresh=0.01, top_k=50, nms_sigma=0.5,
                  use_edl=True, os_head=True, shared_backbone=True)
    video = _video(300, seed=8)
    rng = np.random.RandomState(9)
    flow = rng.randint(0, 255, (300, 40, 40, 2), dtype=np.uint8)

    solo = InferencePipeline(model, variables, **kwargs)
    props_solo = solo.run_video(video, sample_count=300, sample_fps=10.0)

    fused = InferencePipeline(model, variables, flow_model=flow_model,
                              flow_variables=flow_vars, **kwargs)
    props_fused = fused.run_video(video, sample_count=300,
                                  sample_fps=10.0, flow_data=flow)
    assert props_fused
    for p in props_fused:
        assert np.isfinite(p['score']) and p['segment'][0] < p['segment'][1]
    assert (sorted(round(p['score'], 6) for p in props_solo)
            != sorted(round(p['score'], 6) for p in props_fused)), \
        'flow stream did not contribute to fused scores'


@pytest.mark.slow
def test_shared_pipeline_single_window_video():
    """A video shorter than one clip runs through the small-group graph
    with padded duplicate windows dropped."""
    model, variables = _model_and_vars()
    pipe = InferencePipeline(model, variables, shared_backbone=True,
                             clip_length=CLIP, stride=STRIDE,
                             crop_size=CROP, conf_thresh=0.01, top_k=20,
                             nms_sigma=0.5, use_edl=True, os_head=True)
    video = _video(100, seed=3)
    props = pipe.run_video(video, sample_count=100, sample_fps=10.0)
    assert isinstance(props, list)
    for p in props:
        assert 0.0 <= p['score'] <= 1.0
