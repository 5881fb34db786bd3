"""Packed cross-video inference (InferencePipeline.run_videos): windows
from consecutive videos pack into full fixed-size forward batches; must
match per-video run_video (inference has no cross-window coupling — BN
is frozen constants; only last-ulp float differences from different
batch tiling are allowed, measured ~1e-6 relative). max_batch is set
small here to force cross-video packing, mid-video batch splits, and a
padded tail batch in one run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opental_tpu.infer.pipeline import InferencePipeline
from opental_tpu.utils.propmatch import pair_proposals
from opental_tpu.models.bdnet import BDNet

CLIP, STRIDE, CROP = 128, 32, 32


def _model_and_vars(in_channels=3, seed=0):
    model = BDNet(num_classes=16, os_head=True, use_edl=True,
                  frame_num=CLIP, in_channels=in_channels)
    x0 = jnp.zeros((1, CLIP, CROP, CROP, in_channels), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(seed), x0)
    return model, variables


def _videos(seed=0, channels=3):
    rng = np.random.RandomState(seed)
    # lengths chosen to straddle batch boundaries at max_batch=16:
    # 10+7 windows split a batch; 100 frames = single-window video;
    # 930 frames = 27 windows spanning two batches
    specs = [('v_a', 420), ('v_b', 290), ('v_c', 100), ('v_d', 930)]
    return [(name, rng.randint(0, 255, (t, 40, 40, channels),
                               dtype=np.uint8), t, 10.0)
            for name, t in specs]


def _assert_same(props_a, props_b):
    # tie-robust pairing: near-tied scores re-pair by segment so
    # last-ulp cross-path noise cannot zip distinct proposals crosswise
    assert len(props_a) == len(props_b)
    for a, b in pair_proposals(props_a, props_b):
        assert a['cls'] == b['cls']
        np.testing.assert_allclose(a['score'], b['score'], rtol=1e-4)
        np.testing.assert_allclose(a['segment'], b['segment'],
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_packed_matches_per_video():
    model, variables = _model_and_vars()
    kwargs = dict(clip_length=CLIP, stride=STRIDE, crop_size=CROP,
                  conf_thresh=0.01, top_k=50, nms_sigma=0.5,
                  use_edl=True, os_head=True)
    pipe = InferencePipeline(model, variables, **kwargs)
    videos = _videos()

    packed = pipe.run_videos(iter(videos), max_batch=16)
    assert set(packed) == {v[0] for v in videos}
    total = sum(len(p) for p in packed.values())
    assert total > 0
    for name, data, sc, fps in videos:
        ref = pipe.run_video(data, sample_count=sc, sample_fps=fps)
        _assert_same(ref, packed[name])


def test_packed_ships_uint8():
    """The packed path must stage RAW uint8 windows + int32 frames-valid
    (4x less host->device transfer); normalization happens inside the
    jitted forward (ingest_windows). Spy on _packed_forward to pin the
    shipped dtypes and the zero-valid tail padding."""
    model, variables = _model_and_vars()
    pipe = InferencePipeline(model, variables, clip_length=CLIP,
                             stride=STRIDE, crop_size=CROP,
                             conf_thresh=0.01, top_k=50, nms_sigma=0.5,
                             use_edl=True, os_head=True)
    seen = []
    inner = pipe._packed_forward

    def spy(variables, clips_u8, valid, *rest):
        seen.append((clips_u8.dtype, valid.dtype,
                     np.asarray(valid).copy()))
        return inner(variables, clips_u8, valid, *rest)

    pipe._packed_forward = spy
    videos = _videos(seed=4)[:2]   # 13+9 windows -> 1 full + padded tail
    out = pipe.run_videos(iter(videos), max_batch=16)
    assert set(out) == {v[0] for v in videos}
    assert len(seen) == 2
    for cd, vd, _ in seen:
        assert cd == jnp.uint8
        assert vd == jnp.int32
    # the padded tail batch carries valid=0 rows
    tail_valid = seen[-1][2]
    assert (tail_valid[-1] == 0) and (tail_valid > 0).any()


@pytest.mark.slow
def test_packed_cli_wiring(tmp_path):
    """`testing.packed: true` routes run_test through run_videos and
    writes the same JSON schema with every video present."""
    import json

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

    cfg.testing['packed'] = True
    cfg.testing['packed_batch'] = 8
    cfg.testing['output_json'] = 'packed.json'
    out_path = run_test(cfg)
    payload = json.load(open(out_path))
    assert set(payload) == {'version', 'results', 'external_data'}
    assert len(payload['results']) == 2
    assert sum(len(v) for v in payload['results'].values()) > 0

    # threshold calibration rides the same packed path and must yield
    # the per-video threshold (scores differ only by float noise)
    from opental_tpu.openset.threshold import calibrate
    from opental_tpu.tools.test import build_pipeline
    pipe, _, _ = build_pipeline(cfg)
    cfg.testing['output_json'] = 'thr_packed.json'
    thr_packed = calibrate(cfg, pipe)
    cfg.testing['packed'] = False
    cfg.testing['output_json'] = 'thr_plain.json'
    thr_plain = calibrate(cfg, pipe)
    np.testing.assert_allclose(thr_packed, thr_plain, rtol=1e-4)


@pytest.mark.slow
def test_packed_fusion_matches_per_video():
    """The fusion branch of run_videos splits the RGB and flow queues
    with duplicated head/rest bookkeeping — exercise a mid-video batch
    split and a padded tail with both streams and check against
    run_video fusion (which is itself checked against the reference's
    parse_output averaging in test_shared_backbone/test_e2e_fusion)."""
    model, variables = _model_and_vars()
    flow_model, flow_vars = _model_and_vars(in_channels=2, seed=7)
    kwargs = dict(clip_length=CLIP, stride=STRIDE, crop_size=CROP,
                  conf_thresh=0.01, top_k=50, nms_sigma=0.5,
                  use_edl=True, os_head=True)
    pipe = InferencePipeline(model, variables, flow_model=flow_model,
                             flow_variables=flow_vars, **kwargs)
    rgb = _videos(seed=1)
    flows = _videos(seed=2, channels=2)
    videos = [rv + (fv[1],) for rv, fv in zip(rgb, flows)]

    packed = pipe.run_videos(iter(videos), max_batch=16)
    for name, data, sc, fps, flow in videos:
        ref = pipe.run_video(data, sample_count=sc, sample_fps=fps,
                             flow_data=flow)
        _assert_same(ref, packed[name])


@pytest.mark.slow
def test_packed_ingest_matches_per_video():
    """device_ingest + packed (run_videos_ingest): consecutive videos'
    raw frames share one fixed-capacity device buffer; windows gather on
    device with per-window frames_valid. Must match the exact host
    per-video path. frames_capacity=1024 forces a mid-run flush (videos
    420+290+128 frames, then 930 alone); v_c (100 frames < clip) covers
    the single-short-window video whose tail reads into the next
    video's region and must zero-mask it."""
    model, variables = _model_and_vars()
    kwargs = dict(clip_length=CLIP, stride=STRIDE, crop_size=CROP,
                  conf_thresh=0.01, top_k=50, nms_sigma=0.5,
                  use_edl=True, os_head=True)
    host = InferencePipeline(model, variables, **kwargs)
    pipe = InferencePipeline(model, variables, device_ingest=True,
                             **kwargs)
    videos = _videos(seed=6)

    packed = pipe.run_videos(iter(videos), max_batch=16,
                             frames_capacity=1024)
    assert set(packed) == {v[0] for v in videos}
    for name, data, sc, fps in videos:
        ref = host.run_video(data, sample_count=sc, sample_fps=fps)
        _assert_same(ref, packed[name])


@pytest.mark.slow
def test_ingest_fusion_matches_host():
    """device_ingest + two-stream fusion (run_video): both streams' raw
    frames stage once into their own device buffers, the SAME window
    offsets gather from each, and each stream keeps its own
    frames-valid. The flow video is one frame SHORTER than RGB (TVL1
    flow npys are, preprocess.py) so the streams' tail zero-masks
    diverge — must match the host fusion path exactly (which is itself
    checked against the reference's parse_output averaging in
    test_e2e_fusion)."""
    model, variables = _model_and_vars()
    flow_model, flow_vars = _model_and_vars(in_channels=2, seed=7)
    kwargs = dict(clip_length=CLIP, stride=STRIDE, crop_size=CROP,
                  conf_thresh=0.01, top_k=50, nms_sigma=0.5,
                  use_edl=True, os_head=True, flow_model=flow_model,
                  flow_variables=flow_vars)
    host = InferencePipeline(model, variables, **kwargs)
    ingest = InferencePipeline(model, variables, device_ingest=True,
                               **kwargs)
    rng = np.random.RandomState(21)
    data = rng.randint(0, 255, (290, 40, 40, 3), np.uint8)
    flow = rng.randint(0, 255, (289, 40, 40, 2), np.uint8)
    ref = host.run_video(data, sample_count=290, sample_fps=10.0,
                         flow_data=flow)
    got = ingest.run_video(data, sample_count=290, sample_fps=10.0,
                           flow_data=flow)
    assert len(ref) > 0
    _assert_same(ref, got)


@pytest.mark.slow
def test_packed_ingest_fusion_matches_per_video():
    """device_ingest + packed + fusion (run_videos_ingest): twin
    RGB/flow frame buffers share one cursor layout (per-video region =
    max of the streams' extents) so one offsets array gathers from
    both. Flow videos run one frame shorter than RGB (TVL1), shifting
    the streams' tail zero-masks apart; frames_capacity=1024 forces a
    mid-run flush; v_c (100 frames < clip) covers the short video whose
    window reads into the next video's region on BOTH buffers."""
    model, variables = _model_and_vars()
    flow_model, flow_vars = _model_and_vars(in_channels=2, seed=7)
    kwargs = dict(clip_length=CLIP, stride=STRIDE, crop_size=CROP,
                  conf_thresh=0.01, top_k=50, nms_sigma=0.5,
                  use_edl=True, os_head=True, flow_model=flow_model,
                  flow_variables=flow_vars)
    host = InferencePipeline(model, variables, **kwargs)
    pipe = InferencePipeline(model, variables, device_ingest=True,
                             **kwargs)
    rgb = _videos(seed=11)
    rng = np.random.RandomState(12)
    videos = [(name, data, sc, fps,
               rng.randint(0, 255, (sc - 1, 40, 40, 2), np.uint8))
              for name, data, sc, fps in rgb]

    packed = pipe.run_videos(iter(videos), max_batch=16,
                             frames_capacity=1024)
    assert set(packed) == {v[0] for v in videos}
    for name, data, sc, fps, flow in videos:
        ref = host.run_video(data, sample_count=sc, sample_fps=fps,
                             flow_data=flow)
        _assert_same(ref, packed[name])


def test_ingest_tail_window_beyond_npy_length():
    """A video npy can be SHORTER than the annotated sample_count (the
    reference zero-pads: test.py:48-76). The device-ingest buffer must
    cover max(t, sample_count): with t=1000 (within clip_length of the
    1024 frame bucket) and sample_count=1100, the tail window offset
    972 exceeds a t-bucketed buffer and dynamic_slice would CLAMP it to
    896 — real frames land at the wrong in-window positions. Discovered
    by inspection in round 4; this pins the fix."""
    model, variables = _model_and_vars()
    kwargs = dict(clip_length=CLIP, stride=512, crop_size=CROP,
                  conf_thresh=0.01, top_k=50, nms_sigma=0.5,
                  use_edl=True, os_head=True)
    host = InferencePipeline(model, variables, **kwargs)
    ingest = InferencePipeline(model, variables, device_ingest=True,
                               **kwargs)
    rng = np.random.RandomState(3)
    data = rng.randint(0, 255, (1000, 40, 40, 3), np.uint8)
    ref = host.run_video(data, sample_count=1100, sample_fps=10.0)
    got = ingest.run_video(data, sample_count=1100, sample_fps=10.0)
    _assert_same(ref, got)


def test_stage_frames_chunked_equals_monolithic():
    """Chunked staging (the measured-faster transfer mode) must
    reassemble to exactly the input buffer, including a ragged tail
    chunk; chunk_frames=None is the monolithic put."""
    from opental_tpu.infer.pipeline import stage_frames
    rng = np.random.RandomState(0)
    buf = rng.randint(0, 255, (350, 4, 5, 3), np.uint8)
    for ck in (100, 128, 350, 1000, None):
        got = np.asarray(stage_frames(buf, ck))
        np.testing.assert_array_equal(got, buf)


def test_packed_ingest_stages_frames_once():
    """The ingest-packed path must ship each video's frames ONCE as a
    raw uint8 frame buffer of FIXED bucketed capacity (one jit graph per
    run), not per overlapping window. Spy on _ingest_forward: every
    chunk of a flush reuses the same staged buffer, and pad rows carry
    valid=0."""
    model, variables = _model_and_vars()
    pipe = InferencePipeline(model, variables, clip_length=CLIP,
                             stride=STRIDE, crop_size=CROP,
                             conf_thresh=0.01, top_k=50, nms_sigma=0.5,
                             use_edl=True, os_head=True,
                             device_ingest=True)
    seen = []
    inner = pipe._ingest_forward

    def spy(variables, buf, offs, fv):
        seen.append((buf, offs.dtype, np.asarray(fv).copy()))
        return inner(variables, buf, offs, fv)

    pipe._ingest_forward = spy
    videos = _videos(seed=8)[:2]    # 11 + 7 windows at stride 32
    out = pipe.run_videos(iter(videos), max_batch=8,
                          frames_capacity=1024)
    assert set(out) == {v[0] for v in videos}
    bufs = {id(b) for b, _, _ in seen}
    assert len(bufs) == 1           # one staged buffer, reused per chunk
    buf = seen[0][0]
    assert buf.dtype == jnp.uint8
    assert buf.shape[0] == 1024     # fixed bucketed capacity
    assert all(od == jnp.int32 for _, od, _ in seen)
    # 18 real windows pad to 24 at max_batch=8; tail pad rows valid=0
    assert sum(fv.shape[0] for _, _, fv in seen) == 24
    tail = seen[-1][2]
    assert (tail == 0).any() and (tail > 0).any()


@pytest.mark.slow
def test_packed_ingest_oversize_video():
    """A single video longer than frames_capacity gets its own plan with
    a capacity bucketed UP (cap = k * frames_capacity) — results still
    match the per-video path. Raw pre-NMS decodes agree to ~2e-5
    (verified when this test was built), but the stationary-noise
    videos produce exactly-tied scores whose soft-NMS pick order flips
    under that noise (CLAUDE.md), so proposals compare via the
    tie-aware matcher used by the composed-parity suite."""
    from proposal_matching import assert_proposal_parity

    model, variables = _model_and_vars()
    kwargs = dict(clip_length=CLIP, stride=STRIDE, crop_size=CROP,
                  conf_thresh=0.01, top_k=50, nms_sigma=0.5,
                  use_edl=True, os_head=True)
    host = InferencePipeline(model, variables, **kwargs)
    pipe = InferencePipeline(model, variables, device_ingest=True,
                             **kwargs)
    videos = _videos(seed=9)        # v_d = 930 frames > 512 capacity
    packed = pipe.run_videos(iter(videos), max_batch=16,
                             frames_capacity=512)

    def to_json(props):
        return [{'label': str(p['cls']), 'score': p['score'],
                 'segment': p['segment'],
                 'uncertainty': p['uncertainty'],
                 'actionness': p['actionness']} for p in props]

    ref_json = {'results': {}}
    our_json = {'results': {}}
    for name, data, sc, fps in videos:
        ref_json['results'][name] = to_json(
            host.run_video(data, sample_count=sc, sample_fps=fps))
        our_json['results'][name] = to_json(packed[name])
    assert_proposal_parity(ref_json, our_json, min_total=50)


@pytest.mark.slow
def test_packed_shared_backbone_matches_per_video():
    """run_videos_shared packs k-window spans across videos into one
    staged buffer with per-span frames_valid; results must match the
    per-video shared path (which is itself feature-slice bit-aligned
    against the plain forward, tests/test_shared_backbone.py). The tiny
    frames_capacity forces a mid-run flush; the video set covers tail
    groups with 1..k-1 real windows and a single-window video whose
    span margin reads (and must zero-mask) the next video's frames."""
    model, variables = _model_and_vars()
    kwargs = dict(clip_length=CLIP, stride=STRIDE, crop_size=CROP,
                  conf_thresh=0.01, top_k=50, nms_sigma=0.5,
                  use_edl=True, os_head=True, shared_backbone=True)
    pipe = InferencePipeline(model, variables, **kwargs)
    videos = _videos(seed=5)

    packed = pipe.run_videos(iter(videos), frames_capacity=2000)
    assert set(packed) == {v[0] for v in videos}
    for name, data, sc, fps in videos:
        ref = pipe.run_video(data, sample_count=sc, sample_fps=fps)
        _assert_same(ref, packed[name])


@pytest.mark.slow
def test_packed_device_post_matches_host():
    model, variables = _model_and_vars()
    kwargs = dict(clip_length=CLIP, stride=STRIDE, crop_size=CROP,
                  conf_thresh=0.01, top_k=50, nms_sigma=0.5,
                  use_edl=True, os_head=True)
    videos = _videos(seed=3)
    host = InferencePipeline(model, variables, **kwargs).run_videos(
        iter(videos), max_batch=16)
    dev = InferencePipeline(model, variables, device_post=True,
                            n_candidates=512, **kwargs).run_videos(
        iter(videos), max_batch=16)
    for name in host:
        assert len(host[name]) == len(dev[name])
        for x, y in pair_proposals(host[name], dev[name]):
            assert x['cls'] == y['cls']
            np.testing.assert_allclose(x['score'], y['score'], rtol=1e-4)
