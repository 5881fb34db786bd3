"""Mesh-sharded window-batched inference on the 8-device CPU mesh:
results must match single-device inference exactly."""

import jax
import numpy as np
import pytest

from opental_tpu.infer.pipeline import InferencePipeline
from opental_tpu.utils.propmatch import pair_proposals
from opental_tpu.models.bdnet import BDNet
from opental_tpu.parallel import mesh as meshlib


@pytest.mark.slow
def test_mesh_inference_matches_single_device():
    import jax.numpy as jnp
    model = BDNet(num_classes=16, os_head=True, use_edl=True,
                  frame_num=128)
    x0 = jnp.zeros((1, 128, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0)

    kwargs = dict(clip_length=128, stride=32, crop_size=32,
                  conf_thresh=0.01, top_k=50, nms_sigma=0.5,
                  use_edl=True, os_head=True)
    single = InferencePipeline(model, variables, **kwargs)
    mesh = meshlib.make_mesh()
    sharded = InferencePipeline(model, variables, mesh=mesh, **kwargs)

    rng = np.random.RandomState(0)
    data = rng.randint(0, 255, (400, 40, 40, 3), dtype=np.uint8)
    props_a = single.run_video(data, sample_count=400, sample_fps=10.0)
    props_b = sharded.run_video(data, sample_count=400, sample_fps=10.0)

    assert len(props_a) == len(props_b)
    for a, b in zip(props_a, props_b):
        assert a['cls'] == b['cls']
        np.testing.assert_allclose(a['score'], b['score'], rtol=1e-5)
        np.testing.assert_allclose(a['segment'], b['segment'], rtol=1e-5)


@pytest.mark.slow
def test_packed_mesh_matches_single_device():
    """Packed cross-video batching composes with the window-axis mesh:
    every packed forward is a fixed max_batch divisible by the mesh, so
    windows of the batch shard evenly over devices; results must match
    the single-device per-video path (up to batch-tiling float noise)."""
    import jax.numpy as jnp
    model = BDNet(num_classes=16, os_head=True, use_edl=True,
                  frame_num=128)
    x0 = jnp.zeros((1, 128, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0)

    kwargs = dict(clip_length=128, stride=32, crop_size=32,
                  conf_thresh=0.01, top_k=50, nms_sigma=0.5,
                  use_edl=True, os_head=True)
    single = InferencePipeline(model, variables, **kwargs)
    mesh = meshlib.make_mesh()
    sharded = InferencePipeline(model, variables, mesh=mesh, **kwargs)

    rng = np.random.RandomState(1)
    videos = [(f'v{i}', rng.randint(0, 255, (t, 40, 40, 3), np.uint8),
               t, 10.0) for i, t in enumerate((300, 150, 430))]
    packed = sharded.run_videos(iter(videos), max_batch=16)
    for name, data, sc, fps in videos:
        ref = single.run_video(data, sample_count=sc, sample_fps=fps)
        assert len(packed[name]) == len(ref)
        for a, b in pair_proposals(ref, packed[name]):
            assert a['cls'] == b['cls']
            np.testing.assert_allclose(a['score'], b['score'], rtol=1e-4)
            np.testing.assert_allclose(a['segment'], b['segment'],
                                       rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_packed_ingest_fusion_mesh_matches_single_device():
    """Two-stream fusion on the mesh (round 5): twin RGB/flow frame
    buffers + both variable sets replicate, the window axis (offsets +
    BOTH per-stream frames-valid vectors) shards over the data axis.
    Multi-flush (frames_capacity below the total) with a flow stream
    one frame shorter than RGB; results must match the single-device
    fusion path. Replaces the reference's per-GPU multiprocessing video
    sharding (AFSD/anet/test.py:195-273) for its fusion variant
    (anet/test_fusion.py)."""
    import jax.numpy as jnp
    model = BDNet(num_classes=16, os_head=True, use_edl=True,
                  frame_num=128)
    x0 = jnp.zeros((1, 128, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0)
    flow_model = BDNet(num_classes=16, os_head=True, use_edl=True,
                       frame_num=128, in_channels=2)
    flow_vars = flow_model.init(jax.random.PRNGKey(1),
                                jnp.zeros((1, 128, 32, 32, 2),
                                          jnp.float32))

    kwargs = dict(clip_length=128, stride=32, crop_size=32,
                  conf_thresh=0.01, top_k=50, nms_sigma=0.5,
                  use_edl=True, os_head=True, flow_model=flow_model,
                  flow_variables=flow_vars)
    single = InferencePipeline(model, variables, device_ingest=True,
                               **kwargs)
    mesh = meshlib.make_mesh()
    sharded = InferencePipeline(model, variables, mesh=mesh,
                                device_ingest=True, **kwargs)

    rng = np.random.RandomState(3)
    videos = [(f'v{i}', rng.randint(0, 255, (t, 40, 40, 3), np.uint8),
               t, 10.0,
               rng.randint(0, 255, (t - 1, 40, 40, 2), np.uint8))
              for i, t in enumerate((300, 150, 430))]
    packed = sharded.run_videos(iter(videos), max_batch=16,
                                frames_capacity=512)
    for name, data, sc, fps, flow in videos:
        ref = single.run_video(data, sample_count=sc, sample_fps=fps,
                               flow_data=flow)
        assert len(packed[name]) == len(ref)
        for a, b in pair_proposals(ref, packed[name]):
            assert a['cls'] == b['cls']
            np.testing.assert_allclose(a['score'], b['score'], rtol=1e-4)
            np.testing.assert_allclose(a['segment'], b['segment'],
                                       rtol=1e-4, atol=1e-4)


def test_mesh_fusion_requires_device_ingest():
    """mesh + fusion without device_ingest has no twin-buffer forward —
    the constructor must refuse instead of silently dropping the flow
    stream. (The ctor never applies the variables, so empty dicts keep
    this in the fast tier.)"""
    model = BDNet(num_classes=16, os_head=True, use_edl=True,
                  frame_num=128)
    flow_model = BDNet(num_classes=16, os_head=True, use_edl=True,
                       frame_num=128, in_channels=2)
    dummy = {'params': {}, 'constants': {}}
    with pytest.raises(AssertionError, match='device_ingest'):
        InferencePipeline(model, dummy, mesh=meshlib.make_mesh(),
                          flow_model=flow_model, flow_variables=dummy,
                          clip_length=128, stride=32, crop_size=32)


@pytest.mark.slow
def test_packed_ingest_mesh_matches_single_device():
    """The contiguous-frame-buffer packed mode (run_videos_ingest)
    composes with the mesh: the frame buffer replicates, the window
    axis (offsets + per-window frames_valid) shards over the data axis;
    results must match the single-device host path."""
    import jax.numpy as jnp
    model = BDNet(num_classes=16, os_head=True, use_edl=True,
                  frame_num=128)
    x0 = jnp.zeros((1, 128, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0)

    kwargs = dict(clip_length=128, stride=32, crop_size=32,
                  conf_thresh=0.01, top_k=50, nms_sigma=0.5,
                  use_edl=True, os_head=True)
    single = InferencePipeline(model, variables, **kwargs)
    mesh = meshlib.make_mesh()
    sharded = InferencePipeline(model, variables, mesh=mesh,
                                device_ingest=True, **kwargs)

    rng = np.random.RandomState(2)
    videos = [(f'v{i}', rng.randint(0, 255, (t, 40, 40, 3), np.uint8),
               t, 10.0) for i, t in enumerate((300, 150, 430))]
    packed = sharded.run_videos(iter(videos), max_batch=16,
                                frames_capacity=512)
    for name, data, sc, fps in videos:
        ref = single.run_video(data, sample_count=sc, sample_fps=fps)
        assert len(packed[name]) == len(ref)
        for a, b in pair_proposals(ref, packed[name]):
            assert a['cls'] == b['cls']
            np.testing.assert_allclose(a['score'], b['score'], rtol=1e-4)
            np.testing.assert_allclose(a['segment'], b['segment'],
                                       rtol=1e-4, atol=1e-4)
