"""StreamingSession: online inference == offline run_video.

Fast test drives the window scheduler with a stubbed forward (offsets,
validity, trimming, fixed batch shape). Slow tests run the real model
and assert the finalized proposals match InferencePipeline.run_video
on the identical video (host post and fused device post), for long,
short (< clip), and misaligned-tail streams, under adversarial chunk
sizes (1-frame chunks included).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opental_tpu.infer.pipeline import InferencePipeline
from opental_tpu.infer.streaming import StreamingSession
from tests.test_packed_inference import (_model_and_vars,
                                         CLIP, STRIDE, CROP)


def _feed_in_chunks(sess, video, rng):
    i = 0
    while i < video.shape[0]:
        n = int(rng.choice([1, 3, 17, 64, 200]))
        sess.feed(video[i:i + n])
        i += n


def test_scheduler_offsets_validity_and_trim(monkeypatch):
    """Stub the forward; check every window runs exactly once with the
    offline offsets/valid counts, batches keep ONE fixed shape, and the
    frame buffer stays bounded."""
    model, variables = _model_and_vars()
    pipe = InferencePipeline(model, variables, clip_length=CLIP,
                             stride=STRIDE, crop_size=CROP, use_edl=True,
                             os_head=True)
    calls = []

    class FakeDec:
        def __init__(self, n):
            self.segments = jnp.zeros((n, 4, 2))
            self.scores = jnp.zeros((n, 4, 16))
            self.uncertainty = jnp.zeros((n, 4))
            self.actionness = jnp.ones((n, 4))

    def fake_forward(variables, clips_u8, valid):
        calls.append((np.asarray(clips_u8).copy(), np.asarray(valid)))
        return FakeDec(clips_u8.shape[0])

    monkeypatch.setattr(pipe, '_packed_forward', fake_forward)

    rng = np.random.RandomState(0)
    t = 930                      # misaligned tail: (930-128) % 32 != 0
    video = rng.randint(0, 255, (t, CROP, CROP, 3), np.uint8)
    sess = StreamingSession(pipe, sample_fps=10.0, max_batch=4)
    _feed_in_chunks(sess, video, rng)
    assert sess.frames_resident <= CLIP + 200 + STRIDE
    sess.finalize()

    from opental_tpu.infer.pipeline import window_offsets
    offsets = window_offsets(t, CLIP, STRIDE)
    ran_windows = []
    for batch, valid in calls:
        assert batch.shape == (4, CLIP, CROP, CROP, 3)  # one jit shape
        for i in range(4):
            if valid[i] > 0:
                ran_windows.append((batch[i], int(valid[i])))
    # every offline window ran once, in offset order, with full frames
    assert len(ran_windows) >= len(offsets)
    for off, (win, v) in zip(offsets, ran_windows[:len(offsets)]):
        assert v == min(CLIP, t - off)
        np.testing.assert_array_equal(win[:v], video[off:off + v])
    assert sess.windows_processed >= len(offsets)


def test_short_stream_single_window(monkeypatch):
    """A stream shorter than one clip runs exactly one zero-padded
    window at offset 0 (window_offsets parity, test.py:48-56)."""
    model, variables = _model_and_vars()
    pipe = InferencePipeline(model, variables, clip_length=CLIP,
                             stride=STRIDE, crop_size=CROP, use_edl=True,
                             os_head=True)
    calls = []

    def fake_forward(variables, clips_u8, valid):
        calls.append(np.asarray(valid))

        class D:
            segments = jnp.zeros((clips_u8.shape[0], 4, 2))
            scores = jnp.zeros((clips_u8.shape[0], 4, 16))
            uncertainty = jnp.zeros((clips_u8.shape[0], 4))
            actionness = jnp.zeros((clips_u8.shape[0], 4))
        return D()

    monkeypatch.setattr(pipe, '_packed_forward', fake_forward)
    video = np.random.RandomState(1).randint(
        0, 255, (50, CROP, CROP, 3), np.uint8)
    sess = StreamingSession(pipe, sample_fps=10.0, max_batch=4)
    sess.feed(video)
    assert sess.windows_processed == 0      # window incomplete mid-feed
    sess.finalize()
    assert len(calls) == 1
    assert calls[0][0] == 50 and (calls[0][1:] == 0).all()


def _as_json(props):
    return {'results': {'v': [{
        'label': str(p['cls']), 'score': p['score'],
        'segment': p['segment'], 'uncertainty': p['uncertainty'],
        'actionness': p['actionness']} for p in props]}}


@pytest.mark.slow
@pytest.mark.parametrize('device_post', [False, True])
def test_streaming_matches_run_video(device_post):
    """finalize() == run_video on the identical video, chunked
    adversarially, for both post-processing paths. The load-bearing
    check is decoded-ROW equivalence (ulp-tight and tie-immune); the
    proposal lists then compare under the shared tie-aware matcher —
    random-init weights produce near-exact score ties where sub-ulp
    normalization noise legally flips soft-NMS pick order
    (tests/proposal_matching.py docstring)."""
    from opental_tpu.data import transforms
    from opental_tpu.infer.pipeline import stack_windows, window_offsets
    from tests.proposal_matching import assert_proposal_parity

    model, variables = _model_and_vars()
    pipe = InferencePipeline(model, variables, clip_length=CLIP,
                             stride=STRIDE, crop_size=CROP, use_edl=True,
                             os_head=True, device_post=device_post)
    rng = np.random.RandomState(2)
    total = 0
    for t in (420, 100, 930):       # multi-window, short, misaligned
        video = rng.randint(0, 255, (t, 40, 40, 3), np.uint8)
        ref = pipe.run_video(video, sample_count=t, sample_fps=10.0,
                             max_batch=16)
        sess = StreamingSession(pipe, sample_fps=10.0, max_batch=4)
        _feed_in_chunks(sess, video, rng)
        if sess.windows_processed:
            prev = sess.preview()
            assert isinstance(prev, list)
        got = sess.finalize()
        assert sess.finalize() is got   # idempotent

        # decoded rows: streaming == the offline forward, per window
        offs = window_offsets(t, CLIP, STRIDE)
        clips = stack_windows(transforms.center_crop(video, CROP),
                              offs, CLIP, bucket=8)
        dec = pipe._forward_decode(pipe.variables, jnp.asarray(clips),
                                   None, None)
        n = len(offs)
        np.testing.assert_allclose(
            np.concatenate(sess._got['segments']),
            np.asarray(dec.segments)[:n], atol=1e-4)
        np.testing.assert_allclose(
            np.concatenate(sess._got['scores']),
            np.asarray(dec.scores)[:n], atol=1e-5)

        assert_proposal_parity(_as_json(ref), _as_json(got),
                               min_total=-1)
        total += len(ref)
    assert total > 50


def test_feed_rejects_float_frames(monkeypatch):
    """Float frames must fail loudly at the stream intake: numpy
    assignment into the uint8 ring buffer would silently truncate them
    (the _require_u8 guard class, infer/pipeline.py)."""
    model, variables = _model_and_vars()
    pipe = InferencePipeline(model, variables, clip_length=CLIP,
                             stride=STRIDE, crop_size=CROP, use_edl=True,
                             os_head=True)
    sess = StreamingSession(pipe, sample_fps=10.0, max_batch=4)
    with pytest.raises(TypeError):
        sess.feed(np.full((8, CROP, CROP, 3), 127.5, np.float32))
    # uint8 frames still flow
    sess.feed(np.zeros((8, CROP, CROP, 3), np.uint8))
    assert sess.frames_received == 8
