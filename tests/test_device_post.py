"""Fused device post-processing == host numpy post-processing.

The device_post path (infer/pipeline.py: one jitted top-k preselect +
vmapped soft-NMS call per video) must produce the same proposals as the
reference-parity host path (filter + per-class soft_nms_numpy) on the
same decoded windows — same classes, segments, scores, uncertainties.
"""

from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np
import pytest

from opental_tpu.infer.decode import DecodedWindows
from opental_tpu.utils.propmatch import pair_proposals
from opental_tpu.infer.pipeline import InferencePipeline

W, P, K = 5, 126, 8


def make_pipeline(**kw):
    stub = SimpleNamespace(head_classes=K, apply=None)
    return InferencePipeline(stub, variables=None, clip_length=256,
                             conf_thresh=0.01, top_k=200, nms_sigma=0.5,
                             use_edl=True, os_head=True, **kw)


def random_dec(seed=0, n=W):
    rng = np.random.RandomState(seed)
    start = rng.uniform(0, 250, (n, P, 1)).astype(np.float32)
    seg = np.concatenate(
        [start, start + rng.uniform(2, 40, (n, P, 1)).astype(np.float32)],
        -1).clip(0, 256)
    # distinct scores (no exact ties -> NMS pick order is unambiguous)
    scores = rng.uniform(0, 0.2, (n, P, K)).astype(np.float32)
    unct = rng.uniform(0, 1, (n, P)).astype(np.float32)
    act = rng.uniform(-3, 3, (n, P)).astype(np.float32)
    act = 1 / (1 + np.exp(-act))
    return seg, scores, unct, act


@pytest.mark.parametrize('seed', [0, 1])
def test_device_post_matches_host(seed):
    seg, scores, unct, act = random_dec(seed)
    offsets = [0, 128, 256, 384, 512]
    fps = 10.0

    host = make_pipeline()
    off = np.asarray(offsets, np.float32)[:, None, None]
    host_props = host._post_process((seg + off) / fps, scores, unct, act)

    dev = make_pipeline(device_post=True, n_candidates=1024)
    dec = DecodedWindows(jnp.asarray(seg), jnp.asarray(scores),
                         jnp.asarray(unct), jnp.asarray(act))
    dev_props = dev._post_process_on_device(dec, offsets, fps, n=W)

    assert len(dev_props) == len(host_props)
    # tie-robust pairing (utils/propmatch.py)
    for a, b in pair_proposals(dev_props, host_props):
        assert a['cls'] == b['cls']
        np.testing.assert_allclose(a['score'], b['score'], rtol=1e-5,
                                   atol=1e-7)
        np.testing.assert_allclose(a['segment'], b['segment'], atol=1e-4)
        np.testing.assert_allclose(a['uncertainty'], b['uncertainty'],
                                   rtol=1e-5)
        np.testing.assert_allclose(a['actionness'], b['actionness'],
                                   rtol=1e-5)


def test_device_post_masks_padded_windows():
    seg, scores, unct, act = random_dec(2, n=8)  # 3 padded windows
    offsets = [0, 128, 256, 384, 512]
    fps = 10.0
    host = make_pipeline()
    off = np.asarray(offsets, np.float32)[:, None, None]
    host_props = host._post_process((seg[:5] + off) / fps, scores[:5],
                                    unct[:5], act[:5])
    dev = make_pipeline(device_post=True, n_candidates=1024)
    dec = DecodedWindows(jnp.asarray(seg), jnp.asarray(scores),
                         jnp.asarray(unct), jnp.asarray(act))
    dev_props = dev._post_process_on_device(dec, offsets, fps, n=5)
    assert len(dev_props) == len(host_props)


def test_device_windows_matches_stack_windows():
    """Device-side window gather/normalize == host stack_windows,
    including the zero-padded tail (test.py:67-76 parity)."""
    from opental_tpu.infer.pipeline import device_windows, stack_windows

    rng = np.random.RandomState(0)
    t, clip = 300, 128
    video = rng.randint(0, 255, (t, 16, 16, 3), np.uint8)
    offsets = [0, 64, 128, 172]
    host = stack_windows(video, offsets, clip, bucket=4)

    tpad = 512
    padded = np.zeros((tpad, 16, 16, 3), np.uint8)
    padded[:t] = video
    dev = device_windows(jnp.asarray(padded),
                         jnp.asarray(offsets, jnp.int32),
                         jnp.int32(t), clip)
    np.testing.assert_array_equal(np.asarray(dev), host[:4])

    # short-video case: one zero-padded window
    short = video[:100]
    host_s = stack_windows(short, [0], clip, bucket=1)
    pad_s = np.zeros((clip, 16, 16, 3), np.uint8)
    pad_s[:100] = short
    dev_s = device_windows(jnp.asarray(pad_s),
                           jnp.asarray([0], jnp.int32),
                           jnp.int32(100), clip)
    np.testing.assert_array_equal(np.asarray(dev_s), host_s)
