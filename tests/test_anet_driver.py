"""Fast unit tests for the ANet driver's post-processing knobs.

Pins the round-5 review fixes: the binary-actionness soft-NMS score
floor (the reference uses 1e-9 in binary mode vs 0.001 otherwise,
test_binary.py:155 / test.py:166), the uint8 intake guard on
prepare_window_u8 (a stray float npy after a uint8 names[0] must fail
loudly, not truncate), and the ragged-tail batch padding that keeps the
whole run on one jit graph.
"""

import numpy as np
import pytest

from opental_tpu.tools.test_anet import (build_device_post,
                                         pad_video_batch,
                                         prepare_window_u8)


def _post_blocks(binary: bool):
    """One video, one class, three well-separated proposals with scores
    BETWEEN the two floors (1e-9 < s < 1e-3). Only the binary floor
    lets them through NMS. Note both the reference softnms_v2 and our
    twins never pick the LAST remaining active proposal
    (`while undone.sum() > 1`, segment_utils.py:136), so 3 actives ->
    2 picked."""
    post = build_device_post(cls_cols=[1], use_edl=False, os_head=False,
                             binary=binary, sigma=0.5, top_k=10,
                             n_candidates=8)
    segments = np.zeros((1, 3, 2), np.float32)
    segments[0] = [[0.0, 10.0], [100.0, 110.0], [200.0, 210.0]]
    scores = np.zeros((1, 3, 2), np.float32)
    scores[0, :, 1] = [5e-4, 2e-4, 1e-4]
    zeros = np.zeros((1, 3), np.float32)
    fps = np.ones((1,), np.float32)
    return np.asarray(post(segments, scores, zeros, zeros, fps))


def test_binary_nms_floor_keeps_midrange_scores():
    blocks = _post_blocks(binary=True)
    kept = blocks[0, 0]
    picked = kept[(kept[:, -1] > 0) & (kept[:, 2] > 0)]
    # sub-0.001 proposals survive binary NMS (test_binary.py:155
    # score_threshold=1e-9): the two highest get picked, the third
    # stays as the never-picked last active
    assert picked.shape[0] == 2
    np.testing.assert_allclose(sorted(picked[:, 2]), [2e-4, 5e-4],
                               rtol=1e-5)


def test_default_nms_floor_drops_midrange_scores():
    blocks = _post_blocks(binary=False)
    kept = blocks[0, 0]
    picked = kept[(kept[:, -1] > 0) & (kept[:, 2] > 0)]
    # the standard ANet floor 0.001 (test.py:166) suppresses all three
    assert picked.shape[0] == 0


def test_host_binary_nms_floor_matches():
    """The host numpy path gets the same 1e-9 floor in binary mode."""
    from opental_tpu.ops.nms import soft_nms_numpy

    block = np.array([[0.0, 10.0, 5e-4],
                      [100.0, 110.0, 2e-4],
                      [200.0, 210.0, 1e-4]], np.float32)
    kept_bin, n_bin = soft_nms_numpy(block, sigma=0.5, top_k=10,
                                     score_threshold=1e-9)
    kept_def, n_def = soft_nms_numpy(block, sigma=0.5, top_k=10,
                                     score_threshold=1e-3)
    assert n_bin == 2 and n_def == 0


def test_prepare_window_u8_rejects_float_npy(tmp_path):
    path = str(tmp_path / 'float_video.npy')
    np.save(path, np.full((8, 8, 8, 3), 127.5, np.float32))
    with pytest.raises(TypeError):
        prepare_window_u8(path, 8, 8)


def test_pad_video_batch():
    arr = np.arange(2 * 3).reshape(2, 3).astype(np.float32)
    out = pad_video_batch(arr, 4)
    assert out.shape == (4, 3)
    np.testing.assert_array_equal(out[2], arr[-1])
    np.testing.assert_array_equal(out[3], arr[-1])
    same = pad_video_batch(arr, 2)
    assert same is arr
    assert pad_video_batch(None, 4) is None
