"""Soft-NMS parity vs the reference softnms_v2
(AFSD/common/segment_utils.py:128-162), which is pure torch CPU and
importable directly."""

import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')
torch = pytest.importorskip('torch')

import jax.numpy as jnp  # noqa: E402

from opental_tpu.ops.nms import soft_nms_device, soft_nms_numpy  # noqa: E402


def random_segments(seed, n=60, d=5):
    rng = np.random.RandomState(seed)
    start = rng.uniform(0, 50, n)
    end = start + rng.uniform(0.5, 20, n)
    score = rng.uniform(0, 1, n)
    extras = rng.uniform(0, 1, (n, d - 3))
    return np.concatenate([start[:, None], end[:, None], score[:, None],
                           extras], 1).astype(np.float32)


@pytest.mark.parametrize('seed', [0, 1, 2])
@pytest.mark.parametrize('sigma,top_k', [(0.5, 1000), (0.9, 10)])
def test_numpy_matches_reference(seed, sigma, top_k):
    from AFSD.common.segment_utils import softnms_v2
    segs = random_segments(seed)
    want, want_count = softnms_v2(torch.from_numpy(segs.copy()),
                                  sigma=sigma, top_k=top_k,
                                  score_threshold=1e-3, use_edl=True,
                                  os_head=True)
    got, got_count = soft_nms_numpy(segs, sigma=sigma, top_k=top_k)
    assert got_count == int(want_count)
    # reference returns rows in original index order (boolean mask), ours
    # in pick order — compare as sorted sets
    want_np = want.numpy()
    got_sorted = got[np.lexsort(got.T[::-1])]
    want_sorted = want_np[np.lexsort(want_np.T[::-1])]
    np.testing.assert_allclose(got_sorted, want_sorted, rtol=1e-5,
                               atol=1e-6)


@pytest.mark.parametrize('seed', [0, 3])
def test_device_matches_numpy(seed):
    segs = random_segments(seed, n=40)
    kept_np, count_np = soft_nms_numpy(segs, sigma=0.5, top_k=1000)
    out_dev, count_dev = soft_nms_device(jnp.asarray(segs), sigma=0.5,
                                         top_k=1000)
    out_dev = np.asarray(out_dev)
    assert int(count_dev) == count_np
    kept_dev = out_dev[out_dev[:, -1] > 0][:, :-1]
    a = kept_np[np.lexsort(kept_np.T[::-1])]
    b = kept_dev[np.lexsort(kept_dev.T[::-1])]
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
