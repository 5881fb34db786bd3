"""Spatial transform parity vs AFSD/common/videotransforms.py under
matched RNG draws. Ours are channels-last (T,H,W,C); the reference is
channels-first (C,T,H,W) — each case transposes the same data for the
reference side and compares the re-transposed result."""

import random
import sys

import numpy as np
import pytest

from opental_tpu.data.transforms import (center_crop, normalize_clip,
                                         random_crop, random_hflip)


def _ref_mod():
    sys.path.insert(0, '/root/reference')
    try:
        import AFSD.common.videotransforms as m
        return m
    finally:
        sys.path.pop(0)


def _clip(rng, t=4, h=14, w=11, c=3):
    return rng.randint(0, 255, (t, h, w, c)).astype(np.uint8)


def _to_ref(clip):
    return np.transpose(clip, (3, 0, 1, 2))


def _from_ref(clip):
    return np.transpose(clip, (1, 2, 3, 0))


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
def test_random_crop_parity(seed):
    ref = _ref_mod()
    rng = np.random.RandomState(seed)
    clip = _clip(rng)
    random.seed(seed)
    want = _from_ref(ref.RandomCrop(8)(_to_ref(clip)))
    got = random_crop(clip, 8, random.Random(seed))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize('h,w,size', [(14, 11, 8), (9, 9, 8), (8, 8, 8),
                                      (13, 8, 8)])
def test_center_crop_parity(h, w, size):
    ref = _ref_mod()
    rng = np.random.RandomState(0)
    clip = _clip(rng, h=h, w=w)
    want = _from_ref(ref.CenterCrop(size)(_to_ref(clip)))
    got = center_crop(clip, size)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize('seed', [0, 1, 2, 3, 4, 5])
def test_random_hflip_parity(seed):
    ref = _ref_mod()
    rng = np.random.RandomState(seed)
    clip = _clip(rng)
    random.seed(seed)
    want = _from_ref(ref.RandomHorizontalFlip()(_to_ref(clip)))
    got = random_hflip(clip, random.Random(seed))
    np.testing.assert_array_equal(got, want)


def test_normalize_matches_reference_formula():
    rng = np.random.RandomState(0)
    clip = _clip(rng)
    got = normalize_clip(clip)
    np.testing.assert_allclose(
        got, (clip.astype(np.float32) / 255.0) * 2.0 - 1.0)
    assert got.min() >= -1.0 and got.max() <= 1.0
