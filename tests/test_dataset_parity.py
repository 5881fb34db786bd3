"""THUMOS dataset pipeline parity: clip splitting + boundary heatmaps
vs the reference thumos_dataset.py (imported with a config stub)."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip('torch')

from opental_tpu.data.thumos import (boundary_heatmaps,  # noqa: E402
                                     split_videos)

CLIP, STRIDE = 128, 32


@pytest.fixture(autouse=True)
def ref_env():
    sys.path.insert(0, '/root/reference')
    cfg_mod = types.ModuleType('AFSD.common.config')
    cfg_mod.config = {'dataset': {'training': {'clip_length': CLIP,
                                               'clip_stride': STRIDE,
                                               'crop_size': 32}}}
    sys.modules['AFSD.common.config'] = cfg_mod
    for m in list(sys.modules):
        if m.startswith('AFSD.common.thumos_dataset'):
            sys.modules.pop(m)
    yield
    sys.modules.pop('AFSD.common.config', None)


def synthetic_annotations(seed=0, n_videos=6):
    rng = np.random.RandomState(seed)
    infos, annos = {}, {}
    for v in range(n_videos):
        name = f'vid{v:02d}'
        sc = int(rng.randint(60, 400))
        infos[name] = {'fps': 10.0, 'sample_fps': 10.0, 'count': sc,
                       'sample_count': sc}
        k = rng.randint(1, 5)
        starts = rng.uniform(0, max(sc - 20, 1), k)
        ends = starts + rng.uniform(5, 60, k)
        annos[name] = [[float(s), float(min(e, sc)), int(rng.randint(1, 16))]
                       for s, e in zip(starts, ends)]
    return infos, annos


@pytest.mark.parametrize('seed', [0, 1])
def test_split_videos_parity(seed):
    from AFSD.common.thumos_dataset import split_videos as ref_split
    infos, annos = synthetic_annotations(seed)
    ref_list, ref_th = ref_split(infos, annos, CLIP, STRIDE)
    our_list, our_th = split_videos(infos, annos, CLIP, STRIDE)

    assert our_th == ref_th
    assert len(our_list) == len(ref_list)
    for ours, ref in zip(our_list, ref_list):
        assert ours['video_name'] == ref['video_name']
        assert ours['offset'] == ref['offset']
        np.testing.assert_allclose(np.asarray(ours['annos']),
                                   np.asarray(ref['annos']))
        np.testing.assert_array_equal(ours['scores'][0], ref['start'])
        np.testing.assert_array_equal(ours['scores'][1], ref['end'])


def test_heatmaps_match_reference_rule():
    annos = [[3.0, 40.0, 2], [100.0, 109.0, 5]]
    hm = boundary_heatmaps(annos, CLIP)
    # widened by d = max(len/10, 2): first anno d=3.7 -> start 1..5
    assert hm[0, 1:5].all() and not hm[0, 6]
    assert hm.shape == (2, CLIP)


def test_ssl_augment_parity():
    """Cut-paste SSL augmentation vs the reference augment_
    (thumos_dataset.py:187-229) under matched RNG draws: identical
    augmented clips, segment triples, and success flags across seeds,
    covering both paste directions and the no-valid-choice fallback.

    The reference draws from the global `random` module; seeding it and
    an equally-seeded random.Random gives identical Mersenne streams, so
    the two implementations see the same choice sequence."""
    import math
    import random as pyrandom

    from AFSD.common.thumos_dataset import THUMOS_Dataset

    from opental_tpu.data.thumos import ssl_augment

    ds = object.__new__(THUMOS_Dataset)   # only clip_length is used
    ds.clip_length = CLIP

    flags, branches = set(), set()
    for seed in range(24):
        rng_np = np.random.RandomState(seed)
        clip = rng_np.randn(CLIP, 6, 6, 3).astype(np.float32)
        # 1-3 action segments + enforced spacing so some seeds have
        # valid backgrounds and others do not
        k = int(rng_np.randint(1, 4))
        annos = []
        cursor = 0.0
        for _ in range(k):
            s = cursor + float(rng_np.uniform(0, 25))
            e = s + float(rng_np.uniform(4, 60))
            if e >= CLIP - 1:
                break
            annos.append([s, e, int(rng_np.randint(1, 16))])
            cursor = e
        if not annos:
            annos = [[5.0, 120.0, 1]]
        if seed % 2:
            # mirror the layout so the free background sits BEFORE the
            # actions — exercises the else paste branch (bg left of gt)
            annos = [[CLIP - 1.0 - e, CLIP - 1.0 - s, c]
                     for s, e, c in reversed(annos)]
        th = int(rng_np.randint(3, 12))

        pyrandom.seed(seed)
        ref_in = torch.from_numpy(
            np.ascontiguousarray(clip.transpose(3, 0, 1, 2)))
        ref_out, ref_annos, ref_flag = ds.augment_(
            ref_in, [list(a) for a in annos], th)

        got_clip, got_props, got_flag = ssl_augment(
            clip, [list(a) for a in annos], th, pyrandom.Random(seed))

        assert got_flag == ref_flag, f'seed {seed}'
        flags.add(ref_flag)
        if ref_flag:
            np.testing.assert_array_equal(
                got_clip.transpose(3, 0, 1, 2), ref_out.numpy(),
                err_msg=f'seed {seed}')
            np.testing.assert_allclose(
                got_props, np.asarray(ref_annos, np.float32),
                err_msg=f'seed {seed}')
            # which paste branch ran: the if branch keeps segs[0][0] at
            # an original gt start, the else branch shifts it down by th
            starts = {round(a[0], 4) for a in annos}
            branches.add(round(float(ref_annos[0][0]), 4) in starts)
        else:
            np.testing.assert_array_equal(got_clip, clip)
            assert got_props.shape == (3, 2)
    assert flags == {True, False}, 'seed sweep must cover both outcomes'
    assert branches == {True, False}, \
        'seed sweep must cover both paste directions'
