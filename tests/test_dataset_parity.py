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
