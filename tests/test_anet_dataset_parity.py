"""ANet dataset pipeline parity: subset filtering, one-window split,
class-id heatmaps, min-anno thresholds, and annotation normalization vs
the reference AFSD/common/anet_dataset.py (imported directly — unlike
thumos_dataset it has no config singleton)."""

import importlib.util
import json
import sys

import numpy as np
import pytest

pytest.importorskip('torch')

from opental_tpu.data.anet import (get_video_info,  # noqa: E402
                                   heatmaps, split_videos)

CLIP = 768


def _ref_mod():
    sys.path.insert(0, '/root/reference')
    try:
        import AFSD.common.anet_dataset as m
        return m
    finally:
        sys.path.pop(0)


def _synthetic_info(rng, n=8):
    """video_info json in the reference on-disk format, with edge
    cases: non-training subsets, zero/negative-length annotations,
    videos with no valid annotations, frame_num over/under clip."""
    info = {}
    for v in range(n):
        name = f'v_{v:03d}'
        frame_num = int(rng.randint(100, 1200))
        k = int(rng.randint(0, 4))
        annotations = []
        for _ in range(k):
            s = float(rng.uniform(0, frame_num * 0.8))
            e = s + float(rng.uniform(-5, frame_num * 0.3))
            annotations.append({'start_frame': s, 'end_frame': e,
                                'label_id': int(rng.randint(0, 30)),
                                'label': 'x'})
        info[name] = {
            'subset': ('training' if v % 3 else 'validation'),
            'frame_num': frame_num,
            'annotations': annotations,
        }
    return info


@pytest.mark.parametrize('seed,binary', [(0, False), (1, False),
                                         (2, True)])
def test_anet_split_videos_parity(tmp_path, seed, binary):
    ref = _ref_mod()
    rng = np.random.RandomState(seed)
    info = _synthetic_info(rng)
    info_path = tmp_path / 'video_info.json'
    info_path.write_text(json.dumps(info))
    vdir = tmp_path / 'npy'
    vdir.mkdir()
    # materialize npy for most videos; leave one missing to exercise
    # the skip-if-absent branch (anet_dataset.py:47-49)
    for i, name in enumerate(info):
        if i == 3:
            continue
        np.save(vdir / f'{name}.npy',
                np.zeros((4, 2, 2, 3), np.uint8))

    ref_info = ref.get_video_info(str(info_path), subset='training')
    our_info = get_video_info(str(info_path), subset='training')
    assert our_info == ref_info

    # reference binary_class mutates label_id in place — give each
    # side its own deep copy so the comparison is fair
    import copy
    ref_list, ref_th = ref.split_videos(
        copy.deepcopy(ref_info), CLIP, str(vdir), binary_class=binary)
    our_list, our_th = split_videos(
        copy.deepcopy(our_info), CLIP, str(vdir), binary_class=binary)

    assert our_th == ref_th
    assert len(our_list) == len(ref_list)
    for ours, want in zip(our_list, ref_list):
        assert ours['video_name'] == want['video_name']
        assert ours['offset'] == want['offset']
        assert ours['frame_num'] == want['frame_num']
        np.testing.assert_allclose(np.asarray(ours['annos']),
                                   np.asarray(want['annos']))
        # our 'scores' stacks [action, start, end] like the reference
        # __getitem__ (anet_dataset.py:268-272)
        np.testing.assert_array_equal(ours['scores'][0], want['action'])
        np.testing.assert_array_equal(ours['scores'][1], want['start'])
        np.testing.assert_array_equal(ours['scores'][2], want['end'])


def test_anet_heatmaps_match_reference_shape_rule():
    """Class-id (not binary) heatmaps, d = max(len/10, 2) widening
    (anet_dataset.py:78-92)."""
    annos = [[10.0, 110.0, 7], [500.0, 504.0, 3]]
    hm = heatmaps(annos, CLIP)
    assert hm.shape == (3, CLIP)
    # action band carries the class id
    assert (hm[0, 10:111] == 7).all()
    # second anno: d = max(4/10, 2) = 2 -> start band [499, 502)
    assert (hm[1, 499:502] == 3).all() and hm[1, 503] == 0


def test_annos_transform_normalization():
    """Our truths normalization (sample(): s/clip, e/clip) matches the
    reference annos_transform (anet_dataset.py:21-30)."""
    ref = _ref_mod()
    annos = [[12.0, 345.0, 4], [0.0, 768.0, 9]]
    want = ref.annos_transform([list(a) for a in annos], CLIP)
    got = [[s / CLIP, e / CLIP, c] for s, e, c in annos]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))
