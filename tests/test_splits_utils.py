"""Split/GT utility parity: write_anet_val_gt vs the reference's own
datasets/anet_test_gt.py on a synthetic ANet GT + split tree, plus the
small class-map/video-list helpers (AFSD/anet_data/class_map.py,
gen_video_list.py)."""

import importlib.util
import json
import os

from opental_tpu.openset.splits import (class_maps, filtered_database,
                                        load_class_names,
                                        write_anet_val_gt,
                                        write_video_list)

_GT = {
    'database': {
        'vid_a': {'subset': 'validation', 'duration': 10.0,
                  'annotations': [
                      {'label': 'Diving', 'segment': [1.0, 3.0]},
                      {'label': 'Surfing', 'segment': [5.0, 7.0]}]},
        'vid_b': {'subset': 'validation', 'duration': 8.0,
                  'annotations': [
                      {'label': 'Knitting', 'segment': [0.5, 2.0]}]},
        'vid_c': {'subset': 'training', 'duration': 9.0,
                  'annotations': [
                      {'label': 'Diving', 'segment': [2.0, 4.0]}]},
    }
}


def _load_reference_anet_test_gt():
    spec = importlib.util.spec_from_file_location(
        'ref_anet_test_gt', '/root/reference/datasets/anet_test_gt.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_split_tree(tmp_path, num_splits=2):
    gt_file = tmp_path / 'gt.json'
    gt_file.write_text(json.dumps(_GT))
    known = [['Diving'], ['Knitting']]
    al = [['Diving', 'Surfing', 'Knitting'], ['Knitting', 'Diving']]
    for i in range(num_splits):
        d = tmp_path / f'split_{i}'
        d.mkdir()
        (d / 'action_known.txt').write_text(
            ''.join(n + '\n' for n in known[i]))
        (d / 'action_all.txt').write_text(
            ''.join(n + '\n' for n in al[i]))
    return str(gt_file)


def test_anet_val_gt_matches_reference(tmp_path):
    gt_file = _write_split_tree(tmp_path)
    write_anet_val_gt(gt_file, str(tmp_path), num_splits=2)

    ref = _load_reference_anet_test_gt()
    for i in range(2):
        split = os.path.join(str(tmp_path), f'split_{i}')
        for cls_file, out_name in (('action_known.txt',
                                    'known_val_gt.json'),
                                   ('action_all.txt', 'all_val_gt.json')):
            expected = ref.get_filtered_database(
                os.path.join(split, cls_file), _GT, subset='validation')
            with open(os.path.join(split, out_name)) as f:
                got = json.load(f)
            assert got == expected, (i, out_name)


def test_filtered_database_drops_empty_and_wrong_subset():
    out = filtered_database(_GT, ['Diving'], subset='validation')
    assert set(out['database']) == {'vid_a'}
    assert out['database']['vid_a']['annotations'] == [
        {'label': 'Diving', 'segment': [1.0, 3.0]}]
    # training subset excluded even though vid_c has a Diving annotation
    out_tr = filtered_database(_GT, ['Diving'], subset='training')
    assert set(out_tr['database']) == {'vid_c'}


def test_class_maps_one_indexed(tmp_path):
    p = tmp_path / 'action_name.txt'
    p.write_text('Diving\nSurfing\nKnitting\n')
    class_to_id, id_to_class = class_maps(str(p))
    assert class_to_id == {'Diving': 1, 'Surfing': 2, 'Knitting': 3}
    assert id_to_class[1] == 'Diving' and id_to_class[3] == 'Knitting'
    assert load_class_names(str(p)) == ['Diving', 'Surfing', 'Knitting']


def test_write_video_list_sorted(tmp_path):
    vd = tmp_path / 'vids'
    vd.mkdir()
    for name in ('b.mp4', 'a.mp4', 'c.txt'):
        (vd / name).write_text('x')
    out = tmp_path / 'list.txt'
    paths = write_video_list(str(vd), str(out))
    assert [os.path.basename(p) for p in paths] == ['a.mp4', 'b.mp4']
    assert out.read_text().splitlines() == paths
