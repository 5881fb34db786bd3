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


def _load_reference_thumos_split():
    spec = importlib.util.spec_from_file_location(
        'ref_openset_split_thumos14',
        '/root/reference/datasets/openset_split_thumos14.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_THUMOS_CLASSES = [
    (7, 'BaseballPitch'), (9, 'BasketballDunk'), (12, 'Billiards'),
    (21, 'CleanAndJerk'), (22, 'CliffDiving'), (23, 'CricketBowling'),
    (24, 'CricketShot'), (26, 'Diving'), (31, 'FrisbeeCatch'),
    (33, 'GolfSwing'), (36, 'HammerThrow'), (40, 'HighJump'),
    (45, 'JavelinThrow'), (51, 'LongJump'), (68, 'PoleVault'),
    (79, 'Shotput'), (85, 'SoccerPenalty'), (92, 'TennisSwing'),
    (93, 'ThrowDiscus'), (97, 'VolleyballSpiking'),
]


def _write_thumos_anno_tree(root):
    """Tiny annotations/ tree in the reference's on-disk format."""
    import csv as _csv
    anno = root / 'annotations'
    anno.mkdir()
    with open(anno / 'Class_Index_Detection.txt', 'w') as f:
        for ori, name in _THUMOS_CLASSES:
            f.write(f'{ori} {name}\n')
    header = ['video', 'type', 'type_idx', 'start', 'end',
              'startFrame', 'endFrame']
    rows = []
    for i, (_, name) in enumerate(_THUMOS_CLASSES):
        rows.append([f'video_{i:04d}', name, str(i + 1),
                     '1.5', '4.25', '15', '42'])
        rows.append([f'video_{i:04d}', name, str(i + 1),
                     '6.0', '9.5', '60', '95'])
    for phase in ('val', 'test'):
        with open(anno / f'{phase}_Annotation_ours.csv', 'w',
                  newline='') as f:
            w = _csv.writer(f)
            w.writerow(header)
            w.writerows(rows)
    gt = {'version': 'THUMOS14', 'database': {}, 'external_data': {}}
    for i, (_, name) in enumerate(_THUMOS_CLASSES):
        gt['database'][f'video_{i:04d}'] = {
            'subset': 'test', 'duration': 10.0,
            'annotations': [
                {'label': name, 'segment': [1.5, 4.25]},
                {'label': _THUMOS_CLASSES[(i + 1) % 20][1],
                 'segment': [6.0, 9.5]},
            ]}
    (anno / 'thumos_gt.json').write_text(json.dumps(gt))
    for phase in ('val', 'test'):
        (anno / f'{phase}_video_info.csv').write_text(
            'video,fps\nvideo_0000,30\n')
    return anno


def _run_reference_thumos_main(ref, anno_path, out_path, num_splits=5,
                               num_unknown=5, seed=123):
    """Transliteration of the reference script's __main__ block
    (datasets/openset_split_thumos14.py:52-115) using the reference's
    own imported functions, parameterized on paths."""
    import shutil as _shutil
    import numpy as _np
    _np.random.seed(seed)
    os.makedirs(out_path, exist_ok=True)
    class_info_file = os.path.join(anno_path, 'Class_Index_Detection.txt')
    _shutil.copyfile(class_info_file,
                     os.path.join(out_path, 'Class_Index_Detection.txt'))
    originidx_to_idx, idx_to_class = ref.get_class_index_map(
        class_info_file)
    for i in range(num_splits):
        split_path = os.path.join(out_path, f'split_{i}')
        os.makedirs(split_path, exist_ok=True)
        unknown = _np.random.choice(len(idx_to_class), size=num_unknown,
                                    replace=False)
        idx_to_unknown = dict(
            filter(lambda e: e[0] in unknown, idx_to_class.items()))
        ori_unknown = dict(
            filter(lambda e: e[1] in unknown, originidx_to_idx.items()))
        ref.write_to_txt(
            os.path.join(split_path, 'Class_Index_Unknown.txt'),
            idx_to_unknown, ori_unknown)
        idx_to_known = dict(
            filter(lambda e: e[0] not in unknown, idx_to_class.items()))
        ori_known = dict(
            filter(lambda e: e[1] not in unknown,
                   originidx_to_idx.items()))
        ref.write_to_txt(
            os.path.join(split_path, 'Class_Index_Known.txt'),
            idx_to_known, ori_known)
        for phase in ('val', 'test'):
            src = os.path.join(anno_path, f'{phase}_Annotation_ours.csv')
            ref.csv_filtering(
                os.path.join(split_path, f'{phase}_Annotation_known.csv'),
                src, list(idx_to_unknown.values()))
            ref.csv_filtering(
                os.path.join(split_path,
                             f'{phase}_Annotation_unknown.csv'),
                src, list(idx_to_known.values()))
        gt = os.path.join(anno_path, 'thumos_gt.json')
        ref.json_filtering(
            os.path.join(split_path, 'known_gt.json'), gt,
            list(idx_to_unknown.values()))
        ref.json_filtering(
            os.path.join(split_path, 'unknown_gt.json'), gt,
            list(idx_to_known.values()))


def test_thumos_split_generator_matches_reference(tmp_path):
    """generate_thumos_splits (via the preprocess CLI) produces the
    same class-index txts, filtered annotation CSVs, and known/unknown
    GT JSONs as the reference generator at the same seed — including
    the reference's 0-never-drawn-maps-to-a-class RNG quirk."""
    import csv as _csv
    ref = _load_reference_thumos_split()
    anno = _write_thumos_anno_tree(tmp_path)
    ours_out = tmp_path / 'ours_open'
    ref_out = tmp_path / 'ref_open'
    from opental_tpu.tools.preprocess import main as preprocess_main
    preprocess_main(['thumos_splits', '--anno_path', str(anno),
                     '--out_path', str(ours_out)])
    _run_reference_thumos_main(ref, str(anno), str(ref_out))

    for i in range(5):
        ours_split = ours_out / f'split_{i}'
        ref_split = ref_out / f'split_{i}'
        for txt in ('Class_Index_Known.txt', 'Class_Index_Unknown.txt'):
            assert (ours_split / txt).read_text() == \
                (ref_split / txt).read_text(), (i, txt)
        for phase in ('val', 'test'):
            for kind in ('known', 'unknown'):
                name = f'{phase}_Annotation_{kind}.csv'
                with open(ours_split / name, newline='') as f:
                    got = list(_csv.reader(f))
                with open(ref_split / name, newline='') as f:
                    want = list(_csv.reader(f))
                assert got == want, (i, name)
        for kind in ('known', 'unknown'):
            name = f'{kind}_gt.json'
            got = json.loads((ours_split / name).read_text())
            want = json.loads((ref_split / name).read_text())
            assert got == want, (i, name)
    # top-level copies
    assert (ours_out / 'Class_Index_Detection.txt').exists()
    assert (ours_out / 'test_Annotation_open.csv').exists()
    assert (ours_out / 'val_video_info.csv').exists()


def _load_reference_anet_split():
    spec = importlib.util.spec_from_file_location(
        'ref_openset_split_anet',
        '/root/reference/datasets/openset_split_anet.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_anet_split_generator_matches_reference(tmp_path):
    """generate_anet_splits (via the preprocess CLI) matches the
    reference generator at the same seed — including the known-class
    ordering that falls out of the reference's set difference (class
    IDs are order-dependent, so this pins the label re-coding too)."""
    names = ['Archery', 'BMX', 'Curling', 'Diving', 'Kayaking',
             'Longboarding', 'Rafting', 'Sailing']
    anno = tmp_path / 'annotations'
    anno.mkdir()
    (anno / 'action_name.txt').write_text(
        ''.join(n + '\n' for n in names))
    info = {}
    for i, n in enumerate(names):
        info[f'v_tr_{i}'] = {
            'subset': 'training', 'duration': 60.0,
            'annotations': [
                {'label': n, 'segment': [1.0, 5.0]},
                {'label': names[(i + 3) % 8], 'segment': [7.0, 9.0]}]}
        info[f'v_va_{i}'] = {
            'subset': 'validation', 'duration': 45.0,
            'annotations': [{'label': n, 'segment': [2.0, 6.0]}]}
    (anno / 'video_info_train_val.json').write_text(json.dumps(info))

    ours_out = tmp_path / 'ours_open'
    from opental_tpu.tools.preprocess import main as preprocess_main
    preprocess_main(['anet_splits', '--anno_path', str(anno),
                     '--out_path', str(ours_out), '--num_splits', '3'])

    ref = _load_reference_anet_split()
    import numpy as _np
    _np.random.seed(123)
    ref.class_names_all = names  # the reference fn reads this global
    for i in range(3):
        known, unknown = ref.split_classes_random(names, unknown_ratio=0.25)
        class_to_id = ref.get_class_ids(known, unknown)
        split = ours_out / f'split_{i}'
        assert (split / 'action_all.txt').read_text().splitlines() == \
            known + unknown, i
        assert (split / 'action_known.txt').read_text().splitlines() == \
            known, i
        want = ref.filtering_unknown(
            str(tmp_path / f'ref_split{i}.json'), info, known, class_to_id)
        got = json.loads(
            (split / 'video_info_trainval_openset.json').read_text())
        assert got == want, i
