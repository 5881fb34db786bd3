"""analysis stats_report (analyze_stats.py figure set) on synthetic
predictions: all PNGs produced, finite WI curves."""

import json
import os

import numpy as np

from opental_tpu.tools.analysis import stats_report

CLASSES = ['Run', 'Jump', 'Swim']


def make_dataset(tmp_path, seed=0, n_videos=5):
    rng = np.random.RandomState(seed)
    class_file = tmp_path / 'Class_Index_Known.txt'
    class_file.write_text(
        ''.join(f'{i + 1} {c}\n' for i, c in enumerate(CLASSES)))
    database, results = {}, {}
    for v in range(n_videos):
        vid = f'video_{v:03d}'
        anns = []
        for _ in range(rng.randint(2, 5)):
            s = rng.uniform(0, 80)
            label = ('UnknownAction' if rng.rand() < 0.3
                     else CLASSES[rng.randint(len(CLASSES))])
            anns.append({'segment': [s, s + rng.uniform(2, 15)],
                         'label': label})
        database[vid] = {'subset': 'test', 'annotations': anns}
        results[vid] = [{
            'label': CLASSES[rng.randint(len(CLASSES))],
            'score': float(rng.uniform(0.01, 1)),
            'segment': [float(s := rng.uniform(0, 80)),
                        float(s + rng.uniform(2, 15))],
            'uncertainty': float(rng.uniform(0, 1)),
            'actionness': float(rng.uniform(0, 1)),
        } for _ in range(rng.randint(5, 12))]
    gt = tmp_path / 'gt.json'
    gt.write_text(json.dumps({'database': database}))
    pred = tmp_path / 'pred.json'
    pred.write_text(json.dumps({'version': 'THUMOS14', 'results': results,
                                'external_data': {}}))
    return str(gt), str(pred), str(class_file)


def test_stats_report(tmp_path):
    gt, pred_a, cls = make_dataset(tmp_path, seed=0)
    (tmp_path / 'b').mkdir()
    _, pred_b, _ = make_dataset(tmp_path / 'b', seed=1)
    out = str(tmp_path / 'figs')
    written = stats_report({'methodA': pred_a, 'methodB': pred_b}, gt,
                           cls, out)
    assert all(os.path.exists(w) for w in written)
    names = {os.path.basename(w) for w in written}
    assert {'stats.png', 'stats_ood_scores.png', 'wi_methodA.png',
            'wi_methodB.png'} <= names
