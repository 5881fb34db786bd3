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


def test_wi_stats_report(tmp_path):
    """7-category TP/FP decomposition (analyze_stats.py figure set):
    the categories partition every prediction at each tIoU row, the
    per-prediction scores/max_tious columns align with the category
    marks on a crafted video, and all 4 figures are written."""
    import numpy as np

    from opental_tpu.eval.detection import DetectionEvaluator
    from opental_tpu.tools.analysis import (WI_CATEGORIES,
                                            wi_category_masks,
                                            wi_stats_report)

    gt, pred, cls = make_dataset(tmp_path, seed=3)
    # one crafted video with a known outcome per category column:
    # pred0 matches Run exactly (TP_k2k, score .9, max_tiou 1.0);
    # pred1 overlaps nothing (FP_bg2k, max_tiou 0)
    database = {'crafted_wi': {'subset': 'test', 'annotations': [
        {'segment': [10.0, 20.0], 'label': 'Run'}]}}
    results = {'crafted_wi': [
        {'label': 'Run', 'score': 0.9, 'segment': [10.0, 20.0],
         'uncertainty': 0.25, 'actionness': 0.8},
        {'label': 'Jump', 'score': 0.4, 'segment': [60.0, 70.0],
         'uncertainty': 0.75, 'actionness': 0.3}]}
    g = json.load(open(gt)); g['database'].update(database)
    json.dump(g, open(gt, 'w'))
    p = json.load(open(pred)); p['results'].update(results)
    json.dump(p, open(pred, 'w'))

    tious = np.array([0.3, 0.5, 0.7])
    ev = DetectionEvaluator(gt, pred, cls, tiou_thresholds=tious,
                            ood_scoring='uncertainty', subset=['test'],
                            openset=True)
    ev.evaluate('WI')
    stats = ev.stats
    n_pred = len(stats['scores'])
    for tidx in range(len(tious)):
        masks = wi_category_masks(stats, tidx)
        total = np.zeros(n_pred)
        for c in WI_CATEGORIES:
            total += masks[c].astype(float)
        # every prediction of a video with GT lands in EXACTLY one
        # category (all make_dataset videos have GT)
        np.testing.assert_array_equal(total, np.ones(n_pred))

    # column alignment: the crafted exact-match prediction is TP_k2k
    # with score .9 / max_tiou 1; its no-overlap sibling is FP_bg2k
    # with score .4 / max_tiou 0
    masks = wi_category_masks(stats, 0)
    tp_cols = np.where(masks['TP_k2k'] & (stats['max_tious'] > 0.999))[0]
    assert any(abs(stats['scores'][c] - 0.9) < 1e-9 for c in tp_cols)
    bg_cols = np.where(masks['FP_bg2k'] & (stats['max_tious'] == 0)
                       & (np.abs(stats['scores'] - 0.4) < 1e-9))[0]
    assert len(bg_cols) >= 1
    # ood_scores column carries the evaluator's scoring formula
    assert np.all((stats['ood_scores'] >= 0) & (stats['ood_scores'] <= 1))

    out = str(tmp_path / 'figs_wi')
    written = wi_stats_report(pred, gt, cls, out, tious=tious)
    names = {os.path.basename(w) for w in written}
    assert names == {'stats_categories.png', 'stats_scores.png',
                     'stats_tiou.png', 'stats_ood_scores_categories.png'}
    assert all(os.path.exists(w) for w in written)


def test_correctness_report(tmp_path):
    """correct/incorrect/unknown/bg buckets partition the matched
    predictions (split_uncertainties_correct semantics) and the figure
    set + JSON summary are written."""
    from opental_tpu.tools.analysis import (correctness_buckets,
                                            correctness_report)
    gt, pred, cls = make_dataset(tmp_path, seed=2)
    # craft guaranteed matches: two disjoint known GTs per video, one
    # prediction copying each — same label (correct) / wrong (incorrect)
    database = {}
    results = {}
    for v in range(3):
        vid = f'crafted_{v}'
        database[vid] = {'subset': 'test', 'annotations': [
            {'segment': [10.0, 20.0], 'label': 'Run'},
            {'segment': [40.0, 50.0], 'label': 'Jump'},
            {'segment': [70.0, 80.0], 'label': 'UnknownAction'}]}
        results[vid] = [
            {'label': 'Run', 'score': 0.9, 'segment': [10.0, 20.0],
             'uncertainty': 0.2, 'actionness': 0.8},
            {'label': 'Swim', 'score': 0.8, 'segment': [40.0, 50.0],
             'uncertainty': 0.6, 'actionness': 0.7},
            {'label': 'Jump', 'score': 0.7, 'segment': [70.0, 80.0],
             'uncertainty': 0.9, 'actionness': 0.5},
            {'label': 'Run', 'score': 0.5, 'segment': [90.0, 95.0],
             'uncertainty': 0.5, 'actionness': 0.4}]
    old_gt = json.load(open(gt))
    old_gt['database'].update(database)
    json.dump(old_gt, open(gt, 'w'))
    old_pred = json.load(open(pred))
    old_pred['results'].update(results)
    json.dump(old_pred, open(pred, 'w'))

    b = correctness_buckets(pred, gt, cls, tiou=0.1)
    n_pred = sum(len(v) for v in json.load(open(pred))['results']
                 .values())
    assert (len(b['correct']) + len(b['incorrect']) + len(b['unknown'])
            + len(b['bg'])) == n_pred
    assert len(b['correct']) > 0 and len(b['incorrect']) > 0

    out = str(tmp_path / 'figs_c')
    written = correctness_report(pred, gt, cls, out, tiou=0.1)
    assert all(os.path.exists(w) for w in written)
    summary = json.load(open(os.path.join(out,
                                          'correctness_summary.json')))
    assert summary['correct']['n'] == len(b['correct'])
