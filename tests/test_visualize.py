"""Qualitative visualization tools (demo/visualization.py semantics):
timeline + action-bar figures render, the per-video threshold search
picks the separating cutoff, and the CLI threshold routing works."""

import json
import os

import numpy as np

from opental_tpu.tools.visualize import (action_bar_figure, main,
                                         match_preds_with_gt,
                                         search_video_thresholds,
                                         timeline_figure)

from test_analysis_stats import make_dataset


def crafted_video():
    gts = [{'segment': [10.0, 20.0], 'label': 'Run'},
           {'segment': [40.0, 50.0], 'label': 'UnknownAction'}]
    preds = [
        # exact match on the known GT, confident -> should stay 'Run'
        {'label': 'Run', 'score': 0.9, 'segment': [10.0, 20.0],
         'uncertainty': 0.1, 'actionness': 0.8},
        # exact match on the unknown GT, uncertain -> should reject
        {'label': 'Jump', 'score': 0.8, 'segment': [40.0, 50.0],
         'uncertainty': 0.9, 'actionness': 0.6},
    ]
    return preds, gts


def test_match_preds_with_gt():
    preds, gts = crafted_video()
    # below both uncertainties: nothing rejected
    pairs = match_preds_with_gt(preds, gts, unct_thresh=0.95, tiou=0.5)
    assert pairs == [('Run', 'Run'), ('Jump', 'UnknownAction')]
    # between the two uncertainties: only the second pred rejected
    pairs = match_preds_with_gt(preds, gts, unct_thresh=0.5, tiou=0.5)
    assert pairs == [('Run', 'Run'), ('__unknown__', 'UnknownAction')]
    # each GT is locked by its first (highest-priority) matching pred
    double = preds + [dict(preds[0], score=0.1)]
    pairs = match_preds_with_gt(double, gts, unct_thresh=0.95, tiou=0.5)
    assert len(pairs) == 2


def test_search_video_thresholds():
    """The sweep must pick an uncertainty cutoff that keeps the
    confident known-class match (unc 0.1, kept by strict > at t=0.1)
    and rejects the uncertain unknown match (unc 0.9) — the first
    candidate achieving both is t=0.1, returned as confidence cutoff
    0.9."""
    preds, gts = crafted_video()
    gt_db = {'v0': {'subset': 'test', 'annotations': gts}}
    out = search_video_thresholds({'v0': preds}, gt_db, ['v0'])
    assert abs(out['v0'] - 0.9) < 1e-9


def test_figures_and_cli(tmp_path):
    gt, pred, cls = make_dataset(tmp_path, seed=11)
    preds = json.load(open(pred))['results']
    gtdb = json.load(open(gt))['database']
    video = next(iter(preds))

    out1 = str(tmp_path / 'timeline.png')
    timeline_figure(video, preds[video],
                    gtdb[video]['annotations'], out1,
                    ood_threshold={video: 0.5})
    assert os.path.getsize(out1) > 5000

    out2 = str(tmp_path / 'bars.png')
    action_bar_figure(video, {'m': preds[video]},
                      gtdb[video]['annotations'], 100.0, out2,
                      thresholds={'m': {video: 0.5}})
    assert os.path.getsize(out2) > 5000

    # CLI with per-method routing: one fixed cutoff, one searched
    out_dir = str(tmp_path / 'viz')
    main(['a=' + pred, 'b=' + pred, gt, '--bars', '--videos', video,
          '--out_dir', out_dir,
          '--thresholds', 'a=0.7', 'b=search'])
    assert os.path.exists(os.path.join(out_dir, f'{video}_bars.png'))

    # calibration-file route (read_threshold schema)
    thr_json = tmp_path / 'thr.json'
    thr_json.write_text(json.dumps(
        {'external_data': {'threshold': 0.6}, 'results': {}}))
    main(['a=' + pred, gt, '--bars', '--videos', video,
          '--out_dir', out_dir, '--thresholds', f'a={thr_json}'])
