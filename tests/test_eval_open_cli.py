"""CLI-level smoke of the multi-split evaluation driver
(tools/eval_open.py). The metric math itself is exact-parity-tested in
tests/test_eval_parity.py; this drives the reference command surface
(AFSD/thumos14/eval_open.py:9-143): split templating, closed vs open
routing, eval(.txt|_open.txt) artifacts, WI and curve dumps."""

import os
import shutil

import numpy as np

from tests.test_eval_parity import make_dataset
from opental_tpu.tools import eval_open as cli


def _make_splits(tmp_path, n_splits=2, openset=True):
    """Per-split fixture files named with the reference's {id:d}
    templating (eval_open.py:51-53)."""
    for s in range(n_splits):
        d = tmp_path / f'split{s}'
        d.mkdir()
        gt, pred, cls = make_dataset(d, seed=s, openset=openset)
        shutil.copy(gt, tmp_path / f'gt_{s}.json')
        shutil.copy(pred, tmp_path / f'pred_{s}.json')
        shutil.copy(cls, tmp_path / f'cls_{s}.txt')
        os.makedirs(tmp_path / f'out_{s}', exist_ok=True)
        shutil.copy(pred, tmp_path / f'out_{s}' / 'pred.json')
    return (str(tmp_path / 'out_{id:d}' / 'pred.json'),
            str(tmp_path / 'gt_{id:d}.json'),
            str(tmp_path / 'cls_{id:d}.txt'))


def test_closed_set_route(tmp_path, capsys):
    pred_tpl, gt_tpl, cls_tpl = _make_splits(tmp_path, openset=False)
    cli.main([pred_tpl, gt_tpl, '--cls_idx_known', cls_tpl,
              '--all_splits', '0', '1'])
    out = capsys.readouterr().out
    assert 'Average mAP is' in out
    for s in (0, 1):
        txt = open(tmp_path / f'out_{s}' / 'eval.txt').read()
        lines = txt.strip().splitlines()
        assert len(lines) == 6            # 5 tIoUs + average
        assert lines[0].startswith('tIoU=0.3: mAP=')
        assert np.isfinite(float(lines[-1].split(': ')[1]))


def test_open_set_route_with_wi_and_curves(tmp_path, capsys):
    pred_tpl, _, cls_tpl = _make_splits(tmp_path, n_splits=1)
    # open-set GT is shared (NOT split-templated, eval_open.py:51)
    gt = str(tmp_path / 'gt_0.json')
    cli.main([pred_tpl, gt, '--cls_idx_known', cls_tpl,
              '--all_splits', '0', '--open_set', '--wi', '--draw_auc',
              '--ood_scoring', 'uncertainty'])
    out = capsys.readouterr().out
    for label in ('FAR@95', 'AUC_ROC', 'AUC_PR', 'OSDR'):
        assert f'Average {label} =' in out
    assert 'average mWI' in out
    txt = open(tmp_path / 'out_0' / 'eval_open.txt').read()
    assert txt.count('far@95=') == 5
    assert 'Average OSDR:' in txt
    auc_dir = tmp_path / 'out_0' / 'auc_data'
    assert auc_dir.is_dir() and len(list(auc_dir.iterdir())) > 0
