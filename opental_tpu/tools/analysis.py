"""Analysis + comparison plots over detection results and train logs.

Compact port of the reference analysis suite (experiments/
analyze_actionness.py, analyze_gradnorm.py, analyze_stats.py,
draw_auc_comparison.py, draw_oodbar_comparison.py,
AFSD/thumos14/draw_distribution.py): per-bucket score/uncertainty/
actionness distributions of greedily-matched predictions, grad-norm
curves from the JSONL train log, and multi-method ROC/PR/OSDR overlays
from the evaluator's pickled curve data.

Usage (library or CLI):
  python -m opental_tpu.tools.analysis scores <pred.json> <gt.json> \
      --cls_idx <Class_Index_Known.txt> --out dist.png
  python -m opental_tpu.tools.analysis gradnorm <metrics.jsonl> --out g.png
  python -m opental_tpu.tools.analysis compare_auc <name=roc_data.pkl> ...
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
from typing import Dict, List, Sequence

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    return plt


def bucket_distributions(pred_json: str, gt_json: str, cls_idx: str,
                         ood_scoring: str = 'uncertainty',
                         tiou: float = 0.3) -> Dict[str, Dict[str, list]]:
    """Bucket predictions into bg/known/unknown via the evaluator's
    greedy matcher and collect their score fields
    (analyze_actionness.py semantics)."""
    from opental_tpu.eval.detection import (DetectionEvaluator,
                                            split_results_by_gt)
    ev = DetectionEvaluator(gt_json, pred_json, cls_idx,
                            tiou_thresholds=np.asarray([tiou]),
                            ood_scoring=ood_scoring, subset=['test'],
                            openset=True)
    scores, labels, gts = split_results_by_gt(
        ev.prediction, ev.ground_truth, sorted(set(ev.video_lst)),
        np.asarray([tiou]))
    return {'ood_score': scores[0], 'pred_label': labels[0],
            'gt_label': gts[0]}


def plot_score_distributions(buckets: Dict[str, Dict[str, list]],
                             out_png: str, bins: int = 40) -> None:
    plt = _plt()
    plt.figure(figsize=(8, 5))
    colors = {'known': 'g', 'unknown': 'r', 'bg': 'gray'}
    for name, color in colors.items():
        vals = np.asarray(buckets['ood_score'][name], float)
        if len(vals):
            plt.hist(vals, bins=bins, alpha=0.5, density=True,
                     color=color, label=f'{name} (n={len(vals)})')
    plt.xlabel('OOD score')
    plt.ylabel('density')
    plt.legend()
    plt.tight_layout()
    plt.savefig(out_png)
    plt.close()


def plot_gradnorm(metrics_jsonl: str, out_png: str,
                  key: str = 'grad_norm') -> None:
    """Grad-norm (or any metric) over steps from the train JSONL log
    (analyze_gradnorm.py equivalent over our logging format)."""
    steps, vals = [], []
    with open(metrics_jsonl) as f:
        for line in f:
            rec = json.loads(line)
            if key in rec:
                steps.append(rec['step'])
                vals.append(rec[key])
    plt = _plt()
    plt.figure(figsize=(8, 4))
    plt.plot(steps, vals, lw=0.8)
    plt.xlabel('step')
    plt.ylabel(key)
    plt.yscale('log')
    plt.tight_layout()
    plt.savefig(out_png)
    plt.close()


def compare_auc_curves(named_pickles: Dict[str, str], out_png: str,
                       which: str = 'roc', tidx: int = 0) -> None:
    """Overlay one tIoU's ROC (or PR) curves from several methods'
    saved curve data (draw_auc_comparison.py)."""
    plt = _plt()
    plt.figure(figsize=(8, 5))
    for name, path in named_pickles.items():
        with open(path, 'rb') as f:
            data = pickle.load(f)
        if which == 'roc':
            x, y = data['fpr'][tidx], data['tpr'][tidx]
        else:
            x, y = data['recall'][tidx], data['precision'][tidx]
        plt.plot(x, y, label=f"{name} (auc={data['auc'][tidx]*100:.2f}%)")
    plt.xlabel('FPR' if which == 'roc' else 'Recall')
    plt.ylabel('TPR' if which == 'roc' else 'Precision')
    plt.legend()
    plt.tight_layout()
    plt.savefig(out_png)
    plt.close()


def ood_bar_comparison(named_buckets: Dict[str, Dict], out_png: str
                       ) -> None:
    """Mean OOD score of known vs unknown per method, as grouped bars
    (draw_oodbar_comparison.py)."""
    plt = _plt()
    names = list(named_buckets)
    known = [np.mean(named_buckets[n]['ood_score']['known'] or [0])
             for n in names]
    unknown = [np.mean(named_buckets[n]['ood_score']['unknown'] or [0])
               for n in names]
    x = np.arange(len(names))
    plt.figure(figsize=(8, 4))
    plt.bar(x - 0.2, known, width=0.4, label='known', color='g')
    plt.bar(x + 0.2, unknown, width=0.4, label='unknown', color='r')
    plt.xticks(x, names, rotation=20)
    plt.ylabel('mean OOD score')
    plt.legend()
    plt.tight_layout()
    plt.savefig(out_png)
    plt.close()


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest='cmd', required=True)
    s1 = sub.add_parser('scores')
    s1.add_argument('pred_json')
    s1.add_argument('gt_json')
    s1.add_argument('--cls_idx', required=True)
    s1.add_argument('--ood_scoring', default='uncertainty')
    s1.add_argument('--tiou', type=float, default=0.3)
    s1.add_argument('--out', default='score_dist.png')
    s2 = sub.add_parser('gradnorm')
    s2.add_argument('metrics_jsonl')
    s2.add_argument('--key', default='grad_norm')
    s2.add_argument('--out', default='gradnorm.png')
    s3 = sub.add_parser('compare_auc')
    s3.add_argument('named', nargs='+',
                    help='name=path/to/roc_data.pkl entries')
    s3.add_argument('--which', default='roc', choices=['roc', 'pr'])
    s3.add_argument('--tidx', type=int, default=0)
    s3.add_argument('--out', default='auc_comparison.png')
    args = p.parse_args(argv)

    if args.cmd == 'scores':
        buckets = bucket_distributions(args.pred_json, args.gt_json,
                                       args.cls_idx, args.ood_scoring,
                                       args.tiou)
        plot_score_distributions(buckets, args.out)
        print('wrote', args.out)
    elif args.cmd == 'gradnorm':
        plot_gradnorm(args.metrics_jsonl, args.out, args.key)
        print('wrote', args.out)
    elif args.cmd == 'compare_auc':
        named = dict(e.split('=', 1) for e in args.named)
        compare_auc_curves(named, args.out, args.which, args.tidx)
        print('wrote', args.out)


if __name__ == '__main__':
    main()
