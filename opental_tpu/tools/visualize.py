"""Qualitative detection visualization.

Reference: experiments/demo/visualization.py — render predicted vs GT
segments for chosen videos as timeline plots (and optionally frame
strips from the npy video).

CLI: python -m opental_tpu.tools.visualize <pred.json> <gt.json> \
     --videos v1 v2 --out_dir viz/ [--npy_dir ...] [--threshold 0.X]
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Optional

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    return plt


def timeline_figure(video: str, preds: List[dict], gts: List[dict],
                    out_png: str, top_n: int = 10,
                    ood_threshold: Optional[float] = None,
                    frames: Optional[np.ndarray] = None,
                    fps: float = 10.0) -> None:
    plt = _plt()
    preds = sorted(preds, key=lambda p: -p['score'])[:top_n]
    n_rows = 2 if frames is None else 3
    fig, axes = plt.subplots(n_rows, 1, figsize=(10, 2 + n_rows),
                             sharex=(frames is None))
    ax_gt, ax_pred = axes[0], axes[1]

    for g in gts:
        ax_gt.axvspan(g['segment'][0], g['segment'][1], alpha=0.4,
                      color='green')
        ax_gt.text(g['segment'][0], 0.5, g['label'], fontsize=8)
    ax_gt.set_ylabel('GT')
    ax_gt.set_yticks([])

    for i, p in enumerate(preds):
        rejected = (ood_threshold is not None
                    and (1.0 - p.get('uncertainty', 0.0)) < ood_threshold)
        color = 'red' if rejected else 'tab:blue'
        y = 1.0 - (i + 0.5) / max(len(preds), 1)
        ax_pred.hlines(y, p['segment'][0], p['segment'][1], color=color,
                       lw=3)
        label = '__unknown__' if rejected else p['label']
        ax_pred.text(p['segment'][0], y + 0.02,
                     f"{label} {p['score']:.2f}", fontsize=7)
    ax_pred.set_ylabel(f'top-{len(preds)} preds')
    ax_pred.set_yticks([])
    ax_pred.set_xlabel('time (s)')

    if frames is not None:
        strip_idx = np.linspace(0, len(frames) - 1, 8).astype(int)
        strip = np.concatenate([frames[i] for i in strip_idx], axis=1)
        axes[2].imshow(strip)
        axes[2].set_yticks([])
        axes[2].set_xticks([])
    fig.suptitle(video)
    fig.tight_layout()
    fig.savefig(out_png, dpi=120)
    plt.close(fig)


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument('pred_json')
    p.add_argument('gt_json')
    p.add_argument('--videos', nargs='*', default=None)
    p.add_argument('--out_dir', default='viz')
    p.add_argument('--npy_dir', default=None)
    p.add_argument('--top_n', type=int, default=10)
    p.add_argument('--ood_threshold', type=float, default=None)
    args = p.parse_args(argv)

    preds = json.load(open(args.pred_json))['results']
    gt = json.load(open(args.gt_json))['database']
    videos = args.videos or list(preds)[:5]
    os.makedirs(args.out_dir, exist_ok=True)
    for video in videos:
        frames = None
        if args.npy_dir:
            path = os.path.join(args.npy_dir, video + '.npy')
            if os.path.exists(path):
                frames = np.load(path, mmap_mode='r')
        timeline_figure(video, preds.get(video, []),
                        gt.get(video, {}).get('annotations', []),
                        os.path.join(args.out_dir, f'{video}.png'),
                        top_n=args.top_n,
                        ood_threshold=args.ood_threshold, frames=frames)
        print('wrote', os.path.join(args.out_dir, f'{video}.png'))


if __name__ == '__main__':
    main()
