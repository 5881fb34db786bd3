"""One-command real-data parity runner (north-star metric clause).

The released OpenTAL checkpoints and real THUMOS14 npy data are
Google-Drive artifacts this environment cannot fetch (BASELINE.md
"Status of the metric-parity clause"). This script makes the blocked
claim executable the moment those artifacts exist: given the released
torch checkpoint and the test-set npy directory, it

  1. runs OUR inference CLI (tools/test.py loads torch .ckpt files
     directly — conversion happens on the fly) on the chosen split,
  2. obtains the REFERENCE prediction JSON: either you pass one you
     already produced (--ref_json, e.g. from a GPU box via
     /root/reference/experiments/opental/test_opental_final.sh), or
     this script runs the reference's own AFSD/thumos14/test.py in a
     subprocess (--run_reference; needs a working torch setup and is
     very slow on CPU),
  3. evaluates BOTH prediction files with our evaluator (exact vs
     ANETdetection, tests/test_eval_parity.py) — closed-set mAP per
     tIoU on known_gt.json and open-set AUC/FAR95/OSDR on the full GT —
     and asserts |ours - reference| <= 0.5 points for mAP@0.5 and
     average OSDR (BASELINE.json north-star clause).

Usage:
  python scripts/run_real_parity.py \
      --ckpt models/thumos14/opental_final/split_0/checkpoint-16.ckpt \
      --data_root datasets/thumos14 --split 0 \
      [--ref_json output/ref/split_0/thumos14_open_rgb.json] \
      [--run_reference] [--workdir /tmp/real_parity]

Expected layout under --data_root (the reference's own, README.md:41-62):
  test_npy/*.npy, annotations_open/split_<id>/{Class_Index_Known.txt,
  test_Annotation_known.csv, known_gt.json}, annotations_open/
  test_Annotation_open.csv, annotations/thumos_gt.json,
  annotations/test_video_info.csv.

Reference command equivalence: experiments/opental/test_opental_final.sh
+ eval_opental_final.sh (single split).
"""

import argparse
import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

TOL_PTS = 0.5                       # north-star clause, BASELINE.json


def run_ours(args, out_dir):
    from opental_tpu.config import load_config
    from opental_tpu.tools.test import run_test
    d = args.data_root
    cfg = load_config(
        args.config, open_set=True, split=args.split,
        overrides={
            'testing.checkpoint_path': args.ckpt,
            'testing.output_path': out_dir,
            'testing.output_json': 'thumos14_open_rgb.json',
            # recommended dataset-scale e2e mode (MIGRATION.md §4)
            'testing.packed': True, 'testing.device_ingest': True,
            'dataset.testing.video_data_path':
                os.path.join(d, 'test_npy'),
            'dataset.testing.video_info_path':
                os.path.join(d, 'annotations/test_video_info.csv'),
            'dataset.testing.video_anno_path':
                os.path.join(d, f'annotations_open/split_{args.split}/'
                                'test_Annotation_known.csv'),
            'dataset.class_info_path':
                os.path.join(d, f'annotations_open/split_{args.split}/'
                                'Class_Index_Known.txt'),
        })
    return run_test(cfg)


def run_reference(args, out_dir):
    """Drive the reference's own test.py (test_opental_final.sh:20-24).
    Needs a torch environment; on CPU this takes ~10 s/clip."""
    env = dict(os.environ)
    env['PYTHONPATH'] = '/root/reference:' + env.get('PYTHONPATH', '')
    cmd = [sys.executable, 'AFSD/thumos14/test.py', args.config,
           '--open_set', f'--split={args.split}',
           '--output_json=thumos14_open_rgb.json']
    subprocess.run(cmd, cwd='/root/reference', env=env, check=True)
    return os.path.join('/root/reference/output/opental_final',
                        f'split_{args.split}', 'thumos14_open_rgb.json')


def evaluate(pred_json, data_root, split):
    """Closed mAP + open-set metrics with OUR evaluator (parity-tested
    vs the reference's, tests/test_eval_parity.py)."""
    from opental_tpu.eval.detection import DetectionEvaluator
    tious = np.asarray([0.3, 0.4, 0.5, 0.6, 0.7])
    cls_idx = os.path.join(
        data_root, f'annotations_open/split_{split}/Class_Index_Known.txt')
    closed = DetectionEvaluator(
        os.path.join(data_root,
                     f'annotations_open/split_{split}/known_gt.json'),
        pred_json, cls_idx_detection=cls_idx, tiou_thresholds=tious,
        subset=['test'], openset=False, dataset='thumos14')
    maps, avg_map, _ = closed.evaluate('AP')
    open_ev = DetectionEvaluator(
        os.path.join(data_root, 'annotations/thumos_gt.json'),
        pred_json, cls_idx_detection=cls_idx, tiou_thresholds=tious,
        ood_scoring='uncertainty', subset=['test'], openset=True,
        dataset='thumos14')
    open_ev.pre_evaluate()
    auc_roc, auc_pr, far_95 = open_ev.evaluate('AUC')
    osdr = open_ev.evaluate('OSDR')
    return {
        'mAP': dict(zip(map(float, tious), map(float, maps))),
        'avg_mAP': float(avg_map),
        'OSDR': [float(x) for x in np.asarray(osdr).ravel()],
        'avg_OSDR': float(np.mean(osdr)),
        'avg_AUC_ROC': float(np.mean(auc_roc)),
        'avg_AUC_PR': float(np.mean(auc_pr)),
        'avg_FAR95': float(np.mean(far_95)),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--ckpt', required=True,
                   help='released torch checkpoint (.ckpt)')
    p.add_argument('--data_root', required=True,
                   help='reference THUMOS14 dataset root')
    p.add_argument('--split', type=int, default=0)
    p.add_argument('--config',
                   default='configs/thumos14_opental_final.yaml')
    p.add_argument('--ref_json', default=None,
                   help='pre-computed reference prediction JSON')
    p.add_argument('--run_reference', action='store_true',
                   help='run the reference test.py in-process (slow)')
    p.add_argument('--workdir', default='./output/real_parity')
    args = p.parse_args(argv)

    ours_dir = os.path.join(args.workdir, f'ours/split_{args.split}')
    os.makedirs(ours_dir, exist_ok=True)
    ours_json = run_ours(args, ours_dir)
    print(f'ours: {ours_json}')

    if args.ref_json:
        ref_json = args.ref_json
    elif args.run_reference:
        ref_json = run_reference(args, args.workdir)
    else:
        print('No --ref_json / --run_reference: evaluating ours only.')
        ours = evaluate(ours_json, args.data_root, args.split)
        print(json.dumps(ours, indent=2))
        return 0

    ours = evaluate(ours_json, args.data_root, args.split)
    ref = evaluate(ref_json, args.data_root, args.split)
    report = {'ours': ours, 'reference': ref,
              'diff_mAP@0.5_pts':
                  100 * abs(ours['mAP'][0.5] - ref['mAP'][0.5]),
              'diff_avg_OSDR_pts':
                  100 * abs(ours['avg_OSDR'] - ref['avg_OSDR'])}
    out = os.path.join(args.workdir, f'parity_split_{args.split}.json')
    with open(out, 'w') as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    ok = (report['diff_mAP@0.5_pts'] <= TOL_PTS
          and report['diff_avg_OSDR_pts'] <= TOL_PTS)
    print(f'PARITY {"OK" if ok else "FAIL"} '
          f'(tolerance {TOL_PTS} points); report: {out}')
    return 0 if ok else 1


if __name__ == '__main__':
    raise SystemExit(main())
