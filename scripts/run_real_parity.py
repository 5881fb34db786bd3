"""One-command real-data parity runner (north-star metric clause).

The released OpenTAL checkpoints and real THUMOS14/ActivityNet npy data
are Google-Drive artifacts this environment cannot fetch (BASELINE.md
"Status of the metric-parity clause"). This script makes the blocked
claim executable the moment those artifacts exist: given the released
torch checkpoint and the dataset npy directory, it

  1. runs OUR inference CLI (tools/test.py for THUMOS14 or
     tools/test_anet.py for --dataset anet; both load torch .ckpt
     files directly — conversion happens on the fly),
  2. obtains the REFERENCE prediction JSON: either you pass one you
     already produced (--ref_json, e.g. from a GPU box via
     /root/reference/experiments/opental/test_opental_final.sh), or
     this script runs the reference's own AFSD/<ds>/test.py in a
     subprocess (--run_reference; needs a working torch setup and is
     very slow on CPU). The subprocess runs from the WRITABLE --workdir
     (the reference tree is read-only here) with a datasets/ symlink
     into your data root, so the reference's relative paths resolve
     and its output lands under <workdir>/output/,
  3. evaluates BOTH prediction files with our evaluator (exact vs
     ANETdetection, tests/test_eval_parity.py) — closed-set mAP per
     tIoU + open-set AUC/FAR95/OSDR — and asserts |ours - reference|
     <= 0.5 points for mAP@0.5 and average OSDR (BASELINE.json
     north-star clause). THUMOS14 uses tIoU .3:.7 on known_gt.json /
     thumos_gt.json (AFSD/thumos14/eval_open.py:17); ANet uses tIoU
     .1:.5 on known_val_gt.json / all_val_gt.json
     (AFSD/anet/eval_open.py:16).

Usage (THUMOS14):
  python scripts/run_real_parity.py \
      --ckpt models/thumos14/opental_final/split_0/checkpoint-16.ckpt \
      --data_root datasets/thumos14 --split 0 \
      [--ref_json output/ref/split_0/thumos14_open_rgb.json] \
      [--run_reference] [--workdir /tmp/real_parity]

Usage (ActivityNet):
  python scripts/run_real_parity.py --dataset anet \
      --ckpt models/anet/opental/split_0/checkpoint-16.ckpt \
      --data_root datasets/activitynet --split 0 \
      [--ref_json ...] [--run_reference]

Expected layout under --data_root (the reference's own, README.md:41-62):
  THUMOS14: test_npy/*.npy, annotations_open/split_<id>/
    {Class_Index_Known.txt, test_Annotation_known.csv, known_gt.json},
    annotations/{thumos_gt.json, test_video_info.csv}.
  ANet: train_val_npy_112/*.npy, annotations_open/split_<id>/
    {action_known.txt, video_info_trainval_openset.json,
    known_val_gt.json, all_val_gt.json}.

Reference command equivalence: experiments/opental/test_opental_final.sh
+ eval_opental_final.sh (single split); AFSD/anet/test.py + eval_open.py
for --dataset anet.
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
    d = args.data_root
    if args.dataset == 'anet':
        from opental_tpu.tools.test_anet import run_test_anet
        sp = os.path.join(d, f'annotations_open/split_{args.split}')
        cfg = load_config(
            args.config, open_set=True, split=args.split,
            overrides={
                'testing.checkpoint_path': args.ckpt,
                'testing.output_path': out_dir,
                'testing.output_json': 'anet_open_rgb.json',
                'dataset.testing.video_mp4_path':
                    os.path.join(d, 'train_val_npy_112'),
                'dataset.testing.video_info_path':
                    os.path.join(sp, 'video_info_trainval_openset.json'),
                'dataset.class_info_path':
                    os.path.join(sp, 'action_known.txt'),
            })
        return run_test_anet(cfg, video_batch=16)
    from opental_tpu.tools.test import run_test
    cfg = load_config(
        args.config, open_set=True, split=args.split,
        overrides={
            'testing.checkpoint_path': args.ckpt,
            'testing.output_path': out_dir,
            'testing.output_json': 'thumos14_open_rgb.json',
            # packed + device_ingest are the defaults (round 5) — the
            # fastest dataset-scale e2e mode, parity-exact
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


def run_reference(args):
    """Drive the reference's own test.py (test_opental_final.sh:20-24 /
    AFSD/anet/test.py). Needs a torch environment; ~10 s/clip on CPU.

    The subprocess runs from the writable --workdir (the reference tree
    is read-only in this environment): a datasets/ symlink into the
    data root's parent makes the config's relative dataset paths
    resolve, and the reference writes its output/ under the workdir."""
    env = dict(os.environ)
    env['PYTHONPATH'] = '/root/reference:' + env.get('PYTHONPATH', '')
    workdir = os.path.abspath(args.workdir)
    os.makedirs(workdir, exist_ok=True)
    datasets_link = os.path.join(workdir, 'datasets')
    datasets_root = os.path.dirname(os.path.abspath(args.data_root))
    if os.path.lexists(datasets_link):
        # re-point a stale link when --data_root moved between runs
        # sharing a --workdir (e.g. THUMOS then ANet parity)
        if (not os.path.islink(datasets_link)
                or os.readlink(datasets_link) != datasets_root):
            if not os.path.islink(datasets_link):
                raise FileExistsError(
                    f'{datasets_link} exists and is not a symlink; '
                    'refusing to replace it')
            os.unlink(datasets_link)
            os.symlink(datasets_root, datasets_link)
    else:
        os.symlink(datasets_root, datasets_link)
    script = ('AFSD/anet/test.py' if args.dataset == 'anet'
              else 'AFSD/thumos14/test.py')
    out_json = ('anet_open_rgb.json' if args.dataset == 'anet'
                else 'thumos14_open_rgb.json')
    cmd = [sys.executable, os.path.join('/root/reference', script),
           os.path.abspath(args.config),
           '--open_set', f'--split={args.split}',
           f'--output_json={out_json}']
    subprocess.run(cmd, cwd=workdir, env=env, check=True)
    # the reference writes to its config's output_path (relative ->
    # under the workdir), e.g. output/<exp>/split_<id>/<out_json>
    for root, _dirs, files in os.walk(os.path.join(workdir, 'output')):
        if out_json in files and f'split_{args.split}' in root:
            return os.path.join(root, out_json)
    raise FileNotFoundError(
        f'{out_json} not found under {workdir}/output')


def evaluate(pred_json, data_root, split, dataset='thumos14'):
    """Closed mAP + open-set metrics with OUR evaluator (parity-tested
    vs the reference's, tests/test_eval_parity.py)."""
    from opental_tpu.eval.detection import DetectionEvaluator
    if dataset == 'anet':
        # AFSD/anet/eval_open.py:16
        tious = np.asarray([0.1, 0.2, 0.3, 0.4, 0.5])
        sp = os.path.join(data_root, f'annotations_open/split_{split}')
        cls_idx = os.path.join(sp, 'action_known.txt')
        closed_gt = os.path.join(sp, 'known_val_gt.json')
        open_gt = os.path.join(sp, 'all_val_gt.json')
        subset = ['validation']
    else:
        tious = np.asarray([0.3, 0.4, 0.5, 0.6, 0.7])
        sp = os.path.join(data_root, f'annotations_open/split_{split}')
        cls_idx = os.path.join(sp, 'Class_Index_Known.txt')
        closed_gt = os.path.join(sp, 'known_gt.json')
        open_gt = os.path.join(data_root, 'annotations/thumos_gt.json')
        subset = ['test']
    closed = DetectionEvaluator(
        closed_gt, pred_json, cls_idx_detection=cls_idx,
        tiou_thresholds=tious, subset=subset, openset=False,
        dataset=dataset)
    maps, avg_map, _ = closed.evaluate('AP')
    open_ev = DetectionEvaluator(
        open_gt, pred_json, cls_idx_detection=cls_idx,
        tiou_thresholds=tious, ood_scoring='uncertainty', subset=subset,
        openset=True, dataset=dataset)
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
                   help='reference dataset root (thumos14 / activitynet)')
    p.add_argument('--dataset', default='thumos14',
                   choices=['thumos14', 'anet'])
    p.add_argument('--split', type=int, default=0)
    p.add_argument('--config', default=None,
                   help='defaults per dataset: configs/'
                        'thumos14_opental_final.yaml / anet_opental.yaml')
    p.add_argument('--ref_json', default=None,
                   help='pre-computed reference prediction JSON')
    p.add_argument('--run_reference', action='store_true',
                   help='run the reference test.py in a subprocess (slow)')
    p.add_argument('--workdir', default='./output/real_parity')
    args = p.parse_args(argv)
    if args.config is None:
        args.config = ('configs/anet_opental.yaml'
                       if args.dataset == 'anet'
                       else 'configs/thumos14_opental_final.yaml')

    # mAP@0.5 is the shared headline column of both reference eval
    # protocols (thumos tIoU .3:.7, anet tIoU .1:.5 — 0.5 is in both)
    ours_dir = os.path.join(args.workdir,
                            f'ours/{args.dataset}/split_{args.split}')
    os.makedirs(ours_dir, exist_ok=True)
    ours_json = run_ours(args, ours_dir)
    print(f'ours: {ours_json}')

    if args.ref_json:
        ref_json = args.ref_json
    elif args.run_reference:
        ref_json = run_reference(args)
    else:
        print('No --ref_json / --run_reference: evaluating ours only.')
        ours = evaluate(ours_json, args.data_root, args.split,
                        args.dataset)
        print(json.dumps(ours, indent=2))
        return 0

    ours = evaluate(ours_json, args.data_root, args.split, args.dataset)
    ref = evaluate(ref_json, args.data_root, args.split, args.dataset)
    report = {'dataset': args.dataset, 'ours': ours, 'reference': ref,
              'diff_mAP@0.5_pts':
                  100 * abs(ours['mAP'][0.5] - ref['mAP'][0.5]),
              'diff_avg_OSDR_pts':
                  100 * abs(ours['avg_OSDR'] - ref['avg_OSDR'])}
    out = os.path.join(args.workdir,
                       f'parity_{args.dataset}_split_{args.split}.json')
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
