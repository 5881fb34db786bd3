"""Evaluator parity vs the reference ANETdetection on synthetic GT/pred
JSONs (mAP, AUC-ROC/PR, FAR@95, OSDR, WI)."""

import json
import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/reference')

# the reference evaluator uses the np.float alias removed in numpy>=1.24
if not hasattr(np, 'float'):
    np.float = float  # type: ignore[attr-defined]

from opental_tpu.eval.detection import DetectionEvaluator  # noqa: E402

CLASSES = ['Run', 'Jump', 'Swim']
TIOUS = np.array([0.3, 0.5, 0.7])


def make_dataset(tmp_path, seed=0, n_videos=6, openset=True):
    rng = np.random.RandomState(seed)
    class_file = tmp_path / 'Class_Index_Known.txt'
    class_file.write_text(
        ''.join(f'{i + 1} {c}\n' for i, c in enumerate(CLASSES)))

    database = {}
    results = {}
    for v in range(n_videos):
        vid = f'video_{v:03d}'
        anns = []
        for _ in range(rng.randint(2, 5)):
            s = rng.uniform(0, 80)
            e = s + rng.uniform(2, 15)
            if openset and rng.rand() < 0.3:
                label = 'UnknownAction'
            else:
                label = CLASSES[rng.randint(len(CLASSES))]
            anns.append({'segment': [s, e], 'label': label})
        database[vid] = {'subset': 'test', 'annotations': anns}
        props = []
        for _ in range(rng.randint(5, 15)):
            s = rng.uniform(0, 80)
            e = s + rng.uniform(2, 15)
            props.append({
                'label': CLASSES[rng.randint(len(CLASSES))],
                'score': float(rng.uniform(0.01, 1)),
                'segment': [float(s), float(e)],
                'uncertainty': float(rng.uniform(0, 1)),
                'actionness': float(rng.uniform(0, 1)),
            })
        results[vid] = props

    gt_file = tmp_path / 'gt.json'
    gt_file.write_text(json.dumps({'database': database}))
    pred_file = tmp_path / 'pred.json'
    pred_file.write_text(json.dumps(
        {'version': 'THUMOS14', 'results': results, 'external_data': {}}))
    return str(gt_file), str(pred_file), str(class_file)


@pytest.mark.parametrize('ood_scoring', ['uncertainty', 'confidence'])
def test_eval_parity(tmp_path, ood_scoring, monkeypatch):
    import joblib

    from AFSD.evaluation import eval_detection as ref_mod

    # run the reference's joblib AP fan-out in-process so the np.float
    # shim above reaches it (loky workers are fresh interpreters)
    monkeypatch.setattr(
        ref_mod, 'Parallel',
        lambda n_jobs=None, **kw: joblib.Parallel(n_jobs=1, **kw))
    ANETdetection = ref_mod.ANETdetection
    gt_file, pred_file, class_file = make_dataset(tmp_path)

    kwargs = dict(tiou_thresholds=TIOUS, ood_scoring=ood_scoring,
                  subset=['test'], openset=True, dataset='thumos14')
    ref = ANETdetection(gt_file, pred_file, cls_idx_detection=class_file,
                        **kwargs)
    ours = DetectionEvaluator(gt_file, pred_file,
                              cls_idx_detection=class_file, **kwargs)

    # closed-style AP over the same activity index
    ref_map, ref_avg, ref_ap = ref.evaluate('AP')
    our_map, our_avg, our_ap = ours.evaluate('AP')
    np.testing.assert_allclose(our_ap, ref_ap, atol=1e-10)
    np.testing.assert_allclose(our_map, ref_map, atol=1e-10)

    ref.pre_evaluate()
    ours.pre_evaluate()

    ref_auc = ref.evaluate('AUC')
    our_auc = ours.evaluate('AUC')
    for a, b in zip(our_auc, ref_auc):
        np.testing.assert_allclose(a, b, atol=1e-7)

    np.testing.assert_allclose(ours.evaluate('OSDR'), ref.evaluate('OSDR'),
                               atol=1e-7)

    ref_mwi, ref_avg_wi, ref_wi = ref.evaluate('WI')
    our_mwi, our_avg_wi, our_wi = ours.evaluate('WI')
    np.testing.assert_allclose(our_wi, ref_wi, atol=1e-10)
