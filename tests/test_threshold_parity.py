"""OOD-threshold calibration math vs the reference's inline formula
block (AFSD/thumos14/threshold.py:128-148): all six scoring formulas
and the 95%-TPR percentile pick, on random proposal sets."""

import numpy as np
import pytest

from opental_tpu.openset.threshold import (confidence_score,
                                           threshold_from_results)

SCORINGS = ['uncertainty', 'confidence', 'uncertainty_actionness',
            'a_by_inv_u', 'u_by_inv_a', 'half_au']


def _ref_threshold(result_dict, scoring):
    """Transliteration of threshold.py:128-148 (the block is inline in
    the reference's thresholding() driver, not importable)."""
    all_scores = []
    for _vid, proposal_list in result_dict.items():
        for prop in proposal_list:
            if scoring == 'uncertainty':
                ood_score = 1 - prop['uncertainty']
            elif scoring == 'confidence':
                ood_score = prop['score']
            elif scoring == 'uncertainty_actionness':
                ood_score = 1 - prop['uncertainty'] * prop['actionness']
            elif scoring == 'a_by_inv_u':
                ood_score = 1 - prop['actionness'] / (
                    1 - prop['uncertainty'] + 1e-6)
            elif scoring == 'u_by_inv_a':
                ood_score = 1 - prop['uncertainty'] / (
                    1 - prop['actionness'] + 1e-6)
            elif scoring == 'half_au':
                ood_score = 1 - 0.5 * (prop['actionness'] + 1) * \
                    prop['uncertainty']
            all_scores.append(ood_score)
    score_sorted = np.sort(all_scores)
    n = len(all_scores)
    top_k = n - int(n * 0.95)
    return score_sorted[top_k - 1]


def _proposals(seed, n_videos=7, n_props=23):
    rng = np.random.RandomState(seed)
    return {
        f'v{v}': [{'score': float(rng.uniform(0, 1)),
                   'uncertainty': float(rng.uniform(0, 1)),
                   'actionness': float(rng.uniform(0, 1))}
                  for _ in range(int(rng.randint(1, n_props)))]
        for v in range(n_videos)
    }


@pytest.mark.parametrize('scoring', SCORINGS)
@pytest.mark.parametrize('seed', [0, 1])
def test_threshold_matches_reference(scoring, seed):
    result_dict = _proposals(seed)
    want = _ref_threshold(result_dict, scoring)
    got = threshold_from_results(result_dict, scoring)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_confidence_score_is_one_minus_evaluator_ood():
    """The calibration confidence must be exactly 1 - the evaluator's
    ood_score formulas (eval_detection.py:181-202) so the stored
    threshold binarizes consistently at test time."""
    from opental_tpu.eval.detection import ood_score
    rng = np.random.RandomState(3)
    for _ in range(20):
        prop = {'score': float(rng.uniform(0, 1)),
                'uncertainty': float(rng.uniform(0, 1)),
                'actionness': float(rng.uniform(0, 1))}
        for scoring in SCORINGS:
            if scoring == 'confidence':
                # evaluator: ood = 1 - score; calibration uses score
                continue
            np.testing.assert_allclose(
                confidence_score(prop, scoring),
                1.0 - ood_score(prop, scoring),
                rtol=1e-12)
