"""pair_proposals: tie-robust cross-path proposal pairing.

Reproduces the round-5 dryrun fusion-leg failure mode: two same-class
proposals one window stride apart whose scores tie to the last ulp, and
the ulp orders them differently in the two lists — a plain
sorted-by-(cls,-score) zip pairs them crosswise and the segment
assertion explodes at a full stride."""

import numpy as np

from opental_tpu.utils.propmatch import pair_proposals


def _p(cls, score, seg):
    return {'cls': cls, 'score': score, 'segment': list(seg)}


def test_crosswise_tie_repairs_by_segment():
    # path A sorts the 12.69s proposal first, path B the 6.30s one
    want = [_p(4, 0.01194615, (12.6957, 12.8606)),
            _p(4, 0.01194615, (6.3045, 6.4639))]
    got = [_p(4, 0.01194615, (6.3045, 6.4639)),
           _p(4, 0.01194614, (12.6957, 12.8606))]
    for a, b in pair_proposals(want, got):
        assert a['cls'] == b['cls']
        np.testing.assert_allclose(a['score'], b['score'],
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(a['segment'], b['segment'],
                                   rtol=1e-4, atol=1e-4)


def test_distinct_scores_keep_score_order():
    # far-apart scores must NOT be re-paired by segment: the pairing is
    # by score rank exactly as before
    want = [_p(1, 0.9, (5.0, 6.0)), _p(1, 0.2, (1.0, 2.0))]
    got = [_p(1, 0.2000001, (1.0, 2.0)), _p(1, 0.9000001, (5.0, 6.0))]
    pairs = pair_proposals(want, got)
    assert [a['segment'] for a, _ in pairs] == \
           [b['segment'] for _, b in pairs]


def test_classes_never_mix():
    # a tie across a class boundary stays within its class
    want = [_p(1, 0.5, (1.0, 2.0)), _p(2, 0.5, (3.0, 4.0))]
    got = [_p(2, 0.5, (3.0, 4.0)), _p(1, 0.5, (1.0, 2.0))]
    for a, b in pair_proposals(want, got):
        assert a['cls'] == b['cls']
        assert a['segment'] == b['segment']


def test_tie_run_of_three():
    segs = [(1.0, 2.0), (3.0, 4.0), (5.0, 6.0)]
    want = [_p(7, 0.3 + 1e-7 * i, s) for i, s in enumerate(segs)]
    got = [_p(7, 0.3 + 1e-7 * (2 - i), s)
           for i, s in enumerate(reversed(segs))]
    for a, b in pair_proposals(want, got):
        assert a['segment'] == b['segment']


def test_length_mismatch_raises():
    import pytest
    with pytest.raises(AssertionError):
        pair_proposals([_p(1, 0.5, (1, 2))], [])
