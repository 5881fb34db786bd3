"""Tie-aware proposal-list comparison shared by parity tests.

Soft-NMS is order-sensitive at exact score ties: with synthetic videos
and random-init weights, overlapping boundary-pool windows give many
priors EXACTLY equal pooled features, so raw scores tie to ~1e-6 and
sub-tolerance float noise (torch-vs-jax, or batch-tiling between two jax
paths) flips the argmax pick order, reshaping the gaussian decay of the
rest of that class. assert_proposal_parity matches greedily under tight
tolerances and allows leftovers ONLY as tie-phase artifacts: in classes
whose reference output contains near-exact ties, in equal numbers on
both sides, and as a small fraction of the class.
"""

from collections import Counter


def close(a, b):
    return (a['label'] == b['label']
            and abs(a['score'] - b['score'])
            <= 2e-4 + 2e-3 * b['score']
            and abs(a['segment'][0] - b['segment'][0]) < 0.05
            and abs(a['segment'][1] - b['segment'][1]) < 0.05
            and abs(a['uncertainty'] - b['uncertainty'])
            <= 2e-4 + 2e-3 * b['uncertainty']
            and abs(a['actionness'] - b['actionness']) <= 2e-3)


def assert_proposal_parity(ref_json, our_json, min_total=100):
    """Greedy per-proposal matching with tight numeric tolerances; the
    only discrepancy allowed is a couple of knife-edge proposals per
    video whose soft-NMS-decayed score sits at the 1e-3 floor
    (segment_utils.py:147) plus tie-phase artifacts (see module
    docstring): leftovers must (a) sit in classes where the reference
    output itself contains near-exact score ties, (b) come in equal
    numbers on both sides, and (c) stay a small fraction of that
    class's proposals."""
    assert set(our_json['results']) == set(ref_json['results'])
    total = 0
    for vid in ref_json['results']:
        ref_props = sorted(ref_json['results'][vid],
                           key=lambda p: (p['label'], -p['score']))
        our_props = sorted(our_json['results'][vid],
                           key=lambda p: (p['label'], -p['score']))
        unmatched_ref = list(ref_props)
        unmatched_ours = []
        for a in our_props:
            hit = next((j for j, b in enumerate(unmatched_ref)
                        if close(a, b)), None)
            if hit is None:
                unmatched_ours.append(a)
            else:
                unmatched_ref.pop(hit)
        ours_left = Counter(p['label'] for p in unmatched_ours)
        ref_left = Counter(p['label'] for p in unmatched_ref)
        assert ours_left == ref_left, (vid, ours_left, ref_left)
        for label, cnt in ref_left.items():
            ref_l = sorted(p['score'] for p in ref_props
                           if p['label'] == label)
            has_tie = any(b - a <= 1e-5 + 1e-4 * b
                          for a, b in zip(ref_l, ref_l[1:]))
            assert has_tie, (vid, label, 'leftovers without tie witness',
                             [p for p in unmatched_ref
                              if p['label'] == label][:3])
            assert cnt <= max(2, len(ref_l) // 4), (vid, label, cnt,
                                                    len(ref_l))
        total += len(ref_props) - len(unmatched_ref)
    assert total > min_total, f'degenerate run: only {total} matched'
