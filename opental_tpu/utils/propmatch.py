"""Tie-robust pairing of two proposal lists that should be equal up to
float noise.

Two compute paths of the same math (e.g. mesh-sharded packed ingest vs
single-device per-video inference) produce proposal lists whose scores
differ at the last ulp (batch tiling / collective reduction order).
Sorting both lists by (cls, -score) and zipping is order-UNSTABLE
exactly where two proposals' scores tie to within that noise: the ulp
decides which sorts first, each path can decide differently, and the
zip then pairs crosswise. The observed failure mode (round-5 dryrun
fusion leg) was two same-class proposals one window stride apart with
scores equal to 8 digits — both lists held the same pair, paired
crosswise, and the segment assertion exploded at a full stride's
difference. Same phenomenon as the soft-NMS pick-order ties handled by
the composed-parity matcher (tests/test_composed_parity.py).

The fix: within runs of near-tied scores, re-pair by segment instead —
segments ARE stable across paths (two genuinely different proposals
differ at stride scale, ~1e1, while cross-path float noise on one
proposal's segment is ~1e-4).
"""

from typing import Any, Dict, Iterable, List, Tuple

Proposal = Dict[str, Any]


def pair_proposals(want: Iterable[Proposal], got: Iterable[Proposal],
                   score_tol: float = 1e-5
                   ) -> List[Tuple[Proposal, Proposal]]:
    """Pair two equal-length proposal lists for comparison.

    Both lists sort by (cls, -score); consecutive entries of `want`
    whose class matches and whose score gap is <= score_tol form a tie
    run, and within each run both sides re-sort by segment. Returns the
    paired list; callers assert cls/score/segment closeness per pair.
    """
    want, got = list(want), list(got)
    assert len(want) == len(got), (len(want), len(got))
    key = lambda p: (p['cls'], -p['score'])  # noqa: E731
    segkey = lambda p: tuple(p['segment'])   # noqa: E731
    want = sorted(want, key=key)
    got = sorted(got, key=key)
    pairs: List[Tuple[Proposal, Proposal]] = []
    i, n = 0, len(want)
    while i < n:
        j = i + 1
        while (j < n and want[j]['cls'] == want[i]['cls']
               and want[j - 1]['score'] - want[j]['score'] <= score_tol):
            j += 1
        pairs.extend(zip(sorted(want[i:j], key=segkey),
                         sorted(got[i:j], key=segkey)))
        i = j
    return pairs
