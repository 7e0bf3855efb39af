"""Sloppy-phrase (proximity span) matching.

Reference behavior: /root/reference/searcharray/phrase/spans.py +
roaringish/spans.pyx — a stateful span automaton the reference itself
flags as experimental ("may be slow, crash, or inaccurate",
/root/reference/searcharray/postings.py:694). We implement a clean,
well-specified semantics instead:

    A doc matches ``phrase`` at ``slop`` k iff it contains a window of
    positions of width (last - first) <= len(phrase) - 1 + k that covers
    every distinct query term with its query multiplicity (order-free,
    like the reference's span automaton). The frequency is the number of
    DISJOINT minimal such windows (greedy left-to-right).

This preserves the reference's tested invariants
(test_phrase_matches.py:206-221): exact-phrase matches are a subset of
every slop-k match set; slop-k freqs >= exact freqs; monotone
non-decreasing in k; and reproduces the reference's slop scenario
expectations (test_slop_matches.py) except the degenerate repeated-term
case ("the the the") that the reference automaton cannot genuinely span
(positions spread 21 apart vs max width 6) — we count that as no match.

Execution model: spans run on post-intersection candidate docs only
(docs containing all terms), so the per-doc Python loop touches a tiny
set; the heavy lifting (candidate intersection, decode) is vectorized.
"""
from __future__ import annotations

from collections import Counter
from typing import Dict, List, Tuple

import numpy as np

from . import kernels as K

_EMPTY_I64 = np.zeros(0, dtype=np.int64)


def _positions_by_doc(packed: np.ndarray) -> Dict[int, np.ndarray]:
    ids, posns = K.decode(packed)
    if len(ids) == 0:
        return {}
    starts = np.concatenate(([0], np.flatnonzero(np.diff(ids)) + 1, [len(ids)]))
    return {int(ids[s]): posns[s:e] for s, e in zip(starts[:-1], starts[1:])}


def _count_windows(events: List[Tuple[int, int]], need: Dict[int, int],
                   max_width: int) -> int:
    """Greedy disjoint minimal-window count over sorted (pos, term) events."""
    count = 0
    left = 0
    have: Counter = Counter()
    satisfied = 0
    n_need = len(need)
    for right, (pos_r, term_r) in enumerate(events):
        have[term_r] += 1
        if have[term_r] == need[term_r]:
            satisfied += 1
        while satisfied == n_need:
            pos_l, term_l = events[left]
            if pos_r - pos_l <= max_width:
                # minimal? try shrinking from the left while still satisfied
                while True:
                    pl, tl = events[left]
                    if have[tl] > need[tl]:
                        have[tl] -= 1
                        left += 1
                    else:
                        break
                count += 1
                # disjoint: reset window past this match
                for i in range(left, right + 1):
                    have[events[i][1]] -= 1
                satisfied = sum(1 for t, m in need.items() if have[t] >= m)
                left = right + 1
                break
            else:
                have[term_l] -= 1
                if have[term_l] == need[term_l] - 1:
                    satisfied -= 1
                left += 1
    return count


def span_freqs(encoded: List[np.ndarray], slop: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-doc sloppy-phrase frequencies over packed posting arrays.

    Returns (doc_ids, counts), doc_ids sorted ascending.
    """
    if len(encoded) < 2:
        raise ValueError("phrase must have at least two terms")
    if any(len(e) == 0 for e in encoded):
        return _EMPTY_I64, _EMPTY_I64

    # group identical query terms -> multiplicity
    uniq: List[np.ndarray] = []
    need: Dict[int, int] = {}
    seen: Dict[int, int] = {}  # id(array) -> uniq index
    for e in encoded:
        key = None
        for i, u in enumerate(uniq):
            if u is e or (len(u) == len(e) and np.array_equal(u, e)):
                key = i
                break
        if key is None:
            uniq.append(e)
            key = len(uniq) - 1
            need[key] = 0
        need[key] += 1

    # candidate docs: present in every distinct term's postings with
    # enough distinct positions for its multiplicity
    cand = None
    per_term_posns: List[Dict[int, np.ndarray]] = []
    for i, u in enumerate(uniq):
        by_doc = _positions_by_doc(u)
        ok = np.array(sorted(d for d, p in by_doc.items() if len(p) >= need[i]),
                      dtype=np.int64)
        per_term_posns.append(by_doc)
        cand = ok if cand is None else np.intersect1d(cand, ok, assume_unique=True)
    if cand is None or len(cand) == 0:
        return _EMPTY_I64, _EMPTY_I64

    max_width = len(encoded) - 1 + slop
    out_ids = []
    out_counts = []
    for doc in cand:
        events: List[Tuple[int, int]] = []
        for i in range(len(uniq)):
            for p in per_term_posns[i].get(int(doc), ()):  # noqa: B905
                events.append((int(p), i))
        events.sort()
        c = _count_windows(events, need, max_width)
        if c > 0:
            out_ids.append(int(doc))
            out_counts.append(c)
    return (np.asarray(out_ids, dtype=np.int64),
            np.asarray(out_counts, dtype=np.int64))
