"""Sloppy-phrase (proximity span) matching — vectorized.

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

Execution model (all-numpy, no per-event Python):

1. Candidate docs = docs holding every distinct term with its needed
   multiplicity (vectorized posting-key intersection).
2. All candidates' positions are flattened into ONE event array with
   composite positions ``doc_rank * STRIDE + posn`` (STRIDE > MAX_POSN +
   max_width, so windows can never span docs).
3. The greedy count uses the classic observation that the minimal cover
   window ending at event r is [Lmax(r), r], where Lmax(r) = min over
   terms t of the position of the need_t-th most recent occurrence of t
   at or before r — computed for ALL events at once with searchsorted.
   Lmax is monotone in r, so greedy disjoint selection is a tiny loop
   that runs once per MATCH (binary search per step), not per event.

A pure-Python reference implementation (``_count_windows_py``) is kept
for property tests (tests/test_spans.py cross-checks the two).
"""
from __future__ import annotations

from collections import Counter
from typing import Dict, List, Tuple

import numpy as np

from . import kernels as K
from .constants import MAX_POSN

_EMPTY_I64 = np.zeros(0, dtype=np.int64)

# composite-position stride between docs: no window (width <= MAX_POSN)
# can cross a doc boundary
_STRIDE = np.int64(1) << np.int64(20)


def _positions_by_doc(packed: np.ndarray) -> Dict[int, np.ndarray]:
    ids, posns = K.decode(packed)
    if len(ids) == 0:
        return {}
    starts = np.concatenate(([0], np.flatnonzero(np.diff(ids)) + 1, [len(ids)]))
    return {int(ids[s]): posns[s:e] for s, e in zip(starts[:-1], starts[1:])}


def _group_terms(encoded: List[np.ndarray]) -> Tuple[List[np.ndarray], List[int]]:
    """Group identical query terms -> (unique arrays, multiplicities)."""
    uniq: List[np.ndarray] = []
    need: List[int] = []
    for e in encoded:
        key = None
        for i, u in enumerate(uniq):
            if u is e or (len(u) == len(e) and np.array_equal(u, e)):
                key = i
                break
        if key is None:
            uniq.append(e)
            need.append(0)
            key = len(uniq) - 1
        need[key] += 1
    return uniq, need


def span_freqs(encoded: List[np.ndarray], slop: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-doc sloppy-phrase frequencies over packed posting arrays.

    Returns (doc_ids, counts), doc_ids sorted ascending.
    """
    if len(encoded) < 2:
        raise ValueError("phrase must have at least two terms")
    if any(len(e) == 0 for e in encoded):
        return _EMPTY_I64, _EMPTY_I64

    uniq, need = _group_terms(encoded)
    n_terms = len(uniq)
    max_width = len(encoded) - 1 + slop
    if max_width >= int(_STRIDE) - MAX_POSN:  # pragma: no cover - absurd slop
        raise ValueError("slop too large for composite-position layout")

    # rare-first trim (reference trim_phrase_search): hot terms' words in
    # docs the rarest term never touches are dropped before anything
    # else — cuts candidate/tf work from O(hot) to O(rare)
    uniq = K.trim_to_rarest(uniq)

    # --- candidate docs: in every term's postings with enough positions
    cand = None
    for i, u in enumerate(uniq):
        ids, tfs = K.termfreqs(u)
        ok = ids[tfs >= need[i]]
        cand = ok if cand is None else cand[np.isin(cand, ok, assume_unique=True)]
        if len(cand) == 0:
            return _EMPTY_I64, _EMPTY_I64

    # --- proximity pre-filter BEFORE decoding, so position decode volume
    # is O(candidate windows), not O(hot-term corpus positions). Small
    # widths (the common slop) get the bit-exact cross-term mask
    # (position granularity, count-preserving — kernels.
    # mask_nearby_positions); wider windows fall back to posn-block
    # pre-intersection (reference _intersect_all, header +-delta)
    sliced_all = [K.slice_keys(u, cand) for u in uniq]
    if n_terms > 1:
        if max_width <= 18:
            sliced_all = K.mask_nearby_positions(sliced_all, max_width)
        else:
            sliced_all = K.intersect_nearby_headers(sliced_all,
                                                    max_width // 18 + 1)
        if any(len(s) == 0 for s in sliced_all):
            return _EMPTY_I64, _EMPTY_I64

    # --- flatten candidates' positions into one composite event array
    cpos_parts: List[np.ndarray] = []
    term_parts: List[np.ndarray] = []
    for i, sliced in enumerate(sliced_all):
        ids, posns = K.decode(sliced)
        ranks = np.searchsorted(cand, ids)
        cpos_parts.append(ranks.astype(np.int64) * _STRIDE + posns.astype(np.int64))
        term_parts.append(np.full(len(ids), i, dtype=np.int64))
    cpos = np.concatenate(cpos_parts)
    term = np.concatenate(term_parts)
    order = np.argsort(cpos, kind="stable")
    cpos = cpos[order]
    term = term[order]
    n = len(cpos)

    # --- minimal cover window ending at each event r:
    # Lmax(r) = min over terms t of the position of the need_t-th most
    # recent occurrence of t at or before r ("covered" where every term
    # has at least need_t occurrences so far)
    lmax_pos = None
    covered = np.ones(n, dtype=bool)
    for t in range(n_terms):
        occ = cpos[term == t]  # sorted (stable argsort preserved order)
        c = np.searchsorted(occ, cpos, side="right")
        covered &= c >= need[t]
        t_last = occ[np.maximum(c - need[t], 0)]  # clamp; masked by covered
        lmax_pos = t_last if lmax_pos is None else np.minimum(lmax_pos, t_last)
    ok = covered & (cpos - lmax_pos <= max_width)
    if not ok.any():
        return _EMPTY_I64, _EMPTY_I64

    # --- greedy disjoint selection (equivalently: maximum disjoint
    # intervals [Lmax(r), r], earliest-end-first). Docs are independent,
    # so ALL docs advance their greedy chains simultaneously: each round
    # is pure numpy over the still-active docs and finds every doc's
    # next match at once. Rounds = max matches in any single doc; total
    # work stays O(total matches) but at C speed, not a Python loop per
    # match.
    ok_r = np.flatnonzero(ok)
    # event index of each window's left edge (cpos strictly increasing
    # within a doc because positions are distinct; across docs trivially)
    ok_l = np.searchsorted(cpos, lmax_pos[ok_r], side="left")
    ok_doc = (cpos[ok_r] // _STRIDE).astype(np.int64)  # doc rank per ok event
    # contiguous ok ranges per doc (ok_r ascending => ok_doc grouped)
    doc_ranks, ok_start = np.unique(ok_doc, return_index=True)
    ok_end = np.append(ok_start[1:], len(ok_r))

    n_docs = len(doc_ranks)
    counts = np.zeros(n_docs, dtype=np.int64)
    cur_i = np.zeros(n_docs, dtype=np.int64)   # min allowed left event index
    active = np.arange(n_docs)
    while len(active):
        # first ok event whose window starts at/after cur_i (ok_l is
        # monotone: Lmax is monotone in r), clamped into the doc's range
        j = np.searchsorted(ok_l, cur_i[active], side="left")
        j = np.maximum(j, ok_start[active])
        valid = j < ok_end[active]
        hit_docs = active[valid]
        counts[hit_docs] += 1
        cur_i[hit_docs] = ok_r[j[valid]] + 1
        active = hit_docs

    hit = counts > 0
    return cand[doc_ranks[hit]].astype(np.int64), counts[hit]


# ---------------------------------------------------------------------------
# pure-Python reference implementation (kept for property tests)
# ---------------------------------------------------------------------------

def _count_windows_py(events: List[Tuple[int, int]], need: Dict[int, int],
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


def span_freqs_py(encoded: List[np.ndarray], slop: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-doc Python loop implementation (slow; property-test oracle)."""
    if len(encoded) < 2:
        raise ValueError("phrase must have at least two terms")
    if any(len(e) == 0 for e in encoded):
        return _EMPTY_I64, _EMPTY_I64

    uniq, need_list = _group_terms(encoded)
    need = dict(enumerate(need_list))

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
        c = _count_windows_py(events, need, max_width)
        if c > 0:
            out_ids.append(int(doc))
            out_counts.append(c)
    return (np.asarray(out_ids, dtype=np.int64),
            np.asarray(out_counts, dtype=np.int64))
