"""Vectorized numpy kernels over packed posting arrays.

These are the per-partition compute kernels the Spark engine runs inside
Arrow-batched pandas UDFs / ``applyInPandas``. All operate on sorted
``uint64`` packed posting arrays in the 28/18/18 layout (see
``constants.py``). Semantics re-derived from the reference engine's
documented behavior (searcharray):

- encode/decode:      /root/reference/searcharray/roaringish/roaringish.py:93-166
- term freqs:         /root/reference/searcharray/roaringish/roaringish.py:168-170
- bigram matching:    /root/reference/searcharray/phrase/bigram_freqs.py:104-307
- phrase chaining:    /root/reference/searcharray/phrase/middle_out.py:96-168

No code is copied from the reference; the kernels are fresh numpy
implementations of the same observable semantics (verified by ported
test expectations in tests/).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from .constants import (
    ADJ_BIT,
    HEADER_MASK,
    KEY_SHIFT,
    MAX_POSN,
    MSB_SHIFT,
    PAYLOAD_LSB_MASK,
)

_1 = np.uint64(1)
_0 = np.uint64(0)
BLOCK_ONE = _1 << MSB_SHIFT  # header increment for adjacent posn blocks

_EMPTY_U64 = np.zeros(0, dtype=np.uint64)
_EMPTY_I64 = np.zeros(0, dtype=np.int64)

# ---------------------------------------------------------------------------
# popcount
# ---------------------------------------------------------------------------

if hasattr(np, "bitwise_count"):
    def popcount64(arr: np.ndarray) -> np.ndarray:
        return np.bitwise_count(arr).astype(np.int64)
else:  # pragma: no cover - numpy < 2 fallback
    _LUT = np.array([bin(i).count("1") for i in range(65536)], dtype=np.int64)

    def popcount64(arr: np.ndarray) -> np.ndarray:
        a = arr.astype(np.uint64)
        out = _LUT[(a & np.uint64(0xFFFF)).astype(np.int64)]
        for shift in (16, 32, 48):
            out = out + _LUT[((a >> np.uint64(shift)) & np.uint64(0xFFFF)).astype(np.int64)]
        return out


# ---------------------------------------------------------------------------
# field accessors
# ---------------------------------------------------------------------------

def keys(packed: np.ndarray) -> np.ndarray:
    """Doc ids (within block) of each packed word."""
    return (packed >> KEY_SHIFT).astype(np.int64)


def headers(packed: np.ndarray) -> np.ndarray:
    return packed & HEADER_MASK


def lsb(packed: np.ndarray) -> np.ndarray:
    return packed & PAYLOAD_LSB_MASK


# ---------------------------------------------------------------------------
# encode / decode
# ---------------------------------------------------------------------------

def encode(doc_ids: np.ndarray, posns: np.ndarray) -> np.ndarray:
    """Pack (doc_id, position) pairs into a sorted uint64 posting array.

    ``doc_ids`` are block-local (< 2**28); ``posns`` must be <= MAX_POSN.
    One output word per (doc, posn-block) with an 18-bit position bitmask.
    """
    if len(doc_ids) == 0:
        return _EMPTY_U64
    d = np.asarray(doc_ids, dtype=np.uint64)
    p = np.asarray(posns, dtype=np.uint64)
    hdr = (d << KEY_SHIFT) | ((p // np.uint64(18)) << MSB_SHIFT)
    bits = _1 << (p % np.uint64(18))
    order = np.argsort(hdr, kind="stable")
    hdr = hdr[order]
    bits = bits[order]
    starts = np.concatenate(([0], np.flatnonzero(np.diff(hdr)) + 1))
    merged = np.bitwise_or.reduceat(bits, starts)
    return hdr[starts] | merged


def decode(packed: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Unpack to flat (doc_ids, posns) arrays, ordered by (doc, posn).

    Per-bit-position loop (18 passes over the word array) instead of an
    (n_words, 18) expansion matrix: peak temporary memory is O(n_words)
    instead of 18x that — large fresh allocations are brutally expensive
    on overcommitted hosts (measured ~0.5 ms/page first-touch on the
    bench VM), and smaller peaks also keep the worker heap reusable
    across blocks.
    """
    if len(packed) == 0:
        return _EMPTY_I64, _EMPTY_I64
    bits = lsb(packed)
    word_parts: List[np.ndarray] = []
    bit_parts: List[np.ndarray] = []
    for b in range(18):
        hit = np.flatnonzero((bits >> np.uint64(b)) & _1)
        if len(hit):
            word_parts.append(hit)
            bit_parts.append(np.full(len(hit), b, dtype=np.int64))
    if not word_parts:
        return _EMPTY_I64, _EMPTY_I64
    words = np.concatenate(word_parts)
    bvals = np.concatenate(bit_parts)
    # word-major then bit order == ascending (doc, posn)
    order = np.argsort(words * np.int64(32) + bvals, kind="stable")
    words = words[order]
    bvals = bvals[order]
    blocks = ((packed >> MSB_SHIFT) & np.uint64((1 << 18) - 1)).astype(np.int64)
    return keys(packed)[words], blocks[words] * 18 + bvals


def termfreqs(packed: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-doc term frequency: (doc_ids, tf) with doc_ids sorted unique."""
    if len(packed) == 0:
        return _EMPTY_I64, _EMPTY_I64
    k = keys(packed)
    starts = np.concatenate(([0], np.flatnonzero(np.diff(k)) + 1))
    tf = np.add.reduceat(popcount64(lsb(packed)), starts)
    return k[starts], tf


def docfreq(packed: np.ndarray) -> int:
    """Number of distinct docs in a packed posting array."""
    if len(packed) == 0:
        return 0
    k = keys(packed)
    return int(1 + np.count_nonzero(np.diff(k)))


def slice_keys(packed: np.ndarray, doc_ids: np.ndarray) -> np.ndarray:
    """Semi-join: keep words whose doc id is in ``doc_ids`` (sorted unique).

    O(n log m) searchsorted probe — ``packed``'s keys are sorted
    (non-unique), ``doc_ids`` sorted unique, so no re-sort is needed
    (reference encoder.slice semantics, roaringish.py:245-282).
    """
    if len(packed) == 0 or len(doc_ids) == 0:
        return _EMPTY_U64
    k = keys(packed)
    pos = np.searchsorted(doc_ids, k)
    pos[pos == len(doc_ids)] = len(doc_ids) - 1
    return packed[doc_ids[pos] == k]


def exclude_keys(packed: np.ndarray, doc_ids: np.ndarray) -> np.ndarray:
    """Anti-join: drop words whose doc id is in ``doc_ids`` (sorted
    unique) — the tombstone filter (reference P8 delete semantics)."""
    if len(packed) == 0 or len(doc_ids) == 0:
        return packed
    k = keys(packed)
    pos = np.searchsorted(doc_ids, k)
    pos[pos == len(doc_ids)] = len(doc_ids) - 1
    return packed[doc_ids[pos] != k]


def or_merge(packed: np.ndarray) -> np.ndarray:
    """Sort a packed array and OR-merge words sharing a header.

    Needed when posting fragments with OVERLAPPING doc ranges are
    concatenated (reference PosnBitArray.merge, middle_out.py:394-408):
    the same (doc, posn-block) may appear in both fragments and their
    position bitmasks must union, not duplicate.
    """
    if len(packed) < 2:
        return packed
    packed = np.sort(packed, kind="stable")
    hdr = packed & HEADER_MASK
    dup = np.diff(hdr) == 0
    if not dup.any():
        return packed
    starts = np.concatenate(([0], np.flatnonzero(~dup) + 1))
    return hdr[starts] | np.bitwise_or.reduceat(lsb(packed), starts)


def unique_keys(packed: np.ndarray) -> np.ndarray:
    """Sorted distinct doc ids of a packed posting array (keys are already
    sorted, so dedupe is a diff scan, not a sort)."""
    if len(packed) == 0:
        return _EMPTY_I64
    k = keys(packed)
    starts = np.concatenate(([0], np.flatnonzero(np.diff(k)) + 1))
    return k[starts]


def _intersect_sorted(a: np.ndarray, b: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Index pairs of equal elements of two sorted unique arrays.

    Galloping-style: binary-search the smaller side into the larger —
    O(n log m) instead of np.intersect1d's O((n+m) log (n+m)) re-sort
    (reference intersect.pyx:32-74 semantics).
    """
    if len(a) == 0 or len(b) == 0:
        return _EMPTY_I64, _EMPTY_I64
    if len(a) > len(b):
        ib, ia = _intersect_sorted(b, a)
        return ia, ib
    pos = np.searchsorted(b, a)
    pos[pos == len(b)] = len(b) - 1
    found = b[pos] == a
    return np.flatnonzero(found), pos[found]


def slice_posn_window(packed: np.ndarray, min_posn: Optional[int], max_posn: Optional[int]) -> np.ndarray:
    """Keep only posn blocks within [min_posn, max_posn].

    Mirrors the reference's constraint that min_posn % 18 == 0 and
    max_posn % 18 == 17 (payload-block granularity,
    /root/reference/searcharray/roaringish/roaringish.py:267-282).
    """
    if min_posn is None and max_posn is None:
        return packed
    blocks = ((packed >> MSB_SHIFT) & np.uint64((1 << 18) - 1)).astype(np.int64)
    mask = np.ones(len(packed), dtype=bool)
    if min_posn is not None:
        if min_posn % 18 != 0:
            raise ValueError("min_posn must be a multiple of 18")
        mask &= blocks >= (min_posn // 18)
    if max_posn is not None:
        if max_posn % 18 != 17:
            raise ValueError("max_posn must be a multiple of 18 minus 1 (e.g. 17)")
        mask &= blocks <= (max_posn // 18)
    return packed[mask]


def intersect_nearby_headers(encoded: List[np.ndarray],
                             window_blocks: int) -> List[np.ndarray]:
    """Keep only posting words whose (doc, posn-block) composite lies
    within ``window_blocks`` posn blocks of some word in EVERY other
    array — the posn-block analogue of the reference's header +-1
    pre-intersection for sloppy spans
    (/root/reference/searcharray/phrase/spans.py:71-123, semantics only).

    With ``window_blocks = max_width // 18 + 1`` a dropped word's
    positions are > max_width from every other term's positions (block
    distance > window_blocks implies position distance >= 18 *
    window_blocks + 1 > max_width), so no position that could sit inside
    a valid span window is ever dropped — hot-term positions far from
    any rare-term occurrence never get decoded.
    """
    if len(encoded) < 2:
        return encoded
    comps = [(e >> MSB_SHIFT).astype(np.int64) for e in encoded]
    w = np.int64(window_blocks)
    out = []
    for i, e in enumerate(encoded):
        ci = comps[i]
        keep = np.ones(len(e), dtype=bool)
        for j, cj in enumerate(comps):
            if j == i or len(cj) == 0 or not keep.any():
                continue
            lo = np.searchsorted(cj, ci - w, side="left")
            hi = np.searchsorted(cj, ci + w, side="right")
            keep &= hi > lo
        out.append(e[keep])
    return out


def _bitmaps_around(cj, bj, ci):
    """(left, same, right) = cj's bitmaps at composites ci-1, ci, ci+1 —
    ONE searchsorted; neighbors resolve by adjacency in the sorted cj."""
    n = len(cj)
    if n == 0:
        z = np.zeros(len(ci), dtype=np.uint64)
        return z, z, z
    zero = np.uint64(0)
    pos = np.searchsorted(cj, ci, side="left")
    posc = np.minimum(pos, n - 1)
    has_same = cj[posc] == ci
    same = np.where(has_same, bj[posc], zero)
    posl = np.maximum(pos - 1, 0)
    left = np.where(cj[posl] == ci - 1, bj[posl], zero)
    posr = np.minimum(pos + has_same, n - 1)
    right = np.where(cj[posr] == ci + 1, bj[posr], zero)
    return left, same, right


def mask_nearby_positions(encoded: List[np.ndarray],
                          width: int) -> List[np.ndarray]:
    """Bit-exact proximity pre-filter for span counting: in every array,
    keep only the payload BITS within ``width`` positions of at least one
    set bit in EVERY other array; words left empty are dropped. Requires
    ``width <= 18`` (one adjacent posn block each side).

    Strictly stronger than ``intersect_nearby_headers`` (whole-block
    granularity): hot-term positions are filtered at position
    granularity WITHOUT decoding — per word, the other term's bitmaps at
    posn blocks (b-1, b, b+1) concatenate into a 54-bit lane, smear by
    +-width (shift-OR), and the middle 18 bits mask this word's payload.
    Cross-doc bleed is masked out (block 0 has no left neighbor within
    the doc, MAX block no right).

    COUNT-PRESERVING for spans.span_freqs, not just match-preserving:
    every position inside a valid window of width <= ``width`` is within
    ``width`` of an occurrence of every other term in that window (all
    pairs in a window are), so it survives; a removed position is in no
    valid window, and removing it changes neither coverage, the minimal
    window Lmax at surviving events, nor greedy disjoint selection
    (tests/test_spans.py property-checks this against the pure-Python
    oracle).
    """
    if len(encoded) < 2 or width > 18:
        return encoded
    w = np.uint64(width)
    lane18 = PAYLOAD_LSB_MASK
    max_block = np.int64(MAX_POSN // 18)
    comps = [(e >> MSB_SHIFT).astype(np.int64) for e in encoded]
    payloads = [e & PAYLOAD_LSB_MASK for e in encoded]
    bitmaps_around = _bitmaps_around

    out = []
    for i, e in enumerate(encoded):
        ci = comps[i]
        blk = ci & np.int64((1 << 18) - 1)
        keep_bits = payloads[i].copy()
        for j in range(len(encoded)):
            if j == i or not keep_bits.any():
                continue
            left, same, right = bitmaps_around(comps[j], payloads[j], ci)
            left[blk == 0] = 0              # previous word is another doc
            right[blk == max_block] = 0     # next word is another doc
            ext = left | (same << np.uint64(18)) | (right << np.uint64(36))
            # bidirectional doubling smear: after each step ext covers
            # +-covered positions; O(log width) shift-ORs
            covered_w = 0
            step = 1
            while covered_w < width:
                s = np.uint64(min(step, width - covered_w))
                ext |= (ext << s) | (ext >> s)
                covered_w += int(s)
                step = covered_w  # next step may double the reach
            keep_bits &= (ext >> np.uint64(18)) & lane18
        nz = keep_bits != 0
        out.append((e[nz] & ~PAYLOAD_LSB_MASK) | keep_bits[nz])
    return out


# ---------------------------------------------------------------------------
# bigram / phrase matching
# ---------------------------------------------------------------------------

def _ceil_half(x: np.ndarray) -> np.ndarray:
    return -np.floor_divide(x, -2)


def _sum_by_id(ids: np.ndarray, counts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Group-sum counts by sorted ids."""
    if len(ids) == 0:
        return _EMPTY_I64, _EMPTY_I64
    starts = np.concatenate(([0], np.flatnonzero(np.diff(ids)) + 1))
    return ids[starts], np.add.reduceat(counts, starts)


def _outer_sum(ids_a, counts_a, ids_b, counts_b) -> Tuple[np.ndarray, np.ndarray]:
    """Full-outer merge of two (ids, counts) pairs, summing on matches."""
    if len(ids_a) == 0:
        return ids_b, counts_b
    if len(ids_b) == 0:
        return ids_a, counts_a
    ids = np.concatenate((ids_a, ids_b))
    counts = np.concatenate((counts_a, counts_b))
    order = np.argsort(ids, kind="stable")
    return _sum_by_id(ids[order], counts[order])


def _min_intersect(ids, counts, new_ids, new_counts) -> Tuple[np.ndarray, np.ndarray]:
    """AND-combine chain steps: intersect ids, count = min (reference
    middle_out._intersect_bigram_matches)."""
    if ids is None:
        return new_ids, new_counts
    ia, ib = _intersect_sorted(ids, new_ids)
    return ids[ia], np.minimum(counts[ia], new_counts[ib])


def _phrase_step(lhs: np.ndarray, rhs: np.ndarray, cont_lhs_side: bool):
    """One bigram step of the phrase chain.

    Counts per-doc adjacent-position matches between ``lhs`` and ``rhs``
    (rhs position == lhs position + 1), including matches that cross the
    18-posn block boundary, plus the continuation array for chaining:
    RHS continuation = matched rhs positions; LHS continuation = matched
    lhs positions. Same-term runs get the non-overlapping-run correction
    (reference bigram_freqs._adj_to_phrase_freq).
    """
    if len(lhs) == 0 or len(rhs) == 0:
        empty_cont = _EMPTY_U64
        return _EMPTY_I64, _EMPTY_I64, empty_cont

    h_l = headers(lhs)
    h_r = headers(rhs)

    # --- inner (same posn block) ---
    li, ri = _intersect_sorted(h_l, h_r)
    lhs_int = lhs[li]
    rhs_int = rhs[ri]

    inner_ids = _EMPTY_I64
    inner_counts = _EMPTY_I64
    cont_inner = _EMPTY_U64
    if len(lhs_int):
        same = np.array_equal(lhs_int, rhs_int)
        l_bits = lsb(lhs_int)
        r_bits = lsb(rhs_int)
        hdr = lhs_int & HEADER_MASK
        if same:
            ov = l_bits & ((r_bits << _1) & PAYLOAD_LSB_MASK)
            cnt = popcount64(ov)
            consec = popcount64(ov & ((ov << _1) & PAYLOAD_LSB_MASK))
            cnt = cnt - _ceil_half(consec)
            if cont_lhs_side:
                cont_inner = hdr | (l_bits & (l_bits >> _1))
            else:
                cont_inner = hdr | ((r_bits << _1) & r_bits & PAYLOAD_LSB_MASK)
        else:
            ov = l_bits & (r_bits >> _1)
            cnt = popcount64(ov)
            if cont_lhs_side:
                cont_inner = hdr | ov
            else:
                cont_inner = hdr | ((ov << _1) & PAYLOAD_LSB_MASK)
        inner_ids, inner_counts = _sum_by_id(keys(lhs_int), cnt)

    # --- adjacent (consecutive posn blocks: lhs bit 17, rhs bit 0) ---
    target = h_l + BLOCK_ONE
    pos = np.searchsorted(h_r, target)
    pos_clip = np.minimum(pos, len(h_r) - 1)
    found = h_r[pos_clip] == target
    lhs_adj = lhs[found]
    rhs_adj = rhs[pos_clip[found]]
    matches = ((lhs_adj & ADJ_BIT) != 0) & ((rhs_adj & _1) != 0)
    lhs_adj = lhs_adj[matches]
    rhs_adj = rhs_adj[matches]
    adj_ids, adj_counts = _sum_by_id(keys(lhs_adj), np.ones(len(lhs_adj), dtype=np.int64))
    if cont_lhs_side:
        cont_adj = (lhs_adj & HEADER_MASK) | ADJ_BIT
    else:
        cont_adj = (rhs_adj & HEADER_MASK) | _1

    ids, counts = _outer_sum(inner_ids, inner_counts, adj_ids, adj_counts)

    # --- merge continuations (inner + adjacent may share a header) ---
    if len(cont_adj):
        if len(cont_inner):
            hdr_inner = cont_inner & HEADER_MASK
            hdr_adj = cont_adj & HEADER_MASK
            ii, ai = _intersect_sorted(hdr_inner, hdr_adj)
            if len(ii):
                cont_inner = cont_inner.copy()
                cont_inner[ii] |= ADJ_BIT if cont_lhs_side else _1
                keep = np.ones(len(cont_adj), dtype=bool)
                keep[ai] = False
                cont_adj = cont_adj[keep]
            cont = np.concatenate((cont_inner, cont_adj))
            cont.sort()
        else:
            cont = cont_adj
    else:
        cont = cont_inner
    return ids, counts, cont


# rare-first trim: slice posting arrays this many times longer than the
# rarest term's down to the rarest term's doc set before chaining
# (reference trim_phrase_search, middle_out.py:44-70)
TRIM_FACTOR = 20


def trim_to_rarest(encoded: List[np.ndarray]) -> List[np.ndarray]:
    """Semi-join long posting arrays against the rarest term's doc set.

    A phrase match needs every term in the doc, so docs absent from the
    shortest (rarest) term's postings can never match — slicing hot
    terms' postings to that doc set cuts the chain cost from O(hot) to
    O(rare) (reference middle_out.trim_phrase_search).
    """
    lengths = [len(e) for e in encoded]
    sh = min(lengths)
    if sh == 0 or max(lengths) <= TRIM_FACTOR * sh:
        return encoded
    rare_keys = unique_keys(encoded[lengths.index(sh)])
    return [e if len(e) <= TRIM_FACTOR * sh else slice_keys(e, rare_keys)
            for e in encoded]


def _adjacent_terms_equal(encoded: List[np.ndarray]) -> bool:
    """True if any two ADJACENT phrase slots hold the same posting
    array (same term). Object identity first; equal-by-value catches
    slices rebuilt per slot (one memcmp-speed pass, short-circuits on
    length)."""
    for a, b in zip(encoded, encoded[1:]):
        if a is b or (len(a) == len(b) and np.array_equal(a, b)):
            return True
    return False


def phrase_freqs_direct(encoded: List[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
    """Exact phrase frequencies in ONE pass: AND of offset-shifted
    position lanes around the rarest term.

    Anchor on the rarest term; for every other slot ``j`` gather its
    (left, same, right) posn-block bitmaps at each anchor word's
    composite, concatenate into a 54-bit lane, shift by the slot offset
    ``j - r``, and AND into the anchor's payload. Surviving bits are
    exactly the anchor-slot positions of full phrase matches, so the
    per-doc popcount IS the phrase frequency — no bigram chain, no
    continuation arrays, and each hot term is touched once by a binary
    search sized by the RARE term (the chain intersects full hot
    arrays). After each AND the anchor compacts to surviving words, so
    later (hotter, visited rarest-first) slots probe a shrinking set.

    Valid only when no two ADJACENT slots repeat a term (else the
    reference's non-overlapping-run correction applies — bigram chain
    handles those, reference bigram_freqs._adj_to_phrase_freq) and when
    slot offsets fit the ±18-bit lane (k <= 19). Unlike the chain it
    never emits zero-count docs. Equivalence to the chain and to a
    naive scan is property-tested (tests/test_phrase_direct.py).
    """
    k = len(encoded)
    lengths = [len(e) for e in encoded]
    if min(lengths) == 0:
        return _EMPTY_I64, _EMPTY_I64
    r = lengths.index(min(lengths))
    anchor = encoded[r]
    ci = (anchor >> MSB_SHIFT).astype(np.int64)
    blk = ci & np.int64((1 << 18) - 1)
    max_block = np.int64(MAX_POSN // 18)
    acc = (anchor & PAYLOAD_LSB_MASK).copy()
    akeys = keys(anchor)
    order = sorted((j for j in range(k) if j != r), key=lambda j: lengths[j])
    for j in order:
        off = j - r
        left, same, right = _bitmaps_around(
            (encoded[j] >> MSB_SHIFT).astype(np.int64),
            encoded[j] & PAYLOAD_LSB_MASK, ci)
        left[blk == 0] = _0                # previous word is another doc
        right[blk == max_block] = _0       # next word is another doc
        ext = left | (same << np.uint64(18)) | (right << np.uint64(36))
        acc &= (ext >> np.uint64(18 + off)) & PAYLOAD_LSB_MASK
        nz = acc != 0
        n_nz = int(nz.sum())
        if n_nz == 0:
            return _EMPTY_I64, _EMPTY_I64
        if n_nz * 2 < len(acc):            # compact surviving words
            acc, ci, blk, akeys = acc[nz], ci[nz], blk[nz], akeys[nz]
    nz = acc != 0
    return _sum_by_id(akeys[nz], popcount64(acc[nz]))


def phrase_freqs(encoded: List[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
    """Exact-phrase per-doc frequencies over packed posting arrays.

    Rare-first trim, then: distinct-adjacent phrases short enough that
    the bigram chain is exact (no middle-out split) take the one-pass
    AND-shift kernel (``phrase_freqs_direct``); adjacent-equal terms
    take the chain for its non-overlapping-run correction; long phrases
    with a middle rarest term keep the reference's middle-out split
    semantics (middle_out.compute_phrase_freqs, including its
    direction heuristic). Returns (doc_ids, counts), doc_ids sorted;
    zero-count docs may be present (chain) or absent (direct) — callers
    must filter, as index._hits does.
    """
    if len(encoded) == 0:
        return _EMPTY_I64, _EMPTY_I64
    if len(encoded) == 1:
        return termfreqs(encoded[0])
    if any(len(e) == 0 for e in encoded):
        return _EMPTY_I64, _EMPTY_I64
    encoded = trim_to_rarest(encoded)
    shortest = min(range(len(encoded)), key=lambda i: len(encoded[i]))
    chain_is_exact = shortest <= 1 or shortest >= len(encoded) - 2
    if (chain_is_exact and len(encoded) <= 19
            and not _adjacent_terms_equal(encoded)):
        return phrase_freqs_direct(encoded)
    if shortest <= 1:
        return _chain_l2r(encoded)
    if shortest >= len(encoded) - 2:
        return _chain_r2l(encoded)
    # split at the rarest term, include it in BOTH halves so every
    # adjacent bigram (incl. shortest-1 -> shortest) is constrained —
    # strictly tighter than the reference's exclusive split, which can
    # overcount (e.g. 'a b X c d e' matching 'a b c d e')
    l_ids, l_counts = _chain_l2r(encoded[:shortest + 1])
    r_ids, r_counts = _chain_r2l(encoded[shortest:])
    ids, counts = _min_intersect(l_ids, l_counts, r_ids, r_counts)
    return ids, counts


def _chain_l2r(encoded: List[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
    if len(encoded) == 1:
        return termfreqs(encoded[0])
    ids = None
    counts = None
    lhs = encoded[0]
    for rhs in encoded[1:]:
        step_ids, step_counts, cont = _phrase_step(lhs, rhs, cont_lhs_side=False)
        lhs = cont
        ids, counts = _min_intersect(ids, counts, step_ids, step_counts)
    return (ids, counts) if ids is not None else (_EMPTY_I64, _EMPTY_I64)


def _chain_r2l(encoded: List[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
    if len(encoded) == 1:
        return termfreqs(encoded[0])
    ids = None
    counts = None
    rhs = encoded[-1]
    for lhs in encoded[-2::-1]:
        step_ids, step_counts, cont = _phrase_step(lhs, rhs, cont_lhs_side=True)
        rhs = cont
        ids, counts = _min_intersect(ids, counts, step_ids, step_counts)
    return (ids, counts) if ids is not None else (_EMPTY_I64, _EMPTY_I64)


# ---------------------------------------------------------------------------
# multi-term encode (index build hot path)
# ---------------------------------------------------------------------------

def encode_multi(term_codes: np.ndarray, doc_ids: np.ndarray, posns: np.ndarray):
    """Encode postings for many terms in one vectorized pass.

    Parameters: parallel arrays (term_code, local_doc_id, posn), any order.
    Returns (codes, starts, packed, per_term_df, per_term_tf, per_term_tfmax,
    doc_keys, term_doc_starts):
      - ``codes``: sorted unique term codes
      - ``starts``: word-offset of each term's slice in ``packed`` (len+1)
      - ``packed``: all terms' posting words, grouped by term, sorted within
      - per-term doc freq, total tf, and max per-doc tf (block-max metadata)
      - ``doc_keys``: doc id of each (term, doc) entry, grouped by term
      - ``term_doc_starts``: offset of each term's slice in ``doc_keys``
    """
    if len(term_codes) == 0:
        return (_EMPTY_I64, np.zeros(1, dtype=np.int64), _EMPTY_U64,
                _EMPTY_I64, _EMPTY_I64, _EMPTY_I64, _EMPTY_I64,
                np.zeros(1, dtype=np.int64))
    c = np.asarray(term_codes, dtype=np.uint64)
    d = np.asarray(doc_ids, dtype=np.uint64)
    p = np.asarray(posns, dtype=np.uint64)
    hdr = (d << KEY_SHIFT) | ((p // np.uint64(18)) << MSB_SHIFT)
    bits = _1 << (p % np.uint64(18))
    # sort by (code, header) — code in high bits of a compound key would
    # overflow 64 bits, so lexsort instead
    order = np.lexsort((hdr, c))
    c = c[order]
    hdr = hdr[order]
    bits = bits[order]
    change = (np.diff(c) != 0) | (np.diff(hdr) != 0)
    starts_w = np.concatenate(([0], np.flatnonzero(change) + 1))
    packed = hdr[starts_w] | np.bitwise_or.reduceat(bits, starts_w)
    codes_w = c[starts_w].astype(np.int64)

    # per-term word ranges
    term_change = np.flatnonzero(np.diff(codes_w)) + 1
    term_starts = np.concatenate(([0], term_change, [len(packed)]))
    codes = codes_w[term_starts[:-1]]

    # per-doc tf then per-term aggregates
    k = packed >> KEY_SHIFT
    doc_change = np.concatenate(
        ([0], np.flatnonzero((np.diff(codes_w) != 0) | (np.diff(k) != 0)) + 1))
    doc_tf = np.add.reduceat(popcount64(lsb(packed)), doc_change)
    doc_codes = codes_w[doc_change]
    term_doc_change = np.concatenate(([0], np.flatnonzero(np.diff(doc_codes)) + 1))
    df = np.diff(np.concatenate((term_doc_change, [len(doc_tf)])))
    tf_total = np.add.reduceat(doc_tf, term_doc_change)
    tf_max = np.maximum.reduceat(doc_tf, term_doc_change)
    doc_keys = k[doc_change].astype(np.int64)
    return codes, term_starts, packed, df, tf_total, tf_max, doc_keys, term_doc_change


# ---------------------------------------------------------------------------
# packing helpers for Spark exchange (binary <-> uint64)
# ---------------------------------------------------------------------------

def to_bytes(packed: np.ndarray) -> bytes:
    return packed.astype("<u8").tobytes()


def from_bytes(raw: bytes) -> np.ndarray:
    if raw is None or len(raw) == 0:
        return _EMPTY_U64
    return np.frombuffer(raw, dtype="<u8")
