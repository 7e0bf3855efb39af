"""Kernel-level tests: packed posting encode/decode + phrase semantics.

Scenario expectations ported from the reference test suite
(/root/reference/test/test_phrase_matches.py, test_search.py) — the
expectations (corpus, phrase, expected freqs) are the oracle; the kernel
implementation is fresh.
"""
import numpy as np
import pytest

from searcharray_spark import kernels as K


def build_term_arrays(docs):
    """Tokenize docs (whitespace) -> {term: packed posting array}."""
    terms = {}
    for doc_id, text in enumerate(docs):
        for posn, tok in enumerate(text.split()):
            terms.setdefault(tok, ([], []))
            terms[tok][0].append(doc_id)
            terms[tok][1].append(posn)
    return {
        t: K.encode(np.array(d, dtype=np.int64), np.array(p, dtype=np.int64))
        for t, (d, p) in terms.items()
    }


def phrase_dense(docs, phrase):
    arrs = build_term_arrays(docs)
    encoded = [arrs.get(t, np.zeros(0, dtype=np.uint64)) for t in phrase]
    ids, counts = K.phrase_freqs(encoded)
    out = np.zeros(len(docs), dtype=np.int64)
    if len(ids):
        out[ids] = counts
    return out


BASE4 = ["foo bar bar baz", "data2", "data3 bar", "bunny funny wunny"]

PHRASE_SCENARIOS = {
    "length_one": (BASE4 * 25, ["foo"], [1, 0, 0, 0] * 25),
    "base": (BASE4 * 25, ["foo", "bar"], [1, 0, 0, 0] * 25),
    "term_does_not_exist": (BASE4 * 25, ["term_does", "not_exist"], [0, 0, 0, 0] * 25),
    "and_but_not_phrase": (["foo bear bar baz", "data2", "data3 bar", "bunny funny wunny"] * 25,
                           ["foo", "bar"], [0, 0, 0, 0] * 25),
    "term_repeats": (["foo foo bar bar baz", "data2", "data3 bar", "bunny funny wunny"] * 25,
                     ["foo", "bar"], [1, 0, 0, 0] * 25),
    "multi_term_one_doc": (["foo bar bar bar foo", "data2", "data3 bar", "bunny funny wunny"] * 25,
                           ["foo", "bar"], [1, 0, 0, 0] * 25),
    "three_terms_match": (["foo bar baz baz", "data2", "data3 bar", "bunny funny wunny"] * 25,
                          ["foo", "bar", "baz"], [1, 0, 0, 0] * 25),
    "three_terms_no_match": (BASE4 * 25, ["foo", "bar", "baz"], [0, 0, 0, 0] * 25),
    "three_terms_spread_out": (["foo bar EEK foo URG bar baz", "data2", "data3 bar", "bunny funny wunny"] * 25,
                               ["foo", "bar", "baz"], [0, 0, 0, 0] * 25),
    "same_term_matches": (["foo foo foo", "data2", "data3 bar", "bunny funny wunny"] * 25,
                          ["foo", "foo"], [1, 0, 0, 0] * 25),
    "partial_same_term_matches": (["foo foo bar", "data2", "data3 bar", "bunny funny wunny"] * 25,
                                  ["foo", "foo", "bar"], [1, 0, 0, 0] * 25),
    "partial_same_term_matches_tail": (["foo bar bar", "data2", "data3 bar", "bunny funny wunny"] * 25,
                                       ["foo", "bar", "bar"], [1, 0, 0, 0] * 25),
    "partial_same_term_matches_multiple": (["foo bar bar foo bar bar", "data2", "data3 bar", "bunny funny wunny"] * 25,
                                           ["foo", "bar", "bar"], [2, 0, 0, 0] * 25),
    "same_term_matches_3": (["foo foo foo", "data2", "data3 bar", "bunny funny wunny"] * 25,
                            ["foo", "foo", "foo"], [1, 0, 0, 0] * 25),
    "same_term_matches_4": (["foo foo foo foo", "data2", "data3 bar", "bunny funny wunny"] * 25,
                            ["foo", "foo", "foo", "foo"], [1, 0, 0, 0] * 25),
    "same_term_phrase_repeats": (["foo foo foo foo", "data2", "data3 bar", "bunny funny wunny"] * 25,
                                 ["foo", "foo"], [2, 0, 0, 0] * 25),
    "same_term_phrase_repeats_with_break": (["foo foo foo foo baz foo foo", "data2", "data3 bar", "bunny funny wunny"] * 25,
                                            ["foo", "foo"], [3, 0, 0, 0] * 25),
    "2x_same_term": (["foo foo bar bar", "data2", "data3 bar", "bunny funny wunny"] * 25,
                     ["foo", "foo", "bar", "bar"], [1, 0, 0, 0] * 25),
    "duplicate_phrases": (["foo bar foo bar", "data2", "data3 bar", "bunny funny wunny"] * 25,
                          ["foo", "bar"], [2, 0, 0, 0] * 25),
    "duplicate_three_term_phrases": (["foo bar baz foo bar baz", "data2", "data3 bar", "bunny funny wunny"] * 25,
                                     ["foo", "bar", "baz"], [2, 0, 0, 0] * 25),
    "duplicate_three_term_phrases_last_disconnects": (
        ["foo bar baz foo bar buzz", "data2", "data3 bar", "bunny funny wunny"] * 25,
        ["foo", "bar", "baz"], [1, 0, 0, 0] * 25),
    "different_num_posns": (["foo " + " ".join(["bar"] * 50), "data2", "data3 bar", "bunny funny wunny"] * 25,
                            ["foo", "bar"], [1, 0, 0, 0] * 25),
    "different_num_posns_mixed_and_not_phrase": (
        ["data3 bar bar foo foo", "foo " + " ".join(["bar"] * 5),
         "foo " + " ".join(["bar"] * 50), "foo data2 bar", "bunny funny wunny"] * 25,
        ["foo", "bar"], [0, 1, 1, 0, 0] * 25),
    "long_doc": (BASE4 * 1 + ["la ma ta wa ga ao a b c d e f g a be ae i foo bar foo bar"],
                 ["foo", "bar"], [1, 0, 0, 0, 2]),
    "long_phrase": (["foo la ma bar bar baz", "data2 ma ta", "data3 bar ma", "bunny funny wunny",
                     "la ma ta wa ga ao a b c d e f g a be ae i la ma ta wa ga ao a foo bar foo bar"] * 25,
                    ["la", "ma", "ta", "wa", "ga", "ao", "a"], [0, 0, 0, 0, 2] * 25),
    "many_phrases": (["foo bar bar baz " + " ".join([" dummy foo bar baz"] * 100),
                      "data2", "data3 bar", "bunny funny wunny foo bar"] * 25,
                     ["foo", "bar"], [101, 0, 0, 1] * 25),
}


@pytest.mark.parametrize("name", list(PHRASE_SCENARIOS))
def test_phrase_scenarios(name):
    docs, phrase, expected = PHRASE_SCENARIOS[name]
    got = phrase_dense(docs, phrase)
    assert got.tolist() == expected, f"{name}: {got[:8]} != {expected[:8]}"


@pytest.mark.parametrize("offset", range(0, 100))
def test_phrase_offset_sweep(offset):
    """Shift a phrase through posn-block boundaries (reference
    test_phrase_matches.py:256-304)."""
    prefix = " ".join(["dummy"] * offset)
    docs = [prefix + " foo bar baz", "nothing here", prefix + " foo baz bar"]
    got = phrase_dense(docs, ["foo", "bar", "baz"])
    assert got.tolist() == [1, 0, 0], f"offset={offset}: {got}"


@pytest.mark.parametrize("phrase", ["foo bar baz", "foo bar", "foo foo foo",
                                    "foo foo bar", "foo bar bar",
                                    "foo bar bar baz buz foo bar",
                                    "foo bar bar baz buz foo foo",
                                    "foo foo"])
@pytest.mark.parametrize("offset", range(0, 100))
def test_phrase_different_posns(offset, phrase):
    """Reference sweep (test_phrase_matches.py:249-263): single phrase
    occurrence shifted through 100 positions -> freq exactly 1."""
    docs = [" ".join(["dummy"] * offset) + " " + phrase, "not match"]
    got = phrase_dense(docs, phrase.split())
    assert got.tolist() == [1, 0], f"offset={offset} phrase={phrase}: {got}"


@pytest.mark.parametrize("offset", range(0, 100))
def test_phrase_scattered_posns(offset):
    scattered = "foo bar " + " ".join(["dummy"] * offset) + " foo bar baz"
    got = phrase_dense([scattered, "not match"], ["foo", "bar"])
    assert got.tolist() == [2, 0]


@pytest.mark.parametrize("offset", range(0, 100))
def test_phrase_scattered_posns_one_term_rpt(offset):
    scattered = "foo bar " + " ".join(["foo"] * offset) + " foo bar baz"
    got = phrase_dense([scattered, "not match"], ["foo", "bar"])
    assert got.tolist() == [2, 0]


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(42)
    doc_ids = np.sort(rng.integers(0, 1000, 5000))
    posns = rng.integers(0, 500, 5000)
    # dedupe (doc, posn) pairs
    pairs = np.unique(doc_ids.astype(np.int64) * 100000 + posns.astype(np.int64))
    doc_ids = pairs // 100000
    posns = pairs % 100000
    packed = K.encode(doc_ids, posns)
    assert np.all(np.diff(packed.astype(np.uint64)) > 0)  # sorted, unique headers
    d2, p2 = K.decode(packed)
    order = np.lexsort((posns, doc_ids))
    assert np.array_equal(d2, doc_ids[order])
    assert np.array_equal(p2, posns[order])


def test_termfreqs_docfreq():
    docs = BASE4 * 25
    arrs = build_term_arrays(docs)
    ids, tf = K.termfreqs(arrs["bar"])
    dense = np.zeros(len(docs), dtype=np.int64)
    dense[ids] = tf
    assert dense.tolist() == [2, 0, 1, 0] * 25
    assert K.docfreq(arrs["bar"]) == 50
    assert K.docfreq(arrs["foo"]) == 25


def test_posn_window():
    docs = ["foo bar bar baz" + " ".join(["boz"] * 25) + " foo bar", "data2", "data3 bar",
            "bunny funny wunny"] * 25
    arrs = build_term_arrays(docs)
    for phrase, min_p, max_p, expected in [
        (["foo", "bar"], 0, 17, [1, 0, 0, 0] * 25),
        (["foo", "bar"], 0, None, [2, 0, 0, 0] * 25),
        (["foo", "bar"], 18, None, [1, 0, 0, 0] * 25),
    ]:
        encoded = [K.slice_posn_window(arrs[t], min_p, max_p) for t in phrase]
        ids, counts = K.phrase_freqs(encoded)
        dense = np.zeros(len(docs), dtype=np.int64)
        if len(ids):
            dense[ids] = counts
        assert dense.tolist() == expected, (phrase, min_p, max_p)


def test_bigram_superset_invariant():
    rng = np.random.default_rng(7)
    vocab = ["a", "b", "c", "d", "e", "foo", "bar"]
    docs = [" ".join(rng.choice(vocab, rng.integers(1, 60))) for _ in range(200)]
    phrase = ["a", "b", "c"]
    got = phrase_dense(docs, phrase)
    phrase_docs = set(np.flatnonzero(got > 0).tolist())
    for big in zip(phrase[:-1], phrase[1:]):
        bg = phrase_dense(docs, list(big))
        bigram_docs = set(np.flatnonzero(bg > 0).tolist())
        assert phrase_docs <= bigram_docs


def test_naive_phrase_equivalence_random():
    """Distinct-term phrases must equal the naive positional scan."""
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(10)]
    docs = [" ".join(rng.choice(vocab, rng.integers(1, 80))) for _ in range(300)]
    for phrase in (["w0", "w1"], ["w0", "w1", "w2"], ["w3", "w4", "w5", "w6"]):
        got = phrase_dense(docs, phrase)
        for i, doc in enumerate(docs):
            toks = doc.split()
            naive = sum(
                1
                for p in range(len(toks) - len(phrase) + 1)
                if all(toks[p + j] == phrase[j] for j in range(len(phrase)))
            )
            assert got[i] == naive, (phrase, i, got[i], naive)


def test_middle_split_no_false_positive():
    """5-term phrase with the rarest term mid-phrase: the split chains
    must constrain EVERY adjacent bigram — 'a b X c d e' is not a match
    for 'a b c d e' (regression: exclusive split skipped bigram b->c)."""
    filler = " ".join(["a b q d e"] * 30)  # a,b,d,e frequent; c rare
    docs = ["a b X c d e " + filler, "a b c d e " + filler, filler]
    got = phrase_dense(docs, ["a", "b", "c", "d", "e"])
    assert got.tolist() == [0, 1, 0]


def test_middle_split_naive_equivalence():
    """Randomized 5-term phrases with a rare middle term == naive scan."""
    rng = np.random.default_rng(11)
    vocab = ["a", "b", "d", "e", "f", "g"]
    docs = []
    for _ in range(200):
        toks = list(rng.choice(vocab, rng.integers(5, 60)))
        if rng.random() < 0.3:
            i = rng.integers(0, len(toks))
            toks[i] = "c"  # rare middle term
        docs.append(" ".join(toks))
    docs.append("a b c d e")
    phrase = ["a", "b", "c", "d", "e"]
    got = phrase_dense(docs, phrase)
    for i, doc in enumerate(docs):
        toks = doc.split()
        naive = sum(
            1 for p in range(len(toks) - 4)
            if all(toks[p + j] == phrase[j] for j in range(5)))
        assert got[i] == naive, (i, got[i], naive)


def test_trim_to_rarest_equivalence():
    """Rare-first trim must not change phrase results: hot+rare phrase
    over a corpus where one term is ~100x more frequent."""
    rng = np.random.default_rng(19)
    docs = []
    for i in range(400):
        toks = list(rng.choice(["the", "x", "y"], rng.integers(5, 40)))
        if i % 37 == 0:
            toks.extend(["the", "needle"])
        docs.append(" ".join(toks))
    arrs = build_term_arrays(docs)
    enc = [arrs["the"], arrs["needle"]]
    assert len(enc[0]) > K.TRIM_FACTOR * len(enc[1])  # trim path exercised
    got = phrase_dense(docs, ["the", "needle"])
    for i, doc in enumerate(docs):
        toks = doc.split()
        naive = sum(1 for p in range(len(toks) - 1)
                    if toks[p] == "the" and toks[p + 1] == "needle")
        assert got[i] == naive, (i, got[i], naive)


def test_intersect_sorted():
    a = np.array([1, 3, 5, 7, 9], dtype=np.uint64)
    b = np.array([2, 3, 4, 7, 10, 12], dtype=np.uint64)
    ia, ib = K._intersect_sorted(a, b)
    assert a[ia].tolist() == [3, 7]
    assert b[ib].tolist() == [3, 7]
    ia2, ib2 = K._intersect_sorted(b, a)
    assert b[ia2].tolist() == [3, 7]
    assert a[ib2].tolist() == [3, 7]
    ia3, ib3 = K._intersect_sorted(a, np.array([], dtype=np.uint64))
    assert len(ia3) == 0 and len(ib3) == 0


def test_slice_keys_sorted_probe():
    packed = K.encode(np.array([1, 1, 5, 9, 30]), np.array([0, 20, 3, 7, 2]))
    out = K.slice_keys(packed, np.array([1, 9], dtype=np.int64))
    ids, _ = K.termfreqs(out)
    assert ids.tolist() == [1, 9]
    assert K.unique_keys(packed).tolist() == [1, 5, 9, 30]


def test_slice_keys_keeps_duplicate_words_per_doc():
    """J2 intersect-keep-dups (reference intersect.pyx keep-dup variant):
    slicing a posting array to a doc set keeps EVERY word of a matching
    doc — multiple posn blocks and multi-bit payloads survive intact."""
    import numpy as np
    from searcharray_spark import kernels as K

    # doc 3: positions 0, 17, 18, 40 (three posn blocks); doc 7: posn 2
    packed = K.encode(np.array([3, 3, 3, 3, 7], dtype=np.uint64),
                      np.array([0, 17, 18, 40, 2], dtype=np.uint64))
    assert len(packed) == 4  # (3, blk0), (3, blk1), (3, blk2), (7, blk0)
    out = K.slice_keys(packed, np.array([3], dtype=np.int64))
    assert len(out) == 3  # all of doc 3's words kept, with duplicate key
    ids, posns = K.decode(out)
    assert ids.tolist() == [3, 3, 3, 3]
    assert posns.tolist() == [0, 17, 18, 40]
    # and the intersect index-pair primitive keeps payload identity
    ia, ib = K._intersect_sorted(K.headers(packed), K.headers(packed))
    assert len(ia) == 4  # every header matches itself exactly once


def test_mask_nearby_positions_bit_exact():
    """Cross-term proximity mask: only bits within `width` of a set bit
    in EVERY other array survive; empty words are dropped; cross-doc and
    cross-boundary bleed handled."""
    from searcharray_spark.kernels import encode, decode, mask_nearby_positions

    # doc 0: a at 0, 17, 40; b at 19, 100  (17&19 straddle a block edge)
    a = encode(np.array([0, 0, 0]), np.array([0, 17, 40]))
    b = encode(np.array([0, 0]), np.array([19, 100]))
    ma, mb = mask_nearby_positions([a, b], 2)
    ia, pa = decode(ma)
    ib, pb = decode(mb)
    assert pa.tolist() == [17]      # 0 and 40 are >2 from any b
    assert pb.tolist() == [19]      # 100 is >2 from any a
    # doc boundary: a in doc 0 posn 17, b in doc 1 posn 0 — the adjacent
    # HEADERS must not leak proximity across docs
    a2 = encode(np.array([0]), np.array([17]))
    b2 = encode(np.array([1]), np.array([0]))
    ma2, mb2 = mask_nearby_positions([a2, b2], 18)
    assert len(ma2) == 0 and len(mb2) == 0
    # width > 18 is a no-op passthrough (caller falls back to block mode)
    na, nb = mask_nearby_positions([a, b], 19)
    assert np.array_equal(na, a) and np.array_equal(nb, b)
