"""Property tests for the one-pass AND-shift phrase kernel.

``phrase_freqs_direct`` computes exact phrase frequencies by anchoring
on the rarest term and ANDing offset-shifted 54-bit position lanes of
every other term — one pass, no continuation chain. It must be
bit-equal (up to zero-count rows) to the bigram-chain path on every
phrase where the chain itself is exact: no adjacent-equal terms and no
middle-out split (rarest term at index <= 1 or >= k-2).

Reference semantics: phrase counting per
/root/reference/searcharray/phrase/middle_out.py:96-168 (chain of
bigram steps); the direct kernel is a fresh formulation with no
counterpart in the reference.
"""
import numpy as np
import pytest

from searcharray_spark import kernels as K


def build_term_arrays(docs):
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


def naive_counts(docs, phrase):
    out = {}
    k = len(phrase)
    for d, text in enumerate(docs):
        toks = text.split()
        c = sum(
            1
            for i in range(len(toks) - k + 1)
            if all(toks[i + j] == phrase[j] for j in range(k))
        )
        if c:
            out[d] = c
    return out


def run_both(docs, phrase):
    arrs = build_term_arrays(docs)
    empty = np.zeros(0, dtype=np.uint64)
    encoded = [arrs.get(t, empty) for t in phrase]
    d_ids, d_cnt = K.phrase_freqs_direct([e.copy() for e in encoded])
    g_ids, g_cnt = K.phrase_freqs([e.copy() for e in encoded])
    keep = g_cnt > 0
    g_ids, g_cnt = g_ids[keep], g_cnt[keep]
    keep = d_cnt > 0
    d_ids, d_cnt = d_ids[keep], d_cnt[keep]
    return dict(zip(d_ids.tolist(), d_cnt.tolist())), dict(
        zip(g_ids.tolist(), g_cnt.tolist()))


def test_direct_random_corpora_vs_chain_and_naive():
    rng = np.random.default_rng(20260817)
    vocab = ["a", "b", "c", "d", "e", "f", "g"]
    checked = 0
    for _ in range(250):
        nv = int(rng.integers(2, len(vocab) + 1))
        docs = [
            " ".join(rng.choice(vocab[:nv], rng.integers(1, 120)))
            for _ in range(int(rng.integers(1, 50)))
        ]
        k = int(rng.integers(2, 5))
        phrase = [vocab[int(rng.integers(0, nv))] for _ in range(k)]
        if any(phrase[i] == phrase[i + 1] for i in range(k - 1)):
            continue
        d, g = run_both(docs, phrase)
        truth = naive_counts(docs, phrase)
        assert d == truth, (phrase, d, truth)
        assert g == truth, (phrase, g, truth)
        checked += 1
    assert checked > 100


@pytest.mark.parametrize("offset", [0, 1, 16, 17, 18, 19, 35, 36, 37, 53])
def test_direct_block_boundaries(offset):
    """Phrase occurrences straddling 18-posn block boundaries: the lane
    concatenation (left | same<<18 | right<<36) must carry correctly."""
    prefix = " ".join(["dummy"] * offset) + (" " if offset else "")
    docs = [prefix + "foo bar baz qux", "nothing here", prefix + "foo baz"]
    arrs = build_term_arrays(docs)
    for phrase in (["foo", "bar"], ["foo", "bar", "baz"],
                   ["foo", "bar", "baz", "qux"], ["bar", "baz"]):
        encoded = [arrs[t] for t in phrase]
        ids, cnt = K.phrase_freqs_direct([e.copy() for e in encoded])
        assert dict(zip(ids.tolist(), cnt.tolist())) == {0: 1}, (offset, phrase)


def test_direct_doc_boundary_no_bleed():
    """Last position of doc N and first of doc N+1 must not form a
    phrase (cross-doc bleed is masked at block 0 / MAX block)."""
    docs = ["aaa bbb", "ccc ddd"]
    arrs = build_term_arrays(docs)
    ids, cnt = K.phrase_freqs_direct([arrs["bbb"], arrs["ccc"]])
    assert len(ids) == 0


def test_repeated_nonadjacent_term():
    docs = ["the of the end", "the of end", "of the of"]
    d, g = run_both(docs, ["the", "of", "the"])
    assert d == {0: 1}
    assert g == {0: 1}


def test_routing_same_term_uses_chain():
    """phrase_freqs must still apply the same-term run correction —
    adjacent-equal phrases may not take the direct path."""
    docs = ["foo foo foo foo", "foo foo", "bar"]
    arrs = build_term_arrays(docs)
    ids, cnt = K.phrase_freqs([arrs["foo"], arrs["foo"]])
    dense = dict(zip(ids.tolist(), cnt.tolist()))
    assert dense[0] == 2 and dense[1] == 1  # non-overlapping runs


def test_direct_empty_and_missing():
    docs = ["foo bar"]
    arrs = build_term_arrays(docs)
    empty = np.zeros(0, dtype=np.uint64)
    ids, cnt = K.phrase_freqs_direct([arrs["foo"], empty])
    assert len(ids) == 0
