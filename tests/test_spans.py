"""Slop (proximity span) tests: scenarios from
/root/reference/test/test_slop_matches.py + the monotonicity invariants
from test_phrase_matches.py:206-221."""
import numpy as np
import pytest

from searcharray_spark import kernels as K
from searcharray_spark.spans import span_freqs

from tests.test_kernels import build_term_arrays


def slop_dense(docs, phrase, slop):
    arrs = build_term_arrays(docs)
    encoded = [arrs.get(t, np.zeros(0, dtype=np.uint64)) for t in phrase]
    if slop == 0:
        ids, counts = K.phrase_freqs(encoded)
    else:
        ids, counts = span_freqs(encoded, slop)
    out = np.zeros(len(docs), dtype=np.int64)
    if len(ids):
        out[ids] = counts
    return out


SLOP_SCENARIOS = {
    "direct_phrase": ("intergalactic bounty hunters",
                      """A massive ball of furry creatures from another world eat their way through a small mid-western town followed by intergalactic bounty hunters opposed only by militant townspeople.""",
                      0, True),
    "slop_1": ("massive ball furry",
               """A massive ball of furry creatures from another world eat their way through a small mid-western town followed by intergalactic bounty hunters opposed only by militant townspeople.""",
               1, True),
    "two_after_the": ("the to be",
                      """Broke and alone on New Year's Eve, Wilson just wants to spend the rest of a very bad year in bed. But, when his best friend convinces him to post a personal ad, he meets a woman bent on finding the right guy to be with at midnight.""",
                      2, True),
    "slop_3_order": ("the to be",
                     """A series of hideous murders is taking place, and Inspector Capell and cop-turned-novelist Lonergan are investigating. The murders are found to be the work of an out-of-control experiment in genetic engineering. The two men must descend into the city's sewer systems to destroy the horrific miscreation. It won't be hard to find, as it's already looking for its next victims...""",
                     3, True),
    "slop_5": ("spice found substance",
               """In the year 10,191, the world is at war for control of the desert planet Dune—the only place where the time-travel substance spice can be found But when one leader gives up control, it's only so he can stage a coup with some unsavory characters.""",
               5, True),
    "slop_5_len_5": ("spice found substance can be",
                     """In the year 10,191, the world is at war for control of the desert planet Dune—the only place where the time-travel substance spice can be found But when one leader gives up control, it's only so he can stage a coup with some unsavory characters.""",
                     5, True),
    "slop_5_len_5_no_match": ("there is no match for this",
                              """In the year 10,191, the world is at war for control of the desert planet Dune—the only place where the time-travel substance spice can be found But when one leader gives up control, it's only so he can stage a coup with some unsavory characters.""",
                              5, False),
}


@pytest.mark.parametrize("name", list(SLOP_SCENARIOS))
def test_slop_scenarios(name):
    """Reference protocol: index [doc, " empty ", doc+doc, " empty"] * 100;
    matching docs (even) must score > 0 at every slop >= the scenario's,
    empty docs never."""
    phrase, doc, slop, match = SLOP_SCENARIOS[name]
    docs = [doc, " empty ", doc + " " + doc, " empty"] * 10
    toks = phrase.split()
    for s in range(max(slop, 1), 10):
        freqs = slop_dense(docs, toks, s)
        if match:
            assert (freqs[::2] > 0).all(), (name, s, freqs[:4])
        else:
            assert (freqs[::2] == 0).all(), (name, s)
        assert (freqs[1::2] == 0).all(), (name, s)


PHRASES = [
    ["foo", "bar"],
    ["foo", "bar", "baz"],
    ["foo", "foo"],
    ["foo", "foo", "bar"],
    ["foo", "bar", "bar"],
]


@pytest.mark.parametrize("phrase", PHRASES)
@pytest.mark.parametrize("offset", [0, 5, 16, 17, 30, 35, 54])
def test_slop_invariants(phrase, offset):
    """slop-k matches ⊇ slop-(k-1) ⊇ exact; freqs monotone in slop."""
    prefix = " ".join(["dummy"] * offset)
    docs = [
        prefix + " " + " ".join(phrase),
        "no match at all",
        prefix + " foo x bar y baz",
        prefix + " " + " ".join(phrase) + " filler " + " ".join(phrase),
        "bar foo baz",
        "foo y y y y bar",
    ]
    exact = slop_dense(docs, phrase, 0)
    last = exact
    for s in range(1, 8):
        cur = slop_dense(docs, phrase, s)
        assert (cur >= exact).all(), (phrase, offset, s, cur, exact)
        assert (cur >= last).all(), (phrase, offset, s, cur, last)
        assert (cur[np.asarray(exact) > 0] > 0).all()
        last = cur


def test_slop_order_free():
    docs = ["c b a", "a b c", "a x b x c", "a c"]
    freqs = slop_dense(docs, ["a", "b", "c"], 1)
    assert (freqs > 0).tolist() == [True, True, False, False]
    freqs2 = slop_dense(docs, ["a", "b", "c"], 2)
    assert (freqs2 > 0).tolist() == [True, True, True, False]


def test_slop_multiplicity():
    docs = ["the x the y the", "the x the", "the", "the the the"]
    freqs = slop_dense(docs, ["the", "the", "the"], 2)
    assert (freqs > 0).tolist() == [True, False, False, True]


def test_vectorized_matches_python_reference_random():
    """The vectorized span kernel must equal the per-doc Python greedy
    implementation on randomized corpora (incl. repeated-term phrases)."""
    from searcharray_spark.spans import span_freqs_py
    rng = np.random.default_rng(23)
    vocab = ["a", "b", "c", "d", "e", "the"]
    for trial in range(20):
        docs = [" ".join(rng.choice(vocab, rng.integers(2, 120)))
                for _ in range(100)]
        arrs = build_term_arrays(docs)
        for phrase in (["a", "b"], ["a", "b", "c"], ["the", "the"],
                       ["the", "a", "the"], ["a", "b", "c", "d", "e"]):
            encoded = [arrs.get(t, np.zeros(0, dtype=np.uint64)) for t in phrase]
            # slop 1/2/5 drive the bit-exact proximity mask (width <= 18);
            # slop 20 drives the posn-block fallback (width > 18)
            for slop in (1, 2, 5, 20):
                iv, cv = span_freqs(encoded, slop)
                ip, cp = span_freqs_py(encoded, slop)
                assert iv.tolist() == ip.tolist(), (trial, phrase, slop)
                assert cv.tolist() == cp.tolist(), (trial, phrase, slop)


def test_vectorized_spans_cross_block_positions():
    """Positions straddling 18-posn block boundaries."""
    from searcharray_spark.spans import span_freqs_py
    for offset in range(0, 60):
        docs = [" ".join(["z"] * offset) + " foo qq bar",
                " ".join(["z"] * offset) + " bar qq qq foo",
                "nothing"]
        arrs = build_term_arrays(docs)
        encoded = [arrs.get(t, np.zeros(0, dtype=np.uint64))
                   for t in ["foo", "bar"]]
        for slop in (1, 2, 3):
            iv, cv = span_freqs(encoded, slop)
            ip, cp = span_freqs_py(encoded, slop)
            assert iv.tolist() == ip.tolist(), (offset, slop)
            assert cv.tolist() == cp.tolist(), (offset, slop)
