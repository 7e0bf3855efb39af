"""Two-field edismax with a naive tokenize-and-scan oracle — the
reference's end-to-end strategy (/root/reference/test/test_tmdb.py:194-259,
naive_find_term at test/test_utils.py:54-57), on a synthetic title/body
corpus embedding the reference query patterns (FIXTURES.md F5)."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from searcharray_spark import build_index
from searcharray_spark.solr import edismax
from searcharray_spark.tokenizers import web_tokenizer

TITLES = [
    "Star Wars",
    "Star Trek The Next Generation",
    "The Quick Brown Fox",
    "Bill and Ted's Excellent Adventure",
    "A Daughter of a Refugee Family",
    "What Is the Purpose of Cats",
    "Empty Overview Movie",
    "Galactic Empire Strikes",
    "The Bartender Story",
    "Nothing Related",
]
BODIES = [
    "thirty years after defeating the galactic empire a new hero rises",
    "the next generation of the crew continues the voyage",
    "the quick brown fox jumps over the lazy dog",
    "bill and ted travel through time for an excellent adventure",
    "a film about a daughter of a refugee family finding home",
    "what is the purpose of cats a deep question",
    "",
    "the empire returns with what is the purpose of war",
    "a bartender fights a cow and wins the fight",
    "completely unrelated text about gardening and soup",
]

QUERIES = [
    "Star Wars", "the next generation", "bartender fights a cow and",
    "what is", "what is the purpose", "what is the purpose of cats",
    "star trek", "star trek the next generation", "what what what",
    "galactic empire", "excellent adventure",
]


@pytest.fixture(scope="module")
def fields(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("tmdb")
    n = len(TITLES)
    title_df = spark.createDataFrame(list(zip(range(n), TITLES)),
                                     "doc_id long, text string")
    body_df = spark.createDataFrame(list(zip(range(n), BODIES)),
                                    "doc_id long, text string")
    return {
        "title": build_index(spark, title_df, str(base / "title"),
                             doc_id_col="doc_id", tokenizer="web"),
        "body": build_index(spark, body_df, str(base / "body"),
                            doc_id_col="doc_id", tokenizer="web"),
    }


def naive_match_set(query, mm_all=False):
    """Naive oracle: docs where any (or all) query token appears in any
    field (tokenize-and-scan)."""
    toks = web_tokenizer(query)
    out = set()
    for i, (t, b) in enumerate(zip(TITLES, BODIES)):
        doc_toks = set(web_tokenizer(t)) | set(web_tokenizer(b))
        hits = sum(1 for tok in set(toks) if tok in doc_toks)
        if mm_all:
            if all(tok in doc_toks for tok in toks):
                out.add(i)
        elif hits >= 1:
            out.add(i)
    return out


@pytest.mark.parametrize("query", QUERIES)
def test_edismax_matchset_or(fields, query):
    got = edismax(fields, q=query, qf=["title^2", "body"], mm="1")
    got_set = {r["doc_id"] for r in got.collect()}
    assert got_set == naive_match_set(query), query


@pytest.mark.parametrize("query", ["star trek", "galactic empire", "what is"])
def test_edismax_matchset_and(fields, query):
    got = edismax(fields, q=query, qf=["title", "body"], q_op="AND")
    got_set = {r["doc_id"] for r in got.collect()}
    assert got_set == naive_match_set(query, mm_all=True), query


@pytest.mark.parametrize("tie", [0.0, 0.1, 0.3])
def test_edismax_tie_monotone(fields, tie):
    got = {r["doc_id"]: r["score"]
           for r in edismax(fields, q="star trek", qf=["title^2", "body"],
                            tie=tie).collect()}
    base = {r["doc_id"]: r["score"]
            for r in edismax(fields, q="star trek", qf=["title^2", "body"],
                             tie=0.0).collect()}
    assert set(got) == set(base)
    for d in got:
        assert got[d] >= base[d] - 1e-9


def test_edismax_pf_boosts_phrase_docs(fields):
    q = "the next generation"
    base = {r["doc_id"]: r["score"]
            for r in edismax(fields, q=q, qf=["title", "body"]).collect()}
    with_pf = {r["doc_id"]: r["score"]
               for r in edismax(fields, q=q, qf=["title", "body"],
                                pf=["body"], pf2=["body"]).collect()}
    assert set(with_pf) == set(base)
    # doc 1 contains the exact phrase in body -> must gain score
    assert with_pf[1] > base[1]
    # repeated queries deterministic
    again = {r["doc_id"]: r["score"]
             for r in edismax(fields, q=q, qf=["title", "body"],
                              pf=["body"], pf2=["body"]).collect()}
    assert again == with_pf


def test_score_deterministic_across_runs(fields):
    a = fields["body"].score_dense(["what", "is"])
    b = fields["body"].score_dense(["what", "is"])
    assert np.array_equal(a, b)
