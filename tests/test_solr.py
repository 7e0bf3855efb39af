"""edismax + mm-spec tests, ported from /root/reference/test/test_solr.py.

Expected edismax scores are expressed in terms of our own single-term
``score`` results (whose values are separately pinned to Lucene goldens in
test_search_api.py) — the same self-consistency oracle the reference uses.
"""
import numpy as np
import pytest

from searcharray_spark import build_index
from searcharray_spark.solr import edismax, parse_field_boosts, parse_min_should_match


# --- parse_min_should_match goldens (reference test_solr.py:12-69) ---
@pytest.mark.parametrize("n,spec,expected", [
    (10, "50%", 5),
    (10, "150%", 10),
    (10, "-50%", 5),
    (10, "3", 3),
    (10, "-3", 7),
    (10, "15", 10),
    (10, "5<70%", 7),
    (10, "15<70%", 10),
    (10, "3<50% 5<30%", 3),
    (10, "2<2 5<3 7<40%", 4),
])
def test_parse_mm(n, spec, expected):
    assert parse_min_should_match(n, spec) == expected


@pytest.mark.parametrize("spec", ["five%", "five", "5<", ""])
def test_parse_mm_invalid(spec):
    with pytest.raises(ValueError):
        parse_min_should_match(10, spec)


def test_parse_field_boosts():
    assert parse_field_boosts(["title^2.0", "body"]) == {"title": 2.0, "body": None}
    assert parse_field_boosts([]) == {}


# --- edismax scenarios ---
TITLE = ["foo bar bar baz", "data2", "data3 bar", "bunny funny wunny"]
BODY = ["buzz", "data2", "data3 bar", "bunny funny wunny"]


def _make_lowercasing_tokenizer():
    # defined as a nested function so cloudpickle serializes it by value
    # (a tests-module global would pickle by reference and fail to import
    # on executors)
    def just_lowercasing_tokenizer(text):
        return [text.lower()]
    return just_lowercasing_tokenizer


def _make_b_tokenizer():
    def everythings_a_b_tokenizer(text):
        return ["b"] * len(text.split())
    return everythings_a_b_tokenizer


@pytest.fixture(scope="module")
def two_fields(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("edismax")
    title_df = spark.createDataFrame(list(enumerate(TITLE)), "doc_id long, text string")
    body_df = spark.createDataFrame(list(enumerate(BODY)), "doc_id long, text string")
    title = build_index(spark, title_df, str(base / "title"), doc_id_col="doc_id")
    body = build_index(spark, body_df, str(base / "body"), doc_id_col="doc_id")
    return {"title": title, "body": body}


def dense(df, n=4):
    out = np.zeros(n, dtype=np.float64)
    for r in df.collect():
        out[r["doc_id"]] = r["score"]
    return out


def test_edismax_base(two_fields):
    got = dense(edismax(two_fields, q="foo bar", qf=["title", "body"]))
    t, b = two_fields["title"], two_fields["body"]
    expected = [
        t.score_dense("foo")[0] + t.score_dense("bar")[0],
        0,
        max(t.score_dense("bar")[2], b.score_dense("bar")[2]),
        0,
    ]
    assert np.allclose(got, expected), (got, expected)


def test_edismax_boost(two_fields):
    got = dense(edismax(two_fields, q="foo bar", qf=["title^10", "body"]))
    t, b = two_fields["title"], two_fields["body"]
    expected = [
        t.score_dense("foo")[0] * 10 + t.score_dense("bar")[0] * 10,
        0,
        max(t.score_dense("bar")[2] * 10, b.score_dense("bar")[2]),
        0,
    ]
    assert np.allclose(got, expected)


def test_edismax_pf(two_fields):
    got = dense(edismax(two_fields, q="foo bar", qf=["title", "body"], pf=["title"]))
    t, b = two_fields["title"], two_fields["body"]
    expected = [
        t.score_dense(["foo", "bar"])[0] + t.score_dense("foo")[0] + t.score_dense("bar")[0],
        0,
        max(t.score_dense("bar")[2], b.score_dense("bar")[2]),
        0,
    ]
    assert np.allclose(got, expected)


def test_edismax_mm_and(two_fields):
    got = dense(edismax(two_fields, q="foo bar", qf=["title", "body"], q_op="AND"))
    # only doc 0 has both foo and bar
    assert got[0] > 0
    assert np.all(got[1:] == 0)


def test_edismax_field_centric(spark, tmp_path_factory, two_fields):
    """Different analyzers per field -> field-centric scoring."""
    base = tmp_path_factory.mktemp("fieldcentric")
    body_lc = build_index(
        spark,
        spark.createDataFrame(
            list(enumerate(["foo bar", "data2", "data3 bar", "bunny funny wunny"])),
            "doc_id long, text string"),
        str(base / "body"), doc_id_col="doc_id",
        tokenizer=_make_lowercasing_tokenizer())
    fields = {"title": two_fields["title"], "body": body_lc}
    got = dense(edismax(fields, q="foo bar", qf=["title", "body"]))
    t = fields["title"]
    expected = [
        max(t.score_dense("foo")[0] + t.score_dense("bar")[0],
            body_lc.score_dense("foo bar")[0]),
        0,
        t.score_dense("bar")[2],
        0,
    ]
    assert np.allclose(got, expected), (got, expected)


def test_edismax_field_centric_tie(spark, tmp_path_factory, two_fields):
    base = tmp_path_factory.mktemp("fieldcentrictie")
    body_lc = build_index(
        spark,
        spark.createDataFrame(
            list(enumerate(["foo bar", "data2", "data3 bar", "bunny funny wunny"])),
            "doc_id long, text string"),
        str(base / "body"), doc_id_col="doc_id",
        tokenizer=_make_lowercasing_tokenizer())
    fields = {"title": two_fields["title"], "body": body_lc}
    got = dense(edismax(fields, q="foo bar", qf=["title", "body"], tie=0.1))
    t = fields["title"]
    title_sum = t.score_dense("foo")[0] + t.score_dense("bar")[0]
    body_score = body_lc.score_dense("foo bar")[0]
    expected0 = max(title_sum, body_score) + 0.1 * min(title_sum, body_score)
    assert np.isclose(got[0], expected0)
    assert got[1] == 0 and got[3] == 0


def test_edismax_different_analyzers(spark, tmp_path_factory, two_fields):
    base = tmp_path_factory.mktemp("analyzers")
    body_b = build_index(
        spark,
        spark.createDataFrame(list(enumerate(BODY)), "doc_id long, text string"),
        str(base / "body"), doc_id_col="doc_id",
        tokenizer=_make_b_tokenizer())
    fields = {"title": two_fields["title"], "body": body_b}
    got = dense(edismax(fields, q="bar", qf=["title", "body"]))
    t = fields["title"]
    b_scores = body_b.score_dense("b")
    expected = [
        max(t.score_dense("bar")[0], b_scores[0]),
        b_scores[1],
        max(t.score_dense("bar")[2], b_scores[2]),
        b_scores[3],
    ]
    assert np.allclose(got, expected), (got, expected)


def test_edismax_explain_term_centric(two_fields):
    df, explain = edismax(two_fields, q="foo bar", qf=["title^10", "body"],
                          return_explain=True)
    assert explain == "((title:foo^10.0 | body:foo^1) (title:bar^10.0 | body:bar^1))~1"
    df.collect()


def test_edismax_explain_pf_phases(two_fields):
    _, explain = edismax(two_fields, q="foo bar bar", qf=["title"],
                         pf=["title^2"], pf2=["title"], return_explain=True)
    assert explain.startswith("((title:foo^1) (title:bar^1) (title:bar^1))~1")
    assert ' (title:"foo bar bar")^2.0' in explain
    assert ' (title:"foo bar")^1 (title:"bar bar")^1' in explain


def test_edismax_ps_slop_widens_pf_match(two_fields):
    # "foo baz" is not adjacent in doc 0 ("foo bar bar baz") but matches
    # with slop >= 2; ps must reach the pf phrase scorer
    tight = dense(edismax(two_fields, q="foo baz", qf=["title"], pf=["title"]))
    sloppy = dense(edismax(two_fields, q="foo baz", qf=["title"], pf=["title"], ps=2))
    assert sloppy[0] > tight[0]
    assert np.all(sloppy[1:] == tight[1:])


def test_edismax_exact_matches_float32_ranking(two_fields):
    f32 = dense(edismax(two_fields, q="foo bar", qf=["title^2", "body"], tie=0.3))
    ex = dense(edismax(two_fields, q="foo bar", qf=["title^2", "body"], tie=0.3,
                       exact=True))
    assert np.allclose(f32, ex, rtol=1e-5), (f32, ex)
