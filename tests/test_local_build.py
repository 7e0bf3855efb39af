"""Driver-local small-build fast path (indexing._build_index_local).

Small corpora (<= SMALL_BUILD_MAX_DOCS docs) build driver-locally with
pyarrow writes — zero Spark jobs past one toPandas — but must produce
the SAME on-disk layout and the SAME query results as the distributed
path: single-row-group files, block-range partitioning, term-sorted
postings, per-term sketches, identical stats.
"""
import numpy as np
import pytest

from searcharray_spark import build_index
from searcharray_spark import indexing

DOCS = ["foo bar bar baz", "data2", "data3 bar", "bunny funny wunny"] * 25


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)], "doc_id long, text string")


def test_local_matches_distributed(spark, corpus, tmp_path, monkeypatch):
    local = build_index(spark, corpus, str(tmp_path / "loc"),
                        doc_id_col="doc_id", docs_per_block=16)
    assert local.meta.get("built_local") is True

    monkeypatch.setattr(indexing, "SMALL_BUILD_MAX_DOCS", 0)
    dist = build_index(spark, corpus, str(tmp_path / "dist"),
                       doc_id_col="doc_id", docs_per_block=16)
    assert dist.meta.get("built_local") is None

    assert local.num_docs == dist.num_docs
    assert local.avg_doc_len == dist.avg_doc_len
    assert local.meta["bounds_granularity"] == dist.meta["bounds_granularity"]
    assert local.meta["postings_single_row_group"] is True
    assert dist.meta["postings_single_row_group"] is True

    for t in ["foo", "bar", "baz", "data2", "bunny"]:
        assert local.docfreq(t) == dist.docfreq(t), t
    assert np.array_equal(local.score_dense("bar"), dist.score_dense("bar"))
    assert np.array_equal(local.termfreqs_dense(["foo", "bar"]),
                          dist.termfreqs_dense(["foo", "bar"]))
    # packed postings bytes identical per (term, block)
    lp = {(r["term"], r["block_id"]): bytes(r["postings"])
          for r in local.postings.collect()}
    dp = {(r["term"], r["block_id"]): bytes(r["postings"])
          for r in dist.postings.collect()}
    assert lp == dp


def test_local_build_zero_shuffle_plans(spark, corpus, tmp_path):
    idx = build_index(spark, corpus, str(tmp_path / "idx"),
                      doc_id_col="doc_id", docs_per_block=16)
    plan = idx.score(["foo", "bar"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan  # scan-aligned files survive pyarrow write


def test_local_build_pretokenized(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, ["a", "b", "a"]), (1, ["b"]), (2, [])],
        "doc_id long, toks array<string>")
    idx = build_index(spark, df, str(tmp_path / "tok"), doc_id_col="doc_id",
                      tokens_col="toks", docs_per_block=4)
    assert idx.meta.get("built_local") is True
    assert idx.docfreq("a") == 1 and idx.docfreq("b") == 2
    tf = {r["doc_id"]: r["tf"] for r in idx.termfreqs("a").collect()}
    assert tf == {0: 2.0}
    assert idx.num_docs == 3 and idx.avg_doc_len == pytest.approx(4 / 3)
