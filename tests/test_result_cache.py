"""Opt-in per-(state, query) result memoization (ROADMAP §2):
repeated top-k queries answer from a driver-held LocalRelation with
zero Spark jobs; mutations invalidate; unhashable similarities bypass.
"""
import pytest

from searcharray_spark import SearchIndex, bm25_similarity, build_index

CORPUS = ["foo bar bar baz", "data2", "data3 bar", "bunny funny wunny"] * 25


@pytest.fixture()
def idx(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")
    return build_index(spark, df, str(tmp_path / "idx"),
                       doc_id_col="doc_id", docs_per_block=64)


def _rows(df):
    return [(r["doc_id"], round(float(r["score"]), 6)) for r in df.collect()]


def test_cache_hit_identical_and_flagged(idx):
    idx.enable_result_cache()
    first = idx.top_k("bar", k=5)
    assert first._result_cache_hit is False
    second = idx.top_k("bar", k=5)
    assert second._result_cache_hit is True
    assert _rows(first) == _rows(second)
    # a LocalRelation plan: no file scan, no exchange, no Spark compute
    plan = second._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert "FileScan" not in plan and "Exchange" not in plan


def test_cache_keys_distinguish_queries(idx):
    idx.enable_result_cache()
    bar = _rows(idx.top_k("bar", k=5))
    assert _rows(idx.top_k("foo", k=5)) != bar          # different token
    assert len(_rows(idx.top_k("bar", k=3))) == 3       # different k
    assert _rows(idx.top_k("bar", k=5)) == bar          # still cached
    # slop / phrase variants get their own entries and never collide
    p0 = _rows(idx.top_k(["foo", "bar"], k=5))
    _ = _rows(idx.top_k(["foo", "bar"], k=5, slop=2))
    again = idx.top_k(["foo", "bar"], k=5)
    assert again._result_cache_hit is True and _rows(again) == p0


def test_top_k_pruned_cached(idx):
    idx.enable_result_cache()
    first = idx.top_k_pruned(["foo", "bar"], k=5)
    hit = idx.top_k_pruned(["foo", "bar"], k=5)
    assert hit._wand_blocks_scanned == -2  # answered from the cache
    assert _rows(first) == _rows(hit)


def test_mutation_invalidates(idx, spark):
    idx.enable_result_cache()
    before = _rows(idx.top_k("bar", k=5))
    idx.delete_docs([before[0][0]])
    after = idx.top_k("bar", k=5)
    assert after._result_cache_hit is False  # cache was cleared
    assert before[0][0] not in [d for d, _ in _rows(after)]


def test_unhashable_similarity_bypasses(idx):
    idx.enable_result_cache()

    class WeirdSim:
        __hash__ = None

        def __call__(self, tf, df, dl, avgdl, n):
            return tf

    # un-flagged custom similarity: exhaustive scoring, and the
    # unhashable key must bypass the cache rather than crash
    out = idx.top_k("bar", k=5, similarity=WeirdSim())
    assert len(out.collect()) == 5
    assert len(idx._result_cache) == 0  # nothing was stored


def test_custom_similarity_keys_on_object(idx):
    idx.enable_result_cache()
    s1 = bm25_similarity(k1=0.5)
    s2 = bm25_similarity(k1=2.0)
    r1 = _rows(idx.top_k("bar", k=5, similarity=s1))
    r2 = _rows(idx.top_k("bar", k=5, similarity=s2))
    assert r1 != r2  # distinct closures must not collide
    assert _rows(idx.top_k("bar", k=5, similarity=s1)) == r1


def test_candidates_bypass(idx, spark):
    idx.enable_result_cache()
    cand = spark.createDataFrame([(0,), (2,)], "doc_id long")
    out = idx.top_k("bar", k=5, candidates=cand)
    got = sorted(d for d, _ in _rows(out))
    assert got == [0, 2]


def test_lru_eviction(idx):
    idx.enable_result_cache(max_entries=2)
    idx.top_k("bar", k=5)
    idx.top_k("foo", k=5)
    idx.top_k("baz", k=5)          # evicts "bar"
    assert idx.top_k("baz", k=5)._result_cache_hit is True
    assert idx.top_k("bar", k=5)._result_cache_hit is False
    idx.disable_result_cache()
    assert not hasattr(idx.top_k("baz", k=5), "_result_cache_hit")
