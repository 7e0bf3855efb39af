"""Memory-aware postings cache gate: postings cache only when their
estimated in-memory footprint fits the measured BlockManager storage
budget (always, under force=True); doclens always cache. The gate must
scale with the cluster — a fixed byte cap would wrongly skip caching on
a large-memory cluster and wrongly cache on a tiny one.
"""
import pytest

from searcharray_spark import SearchIndex, build_index

CORPUS = ["foo bar bar baz", "data2", "data3 bar", "bunny funny wunny"] * 25


@pytest.fixture()
def idx(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")
    return build_index(spark, df, str(tmp_path / "idx"),
                       doc_id_col="doc_id", docs_per_block=64)


def test_storage_capacity_positive_in_local_mode(idx):
    # local mode has exactly one BlockManager (the driver); with a
    # multi-GB driver heap its storage region is far above zero
    assert idx._storage_capacity_bytes() > 100 * (1 << 20)


def test_small_index_caches_postings(idx):
    assert idx._should_cache_postings()
    idx.cache()
    assert idx._postings_df is not None
    assert idx._doclens_df is not None


def test_oversized_postings_skip_cache_but_doclens_cache(idx, monkeypatch):
    cap = idx._storage_capacity_bytes()
    monkeypatch.setattr(
        SearchIndex, "_postings_bytes",
        lambda self: int(cap / self.CACHE_EXPANSION) + (1 << 20))
    assert not idx._should_cache_postings()
    idx.cache()
    assert idx._postings_df is None
    assert idx._doclens_df is not None


def test_force_overrides_gate(idx, monkeypatch):
    monkeypatch.setattr(SearchIndex, "_postings_bytes",
                        lambda self: 1 << 50)
    idx.cache(force=True)
    assert idx._postings_df is not None


def test_fallback_cap_when_capacity_unknown(idx, monkeypatch):
    monkeypatch.setattr(SearchIndex, "_storage_capacity_bytes",
                        lambda self: 0)
    monkeypatch.setattr(SearchIndex, "_postings_bytes",
                        lambda self: SearchIndex.POSTINGS_CACHE_MAX_BYTES - 1)
    assert idx._should_cache_postings()
    monkeypatch.setattr(SearchIndex, "_postings_bytes",
                        lambda self: SearchIndex.POSTINGS_CACHE_MAX_BYTES + 1)
    assert not idx._should_cache_postings()


def test_gate_scales_with_capacity(idx, monkeypatch):
    # 1 GiB postings: skipped on a 4 GiB-storage cluster, cached on 64 GiB
    monkeypatch.setattr(SearchIndex, "_postings_bytes",
                        lambda self: 1 << 30)
    monkeypatch.setattr(SearchIndex, "_storage_capacity_bytes",
                        lambda self: 4 << 30)
    assert not idx._should_cache_postings()
    monkeypatch.setattr(SearchIndex, "_storage_capacity_bytes",
                        lambda self: 64 << 30)
    assert idx._should_cache_postings()
