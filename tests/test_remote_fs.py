"""Remote-store abstraction (pyarrow.fs route).

A SearchIndex opened via a file:// URI must exercise the SAME code path
an object-store index would: every driver/executor-side metadata and
side-input read (meta.json, doclens ranges, tombstones, term sketches,
footer walks) goes through fsutil/pyarrow.fs, never bare os.* on the
URI. The sandbox has no s3, but LocalFileSystem-via-URI proves the
abstraction boundary end-to-end; unsupported schemes fail fast.
"""
import pytest

from searcharray_spark import build_index, fsutil
from searcharray_spark.index import SearchIndex

DOCS = ["foo bar bar baz", "data2 foo", "data3 bar baz qux",
        "bunny funny wunny", "foo baz foo bar baz", "qux qux bar"] * 20


@pytest.fixture()
def idx_path(spark, tmp_path):
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)], "doc_id long, text string")
    path = str(tmp_path / "idx")
    build_index(spark, corpus, path, doc_id_col="doc_id", docs_per_block=16)
    return path


def _snap(idx):
    return {
        "score": sorted(tuple(r) for r in idx.score("bar").collect()),
        "phrase": sorted(tuple(r)
                         for r in idx.termfreqs(["foo", "bar"]).collect()),
        "topk": [tuple(r) for r in idx.top_k("baz", k=5).collect()],
        "pos": sorted((r["doc_id"], tuple(r["posns"]))
                      for r in idx.positions("qux").collect()),
        "df": idx.docfreqs(["foo", "bar", "nope"]),
        "mem": idx.memory_report()["tables"],
    }


def test_file_uri_end_to_end(spark, idx_path, monkeypatch):
    plain = SearchIndex(spark, idx_path)
    want = _snap(plain)

    uri = SearchIndex(spark, "file://" + idx_path)
    assert uri.path.startswith("file://")  # the URI is kept, not stripped
    assert _snap(uri) == want

    # distributed path: executor-side side-input loaders get file:// URIs
    # through _doclens_file_ranges / scan_doclens_ranges
    dist = SearchIndex(spark, "file://" + idx_path)
    dist._local_ok = False
    assert dist._files_aligned() is True  # footer walk over the URI
    assert _snap(dist) == want


def test_file_uri_mutations(spark, idx_path):
    uri = SearchIndex(spark, "file://" + idx_path)
    uri.delete_docs([0, 3, 17])
    upd = spark.createDataFrame([(1, "zot zot")], "doc_id long, text string")
    uri.update_docs(upd)

    # a plain-path handle sees the identical mutated state
    plain = SearchIndex(spark, idx_path)
    assert _snap(plain) == _snap(SearchIndex(spark, "file://" + idx_path))
    assert plain.num_docs == uri.num_docs
    zot = sorted(r["doc_id"] for r in plain.score("zot").collect())
    assert zot == [1]


def test_file_uri_tombstone_sidetable(spark, idx_path, monkeypatch):
    monkeypatch.setattr(SearchIndex, "TOMBSTONE_DRIVER_MAX_ROWS", 5)
    uri = SearchIndex(spark, "file://" + idx_path)
    uri.delete_docs(range(0, 40))
    from searcharray_spark.index import TombstoneReader
    tomb = uri._tombstones()
    assert isinstance(tomb, TombstoneReader)
    assert all(p.startswith("file://") for p, _, _ in tomb.ranges)
    alive = {r["doc_id"] for r in uri.score("bar").collect()}
    assert alive & set(range(0, 40)) == set()


def test_unsupported_scheme_fails_fast(spark):
    with pytest.raises(NotImplementedError, match="scheme"):
        SearchIndex(spark, "bogus-scheme://bucket/index")


def test_local_path_helper():
    assert fsutil.local_path("/a/b") == "/a/b"
    assert fsutil.local_path("file:///a/b") == "/a/b"
    with pytest.raises(NotImplementedError):
        fsutil.local_path("s3://bucket/x")
