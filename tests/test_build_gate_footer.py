"""Soundness of the zero-job build gate (_scan_footer_stats):
parquet footer numbers may only ever push a corpus TOWARD the
distributed path, never wrongly into the driver-local one."""
import os

import pytest
from pyspark.sql import functions as F

import searcharray_spark as sa
from searcharray_spark import indexing


def test_dictionary_encoded_text_not_proven_small(spark, tmp_path,
                                                  monkeypatch):
    """Duplicate text dictionary-encodes to almost nothing in the
    footer; the gate must still measure RAW bytes with the bounded job
    and route an over-cap corpus to the distributed build."""
    src = str(tmp_path / "src")
    big = "lorem ipsum " * 4000  # ~48 KB raw per doc
    spark.createDataFrame([(i, big) for i in range(64)],
                          "doc_id long, text string") \
        .coalesce(1).write.parquet(src)
    docs = spark.read.parquet(src)

    df = docs.select(F.col("doc_id").cast("long"), F.col("text"))
    stats = indexing._scan_footer_stats(df, "text")
    assert stats is not None
    rows_ub, enc_bytes, max_doc = stats
    assert rows_ub == 64 and max_doc == 63
    # the encoded footer bytes are far below the raw ~3 MB — the very
    # reason they must not prove smallness
    assert enc_bytes < 64 * 48_000

    monkeypatch.setattr(indexing, "SMALL_BUILD_MAX_BYTES", 1 << 20)
    idx = sa.build_index(spark, docs, str(tmp_path / "idx"),
                         doc_id_col="doc_id", docs_per_block=16)
    meta = idx.meta
    assert not meta.get("built_local", False)  # went distributed
    assert meta["num_docs"] == 64
    assert idx.docfreq("lorem") == 64


def test_string_doc_id_stats_not_trusted(spark, tmp_path):
    """Lexicographic string stats would understate a numeric max
    ("9999" > "20000"); the footer max must only come from physical
    parquet integers."""
    src = str(tmp_path / "src_str")
    spark.createDataFrame(
        [(str(i), f"w{i}") for i in (5, 40, 9999, 20000)],
        "doc_id string, text string").coalesce(1).write.parquet(src)
    docs = spark.read.parquet(src)
    df = docs.select(F.col("doc_id").cast("long"), F.col("text"))
    stats = indexing._scan_footer_stats(df, "text")
    assert stats is not None
    rows_ub, _enc, max_doc = stats
    assert rows_ub == 4
    assert max_doc is None  # string column: stats refused


def test_filtered_scan_never_trusts_max(spark, tmp_path):
    src = str(tmp_path / "src_f")
    spark.createDataFrame([(i, f"w{i}") for i in range(100)],
                          "doc_id long, text string") \
        .coalesce(1).write.parquet(src)
    docs = spark.read.parquet(src).filter("doc_id < 10")
    df = docs.select(F.col("doc_id").cast("long"), F.col("text"))
    stats = indexing._scan_footer_stats(df, "text")
    assert stats is not None
    rows_ub, _enc, max_doc = stats
    assert rows_ub == 100  # upper bound, fine
    assert max_doc is None  # filter present: stats max refused
