"""Index merge + streaming-segment ingestion tests."""
import os

import numpy as np
import pytest

from searcharray_spark import SearchIndex, build_index
from searcharray_spark.merge import merge_indexes
from searcharray_spark.streaming import compact_segments, index_stream

DOCS = [(i, f"w{i % 7} common w{i % 13} tail{i % 29}") for i in range(600)]


def test_merge_disjoint_indexes(spark, tmp_path):
    df_all = spark.createDataFrame(DOCS, "doc_id long, text string")
    clean = build_index(spark, df_all, str(tmp_path / "clean"),
                        doc_id_col="doc_id", docs_per_block=64)
    # two halves on disjoint doc ranges (blocks 0.. and 4..)
    a = build_index(spark, df_all.filter("doc_id < 256"), str(tmp_path / "a"),
                    doc_id_col="doc_id", docs_per_block=64)
    b = build_index(spark, df_all.filter("doc_id >= 256"), str(tmp_path / "b"),
                    doc_id_col="doc_id", docs_per_block=64)
    merged = merge_indexes(spark, [str(tmp_path / "a"), str(tmp_path / "b")],
                           str(tmp_path / "merged"))
    assert merged.num_docs == clean.num_docs
    assert abs(merged.avg_doc_len - clean.avg_doc_len) < 1e-9
    for tok in ("common", "w3", ["w1", "common"]):
        assert np.array_equal(merged.score_dense(tok), clean.score_dense(tok)), tok
    assert merged.docfreq("common") == clean.docfreq("common")


def test_merge_rejects_overlap(spark, tmp_path):
    df_all = spark.createDataFrame(DOCS[:200], "doc_id long, text string")
    build_index(spark, df_all, str(tmp_path / "x"), doc_id_col="doc_id",
                docs_per_block=64)
    build_index(spark, df_all, str(tmp_path / "y"), doc_id_col="doc_id",
                docs_per_block=64)
    with pytest.raises(Exception, match="overlapping"):
        merge_indexes(spark, [str(tmp_path / "x"), str(tmp_path / "y")],
                      str(tmp_path / "z"))


def test_streaming_segments_equal_batch_build(spark, tmp_path):
    src = tmp_path / "stream_src"
    os.makedirs(src)
    df_all = spark.createDataFrame(DOCS, "doc_id long, text string")
    # three source files -> three micro-batches (maxFilesPerTrigger=1)
    for i, cond in enumerate(("doc_id < 200",
                              "doc_id >= 200 and doc_id < 400",
                              "doc_id >= 400")):
        df_all.filter(cond).coalesce(1).write.mode("overwrite") \
            .parquet(str(src / f"chunk{i}"))
    stream = spark.readStream.schema("doc_id long, text string") \
        .option("maxFilesPerTrigger", 1) \
        .parquet(str(src / "chunk*"))
    q = index_stream(stream, str(tmp_path / "sidx"), doc_id_col="doc_id",
                     docs_per_block=64, available_now=True)
    q.awaitTermination(300)
    segs = os.listdir(str(tmp_path / "sidx" / "segments"))
    assert len(segs) >= 2, segs

    merged = compact_segments(spark, str(tmp_path / "sidx"))
    clean = build_index(spark, df_all, str(tmp_path / "clean"),
                        doc_id_col="doc_id", docs_per_block=64)
    assert merged.num_docs == clean.num_docs
    for tok in ("common", ["w1", "common"]):
        assert np.array_equal(merged.score_dense(tok), clean.score_dense(tok))


def test_memory_report(spark, tmp_path):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = build_index(spark, df, str(tmp_path / "mr"), doc_id_col="doc_id",
                      docs_per_block=128)
    rep = idx.memory_report(top_n=3)
    assert rep["num_docs"] == 600
    assert rep["total_bytes"] > 0
    assert rep["tables"]["postings"] > 0
    assert rep["top_terms"][0][0] == "common"  # most posting bytes
