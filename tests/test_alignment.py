"""Soundness of the zero-shuffle phrase path's alignment predicate.

The zero-shuffle phrase/slop plan requires every query term's posting
rows for a doc block to land in ONE scan partition. The guarantee rests
on parquet mechanics: a row group is read by the one file split that
contains its byte midpoint, so a SINGLE-row-group file is never split
across scan partitions — regardless of spark.sql.files.maxPartitionBytes
or parallelism. A multi-row-group file, by contrast, DOES split.

These tests pin both halves of that claim empirically, and then the
engine-level consequence: an index whose postings files carry multiple
row groups must fail ``_files_aligned()`` and take the grouped fallback,
producing results identical to an aligned index — while the zero-shuffle
kernel, if forced onto the misaligned layout, demonstrably loses phrase
matches (the silent-wrong-results hazard this predicate exists to stop).
"""
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from searcharray_spark.indexing import build_index, verify_single_row_group

PID_SCHEMA = StructType([
    StructField("pid", IntegerType()),
    StructField("n", LongType()),
])


def _pid_counts(spark, path):
    def kernel(it):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        n = 0
        for pdf in it:
            n += len(pdf)
        yield pd.DataFrame({"pid": [pid], "n": [n]})

    rows = spark.read.parquet(path).mapInPandas(kernel, PID_SCHEMA).collect()
    return sorted((r["pid"], r["n"]) for r in rows if r["n"] > 0)


@pytest.fixture()
def tiny_splits(spark):
    """Scan with an adversarially small split size (forces file splits)."""
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
    yield
    spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def _one_file_df(spark):
    return spark.range(0, 20000).select(
        F.col("id"), F.expr("repeat(uuid(), 2)").alias("payload"))


def test_single_row_group_file_never_splits(spark, tmp_path, tiny_splits):
    path = str(tmp_path / "single")
    _one_file_df(spark).coalesce(1).write \
        .option("parquet.block.size", str(2 << 30)).parquet(path)
    assert verify_single_row_group(path)
    nonempty = _pid_counts(spark, path)
    assert len(nonempty) == 1 and nonempty[0][1] == 20000


def test_multi_row_group_file_does_split(spark, tmp_path, tiny_splits):
    path = str(tmp_path / "multi")
    _one_file_df(spark).coalesce(1).write \
        .option("parquet.block.size", str(64 * 1024)).parquet(path)
    assert not verify_single_row_group(path)
    nonempty = _pid_counts(spark, path)
    assert len(nonempty) > 1  # the hazard is real
    assert sum(n for _, n in nonempty) == 20000


# --- engine-level consequence ---------------------------------------------

def _docs():
    """~1200 docs built so the query phrase terms sit at OPPOSITE ends of
    the within-file (term, block) sort — "aaa" first, "zzz" last — with
    megabytes of unique filler terms (m...) between them. Re-chunked into
    tiny row groups under a 64 KiB split size, the two terms' rows for
    the same doc block are then guaranteed to land in different scan
    partitions, realizing the silent-miss hazard."""
    out = []
    for i in range(1200):
        filler = " ".join(f"m{i}x{j}" for j in range(12))
        if i % 3 == 0:
            out.append(f"aaa zzz {filler}")         # phrase match
        elif i % 3 == 1:
            out.append(f"aaa {filler} zzz")          # both terms, no match
        else:
            out.append(f"zzz aaa zzz aaa zzz {filler}")  # two matches
    return out


DOCS = _docs()


def _build(spark, path):
    pdf = pd.DataFrame({"doc_id": range(len(DOCS)), "text": DOCS})
    return build_index(spark, spark.createDataFrame(pdf), path,
                       doc_id_col="doc_id", docs_per_block=64)


def _rechunk_postings(path, rows_per_group=7):
    """Rewrite every postings file with many tiny row groups, simulating
    a build whose data out-compressed parquet.block.size."""
    import pyarrow.parquet as pq
    root = os.path.join(path, "postings")
    for dirpath, _, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            if f.endswith(".crc"):  # stale hadoop checksums after rewrite
                os.remove(p)
            elif f.endswith(".parquet"):
                tbl = pq.read_table(p)
                pq.write_table(tbl, p, row_group_size=rows_per_group)


def _phrase_rows(idx, phrase):
    return sorted(
        (r["doc_id"], r["tf"])
        for r in idx.termfreqs(phrase).collect() if r["tf"] > 0)


def test_misaligned_index_falls_back_and_stays_correct(spark, tmp_path,
                                                       tiny_splits):
    from searcharray_spark.index import SearchIndex

    good = _build(spark, str(tmp_path / "good"))
    assert good.meta["postings_single_row_group"] is True
    assert good._files_aligned() is True
    truth = _phrase_rows(good, ["aaa", "zzz"])
    assert truth  # phrase present

    bad_path = str(tmp_path / "bad")
    _build(spark, bad_path)
    _rechunk_postings(bad_path)
    # simulate a pre-v4 index: no recorded flag -> footer verification
    import json
    with open(os.path.join(bad_path, "meta.json")) as fh:
        meta = json.load(fh)
    meta.pop("postings_single_row_group")
    with open(os.path.join(bad_path, "meta.json"), "w") as fh:
        json.dump(meta, fh)

    bad = SearchIndex(spark, bad_path)
    # the driver-local path reads whole files and is immune to row-group
    # misalignment; pin the distributed scan — IT is what's under test
    bad._local_ok = False
    assert bad._files_aligned() is False  # footer walk catches it
    assert _phrase_rows(bad, ["aaa", "zzz"]) == truth  # grouped fallback

    # negative control: force the zero-shuffle path onto the misaligned
    # layout — phrase matches silently vanish, proving the predicate is
    # load-bearing (not merely conservative)
    bad._aligned = True
    forced = _phrase_rows(bad, ["aaa", "zzz"])
    assert forced != truth


def test_recorded_false_flag_disables_zero_shuffle(spark, tmp_path):
    from searcharray_spark.index import SearchIndex

    path = str(tmp_path / "flagged")
    _build(spark, path)
    import json
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    meta["postings_single_row_group"] = False
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    idx = SearchIndex(spark, path)
    assert idx._files_aligned() is False


def test_search_or_fallback_on_misaligned_single_terms(spark, tmp_path,
                                                       tiny_splits):
    """Kernel-side OR-combine requires whole-block scan partitions; a
    misaligned index must take the per-token-rows + groupBy fallback
    (_hits_or combined=False) and produce identical OR results."""
    from searcharray_spark.index import SearchIndex

    good = _build(spark, str(tmp_path / "og"))
    _, combined = good._hits_or([["aaa"], ["zzz"]])
    assert combined is True
    truth = sorted(
        (r["doc_id"], r["n_matches"], round(float(r["score"]), 4))
        for r in good.search_or(["aaa", "zzz"], mm=1).collect())

    bad_path = str(tmp_path / "ob")
    _build(spark, bad_path)
    _rechunk_postings(bad_path)
    import json
    with open(os.path.join(bad_path, "meta.json")) as fh:
        meta = json.load(fh)
    meta.pop("postings_single_row_group")
    with open(os.path.join(bad_path, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    bad = SearchIndex(spark, bad_path)
    _, combined = bad._hits_or([["aaa"], ["zzz"]])
    assert combined is False  # single terms + unaligned -> fallback
    got = sorted(
        (r["doc_id"], r["n_matches"], round(float(r["score"]), 4))
        for r in bad.search_or(["aaa", "zzz"], mm=1).collect())
    assert got == truth
