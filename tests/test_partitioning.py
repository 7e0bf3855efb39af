"""Pin the driver-side murmur3 against Spark's own F.hash, and prove
exact placement end-to-end through a real exchange."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from searcharray_spark.partitioning import (
    _spark_hash_long,
    exact_probes,
    placement_col,
    repartition_exact,
)


def test_hash_matches_spark(spark):
    vals = [0, 1, 2, 17, 63, 255, 2**31 - 1, 2**31, 2**40 + 123,
            2**63 - 1, 12345678901234]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["v"]: r["h"] for r in df.select("v", F.hash("v").alias("h")).collect()}
    for v in vals:
        assert _spark_hash_long(v) == got[v], v


@pytest.mark.parametrize("n", [1, 2, 7, 16, 32, 257])
def test_probes_cover_all_partitions(n):
    probes = exact_probes(n)
    assert len(probes) == n
    assert sorted(_spark_hash_long(p) % n for p in probes) == list(range(n))


def test_repartition_exact_placement(spark):
    """Every block lands in partition block_id % n — measured with
    spark_partition_id through a real exchange."""
    n = 8
    df = spark.range(0, 4000).select(
        F.col("id"), (F.col("id") % 37).alias("block_id"))
    out = repartition_exact(df, F.pmod(F.col("block_id"), F.lit(n)), n)
    rows = out.select("block_id",
                      F.spark_partition_id().alias("pid")).collect()
    for r in rows:
        assert r["pid"] == r["block_id"] % n, (r["block_id"], r["pid"])


def test_repartition_exact_contiguous_ranges(spark):
    """fid = block * n // total gives equal contiguous ranges with no
    two fids sharing a partition."""
    n, total = 4, 32
    df = spark.range(0, 3200).select((F.col("id") % total).alias("block_id"))
    fid = (F.col("block_id") * n / total).cast("long")
    out = repartition_exact(df, fid, n)
    rows = out.select("block_id", F.spark_partition_id().alias("pid")).collect()
    by_pid = {}
    for r in rows:
        by_pid.setdefault(r["pid"], set()).add(r["block_id"])
    assert len(by_pid) == n
    ranges = sorted(tuple(sorted(v)) for v in by_pid.values())
    assert ranges == [tuple(range(i * 8, i * 8 + 8)) for i in range(4)]


def test_placement_col_balanced():
    """Round-robin fids -> perfectly balanced bins (the balls-in-bins
    fix: 128 blocks into 16 raw-hash bins max ~13; via probes max 8)."""
    n = 16
    probes = exact_probes(n)
    bins = np.zeros(n, dtype=int)
    for block in range(128):
        bins[_spark_hash_long(probes[block % n]) % n] += 1
    assert bins.max() == 8 and bins.min() == 8
