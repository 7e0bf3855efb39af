"""Profile the build's post-stage phases at a given core count.

Runs each finalize job separately (then all four concurrently) against an
existing stage directory, plus the head metadata agg against the corpus,
to locate the non-scaling time in the 2-vs-8-core build comparison.

Usage: taskset -c 0,1 python scripts/profile_finalize.py 2 /tmp/sa_scaling_idx_2_1/stage
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main():
    cpus = int(sys.argv[1])
    stage_path = sys.argv[2]
    corpus_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sa_scaling_corpus"
    out_dir = f"/tmp/sa_prof_finalize_{cpus}"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)

    from searcharray_spark.session import get_spark
    from searcharray_spark.indexing import (
        write_postings_table, write_term_stats, bounds_granularity)
    import searcharray_spark.indexing as indexing
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import StructType, StructField, LongType, FloatType

    layout = int(os.environ.get("PROF_LAYOUT", "16"))
    spark = get_spark(f"prof_{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=layout)
    stage = spark.read.parquet(stage_path)
    corpus = spark.read.parquet(corpus_path)

    # warmup: touch both inputs, exercise python workers + JIT
    stage.filter(F.col("kind") == "p").limit(1000).count()
    corpus.limit(1000).count()

    timings = {}

    def timed(name, fn):
        t0 = time.time()
        r = fn()
        timings[name] = round(time.time() - t0, 2)
        print(f"  {name}: {timings[name]}s", flush=True)
        return r

    # head agg (runs before the stage job in build_index)
    timed("head_agg", lambda: corpus.agg(
        F.max("doc_id"), F.count(F.lit(1)),
        F.sum(F.octet_length("text"))).collect())

    granularity = bounds_granularity(4096)

    def _postings():
        write_postings_table(
            stage.filter(F.col("kind") == "p")
                 .select("term", "block_id", "postings", "df", "tf_total",
                         "tf_max", "dl_min"),
            os.path.join(out_dir, "postings"), layout)

    def _doclens():
        from searcharray_spark.indexing import PARQUET_ROW_GROUP_BYTES
        stage.filter(F.col("kind") == "d") \
            .select("block_id", "doc_ids", "doc_lens") \
            .repartitionByRange(layout, "block_id") \
            .sortWithinPartitions("block_id") \
            .write.mode("overwrite") \
            .option("parquet.block.size", str(PARQUET_ROW_GROUP_BYTES)) \
            .parquet(os.path.join(out_dir, "doclens"))

    def _term_stats():
        write_term_stats(stage.filter(F.col("kind") == "p"),
                         os.path.join(out_dir, "term_stats"),
                         layout, granularity)

    stats_schema = StructType([
        StructField("n", LongType()), StructField("s", FloatType()),
    ])

    def _block_stats(it):
        for pdf in it:
            for lens_raw in pdf["doc_lens"]:
                lens = np.frombuffer(lens_raw, dtype="<f4")
                yield pd.DataFrame({"n": [len(lens)], "s": [float(lens.sum())]})

    def _corpus_stats():
        stage.filter(F.col("kind") == "d") \
            .select("doc_lens").mapInPandas(_block_stats, stats_schema) \
            .agg(F.sum("n"), F.sum("s")).collect()

    # serial timings per job
    timed("postings_write", _postings)
    timed("doclens_write", _doclens)
    timed("term_stats_write", _term_stats)
    timed("corpus_stats", _corpus_stats)

    # concurrent (as build_index runs them)
    from concurrent.futures import ThreadPoolExecutor
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)

    def _all4():
        with ThreadPoolExecutor(4) as pool:
            futs = [pool.submit(f)
                    for f in (_postings, _doclens, _term_stats, _corpus_stats)]
            for f in futs:
                f.result()

    timed("all4_concurrent", _all4)
    timings["cpus"] = cpus
    print("PROF_RESULT " + json.dumps(timings))
    spark.stop()


if __name__ == "__main__":
    main()
