"""Benchmark: index build + BM25/phrase query throughput on the synthetic
documents table.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Env:
  SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    (default 32)  -> local[N]
  BENCH_REPEAT        (default 3)   query repetitions (best-of)

The reference query set mirrors the msmarco/tmdb benchmark lists
(/root/reference/test/test_msmarco.py:228, test_tmdb.py:180-191) mapped
onto the synthetic vocabulary: single terms, OR queries, and phrases of
length 2-5 including repeated-term phrases.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from searcharray_spark import build_index  # noqa: E402
from searcharray_spark.session import get_spark  # noqa: E402

# query set: analogous shapes to the reference's benchmark queries
BENCH_QUERIES = [
    ("term_spark", "spark"),
    ("term_query", "query"),
    ("or_spark_query_join", ["spark", "query", "join"]),  # handled as OR
    ("phrase2_table_hash", ["table", "hash"]),
    ("phrase2_part_filter", ["part", "filter"]),
    ("phrase3_slow_hash_batch", ["slow", "hash", "batch"]),
    ("phrase4_row_column_sort_scan", ["row", "column", "sort", "scan"]),
    ("phrase_same_term", ["the", "the"]),
    ("slop2_table_hash", ["table", "hash"]),  # proximity (slop=2) top-10
]


def run_bench(sf_dir: str, cpus: int, repeat: int = 3, index_root: str | None = None):
    spark = get_spark(f"bench_local{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, cpus))
    index_root = index_root or f"/tmp/sa_bench_idx_{cpus}"
    shutil.rmtree(index_root, ignore_errors=True)

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    # JIT warmup for the Arrow-collect path the small-build gate uses
    # (first toPandas in a fresh JVM pays ~2s of codegen; no build work
    # is reused — one row, discarded)
    docs.limit(1).toPandas()

    t0 = time.time()
    idx = build_index(spark, docs, index_root, doc_id_col="doc_id",
                      tokenizer="ws", docs_per_block=1 << 12,
                      term_partitions=max(8, cpus))
    build_secs = time.time() - t0

    idx.cache()
    q_times = {}
    for name, token in BENCH_QUERIES:
        best = float("inf")
        for _ in range(repeat):
            t0 = time.time()
            if name.startswith("or_"):
                # block-max MaxScore pruned top-k (rank-identical to
                # exhaustive search_or; tests/test_wand.py)
                rows = idx.top_k_pruned(token, k=10).collect()
            elif name.startswith("slop"):
                rows = idx.top_k(token, k=10, slop=2).collect()
            else:
                rows = idx.top_k(token, k=10).collect()
            best = min(best, time.time() - t0)
            _ = len(rows)
        q_times[name] = round(best, 4)

    # batched: all non-OR/non-slop queries in one kernel pass
    batch_tokens = [t for n, t in BENCH_QUERIES
                    if not n.startswith(("or_", "slop"))]
    idx.top_k_many(batch_tokens, k=10).collect()
    best_batch = float("inf")
    for _ in range(repeat):
        t0 = time.time()
        idx.top_k_many(batch_tokens, k=10).collect()
        best_batch = min(best_batch, time.time() - t0)

    total_query = sum(q_times.values())
    spark.stop()
    return {
        "n_docs": n_docs,
        "build_secs": round(build_secs, 3),
        "docs_per_sec": round(n_docs / build_secs, 1),
        "queries": q_times,
        "total_query_secs": round(total_query, 4),
        "queries_per_sec": round(len(q_times) / total_query, 3),
        "batch_query_secs": round(best_batch, 4),
        "batch_queries_per_sec": round(len(batch_tokens) / best_batch, 3),
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeat = int(os.environ.get("BENCH_REPEAT", "3"))
    res = run_bench(sf_dir, cpus, repeat)
    out = {
        "metric": "index_build_plus_bm25_topk",
        "value": round(res["build_secs"] + res["total_query_secs"], 3),
        "unit": "sec",
        "queries": res["queries"],
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "n_docs": res["n_docs"],
        "build_secs": res["build_secs"],
        "docs_per_sec": res["docs_per_sec"],
        "queries_per_sec": res["queries_per_sec"],
        "batch_queries_per_sec": res["batch_queries_per_sec"],
        "cpus": cpus,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
