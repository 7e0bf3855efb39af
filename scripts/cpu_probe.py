"""Guest-wide CPU accounting around one index build — the measurement
behind BENCH.md's scaling-efficiency decomposition.

Samples /proc/<pid>/stat utime+stime for every guest process before and
after a timed 4M-doc build, giving (wall, cpu_seconds, cpu/wall). Run at
two parallelism levels with the SAME layout partitions to separate
  - work efficiency        (cpu_small / cpu_large),
  - slot utilization       ((cpu/wall) / cpus at each level),
  - nominal-slot overshoot (local[2] uses >2 cores: un-pinned JVM
    GC/IO threads — a real cluster executor is cgroup-capped).

Usage: python scripts/cpu_probe.py <cpus> [n_docs] [layout_partitions]
Requires the corpus from scripts/bench_scaling.py (ensure_corpus).
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bench_scaling import CORPUS, ensure_corpus  # noqa: E402


def tree_cpu() -> float:
    total = 0.0
    tck = os.sysconf("SC_CLK_TCK")
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as fh:
                parts = fh.read().rsplit(") ", 1)[1].split()
            total += (int(parts[11]) + int(parts[12])) / tck
        except Exception:
            pass
    return total


def main():
    cpus = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    layout = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    ensure_corpus(n_docs)
    from pyspark.sql import functions as F

    from searcharray_spark import build_index
    from searcharray_spark.session import get_spark
    spark = get_spark(f"cpuprobe{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=layout)
    corpus = spark.read.parquet(CORPUS)
    build_index(spark, corpus.filter(F.col("doc_id") < 50000),
                "/tmp/cpu_probe_warm", doc_id_col="doc_id",
                docs_per_block=8192, term_partitions=layout)
    c0, t0 = tree_cpu(), time.time()
    shutil.rmtree("/tmp/cpu_probe_idx", ignore_errors=True)
    build_index(spark, corpus, "/tmp/cpu_probe_idx", doc_id_col="doc_id",
                docs_per_block=max(1024, n_docs // 128),
                term_partitions=layout)
    wall = time.time() - t0
    cpu = tree_cpu() - c0
    print(f'{{"cpus": {cpus}, "layout": {layout}, "n_docs": {n_docs}, '
          f'"wall_secs": {wall:.1f}, "cpu_secs": {cpu:.1f}, '
          f'"cpu_per_wall": {cpu / wall:.2f}}}')
    spark.stop()


if __name__ == "__main__":
    main()
