"""Stage-phase layout sweep: wall + guest CPU for the build's one text
shuffle (repartition -> per-block builder -> parquet write) across
partition counts and pinned core budgets.

Separates two effects the full-build bench conflates:
  - does a wider stage layout cost more CPU (per-partition overhead)?
  - does a narrower one cost more wall at 8 cores (balls-in-bins skew:
    128 blocks hashed into 16 partitions -> ~1.6x heaviest task)?

Usage: python scripts/stage_sweep.py                 (driver, pins via taskset)
       python scripts/stage_sweep.py --worker C P    (internal)
"""
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bench_scaling import CORPUS  # noqa: E402
from scripts.cpu_probe import tree_cpu  # noqa: E402


def worker(cpus: int, parts: int):
    from pyspark.sql import functions as F

    from searcharray_spark.indexing import _make_block_builder, STAGE_SCHEMA
    from searcharray_spark.session import get_spark
    from searcharray_spark import tokenizers

    spark = get_spark(f"sweep_{cpus}_{parts}", master=f"local[{cpus}]",
                      shuffle_partitions=16)
    corpus = spark.read.parquet(CORPUS)
    dpb = 31250
    builder = _make_block_builder(tokenizers.resolve("ws"), dpb, False,
                                  131072, pretokenized=False)

    def staged(df, p):
        df = df.select(F.col("doc_id").cast("long"), F.col("text"))
        df = df.withColumn("block_id", F.floor(F.col("doc_id") / F.lit(dpb)))
        df = df.repartition(p, "block_id")
        return df.groupBy("block_id").applyInPandas(builder, STAGE_SCHEMA)

    out = "/tmp/stage_sweep_out"
    # warmup (JIT + python workers)
    shutil.rmtree(out, ignore_errors=True)
    staged(corpus.filter(F.col("doc_id") < 100000), parts) \
        .write.mode("overwrite").parquet(out)
    shutil.rmtree(out, ignore_errors=True)
    os.sync()
    time.sleep(3)
    c0, t0 = tree_cpu(), time.time()
    staged(corpus, parts).write.mode("overwrite").parquet(out)
    wall = time.time() - t0
    cpu = tree_cpu() - c0
    print("SWEEP_RESULT " + json.dumps({
        "cpus": cpus, "parts": parts, "wall": round(wall, 2),
        "cpu": round(cpu, 1), "util": round(cpu / wall / cpus, 3)}))
    spark.stop()


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
        return
    configs = [(2, 16), (8, 16), (2, 64), (8, 64), (8, 32), (8, 128)]
    results = []
    for cpus, parts in configs:
        os.sync()
        time.sleep(10)
        cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
               os.path.abspath(__file__), "--worker", str(cpus), str(parts)]
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=1800)
        lines = [ln for ln in proc.stdout.splitlines()
                 if ln.startswith("SWEEP_RESULT ")]
        if not lines:
            print(proc.stdout[-2000:], proc.stderr[-2000:])
            raise RuntimeError(f"worker {cpus},{parts} failed")
        got = json.loads(lines[-1][len("SWEEP_RESULT "):])
        results.append(got)
        print(json.dumps(got), file=sys.stderr)
    with open("/tmp/stage_sweep.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
