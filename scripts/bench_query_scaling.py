"""Query-throughput N-vs-4N scaling on a LARGE corpus.

The 4M-doc scaling run (bench_scaling.py) measures build scaling well,
but after the round-2 kernel/layout optimizations single-query latency
there is dominated by Spark's fixed per-job driver overhead (~0.3-0.5s),
which no amount of executors shrinks — the measured "query scaling" was
really overhead scaling. This runner evidences query THROUGHPUT scaling
the way the north rule intends: a corpus big enough that kernel work
dominates (default 16M docs ≈ 1B tokens), the SAME index served at
local[N] and local[4N] (index bytes are parallelism-independent; build
scaling is evidenced separately), measuring
  - serial latency per query (best of R), and
  - sustained qps with `cpus` queries in flight (saturation throughput).

Usage: python scripts/bench_query_scaling.py [n_docs] [out_json] [N] [4N]
       python scripts/bench_query_scaling.py --worker <cpus> <idx_path>
"""
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bench_scaling import QUERIES, ensure_corpus, CORPUS  # noqa: E402


def run_one(idx, name, token):
    if name.startswith("or_"):
        return idx.top_k_pruned(token, k=10).collect()
    if name.startswith("slop"):
        return idx.top_k(token, k=10, slop=2).collect()
    return idx.top_k(token, k=10).collect()


def worker(cpus: int, idx_path: str, repeat: int = 2):
    from concurrent.futures import ThreadPoolExecutor

    from searcharray_spark import SearchIndex
    from searcharray_spark.session import get_spark

    spark = get_spark(f"qscale_{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    idx = SearchIndex(spark, idx_path)
    idx.cache()
    run_one(idx, *QUERIES[0])  # JIT + broadcast warmup
    run_one(idx, "or_w", QUERIES[-2][1])

    q_times = {}
    for name, token in QUERIES:
        best = float("inf")
        for _ in range(repeat):
            t0 = time.time()
            run_one(idx, name, token)
            best = min(best, time.time() - t0)
        q_times[name] = round(best, 4)

    # sustained: FIXED offered concurrency at every level (default 4 in
    # flight) so the only variable between N and 4N is the core budget.
    # Scaling concurrency with cpus confounds the comparison: at 16M
    # docs a hot-term query streams ~0.5 GB, and 16 concurrent streams
    # memory-thrash a single-JVM local mode (measured: local[16] crawls
    # at ~3 cores, 36 GB resident) — a failure of the harness topology,
    # not of the engine's data-parallel scaling.
    work = [q for q in QUERIES for _ in range(2)]
    threads = int(os.environ.get("BENCH_INFLIGHT", "4"))
    with ThreadPoolExecutor(threads) as pool:  # warm
        list(pool.map(lambda q: run_one(idx, *q), work[:len(QUERIES)]))
    t0 = time.time()
    with ThreadPoolExecutor(threads) as pool:
        list(pool.map(lambda q: run_one(idx, *q), work))
    sustained = time.time() - t0
    out = {
        "cpus": cpus,
        "queries": q_times,
        "total_query_secs": round(sum(q_times.values()), 3),
        "sustained_secs": round(sustained, 3),
        "sustained_qps": round(len(work) / sustained, 3),
    }
    spark.stop()
    print("WORKER_RESULT " + json.dumps(out))


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3])
        return
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_query_scaling.json"
    small_n = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    large_n = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    idx_path = f"/tmp/sa_qscale_idx_{n_docs}"
    if not os.path.exists(os.path.join(idx_path, "meta.json")):
        # corpus only needed to (re)build the index; build in a
        # SUBPROCESS — a lingering unpinned build JVM in the bench
        # parent contaminates the timed windows (see bench_scaling.py)
        ensure_corpus(n_docs)
        shutil.rmtree(idx_path, ignore_errors=True)
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        # build with the engine's DATA-sized layout default (~64 MB
        # postings files): overriding term_partitions with the core
        # count produced 8 x 400 MB single-row-group files at 16M docs,
        # capping every query scan at 8 coarse tasks — a layout bug in
        # the harness, not the engine. Build core count is NOT part of
        # the serving protocol (index bytes are parallelism-independent;
        # build scaling is evidenced separately in bench_scaling.py), so
        # build at full width for wall-clock.
        build_cpus = int(os.environ.get(
            "BENCH_BUILD_CPUS", str(os.cpu_count() or 32)))
        code = (
            "import sys, time\n"
            "sys.path.insert(0, %r)\n"
            "from searcharray_spark import build_index\n"
            "from searcharray_spark.session import get_spark\n"
            "spark = get_spark('qscale_build', master='local[%d]',"
            " shuffle_partitions=%d)\n"
            "corpus = spark.read.parquet(%r)\n"
            "t0 = time.time()\n"
            "build_index(spark, corpus, %r, doc_id_col='doc_id',"
            " tokenizer='ws', docs_per_block=%d)\n"
            "print('built %d docs in %%.1fs' %% (time.time()-t0),"
            " file=sys.stderr)\n"
            "spark.stop()\n"
            % (root, build_cpus, build_cpus, CORPUS, idx_path,
               max(1024, n_docs // 128), n_docs))
        subprocess.run([sys.executable, "-c", code], check=True,
                       timeout=7200)

    # interleaved windows (see bench_scaling.py): neighbor CPU-steal
    # bursts on this VM last minutes; alternating levels and keeping the
    # best per level keeps one burst from sinking a whole level
    windows = int(os.environ.get("BENCH_WINDOWS", "2"))
    results = {}
    raw = {}

    def merge(a, b):
        if a is None:
            return b
        out = dict(a)
        out["queries"] = {k: min(a["queries"][k], b["queries"][k])
                          for k in a["queries"]}
        out["total_query_secs"] = round(sum(out["queries"].values()), 3)
        out["sustained_secs"] = min(a["sustained_secs"], b["sustained_secs"])
        out["sustained_qps"] = max(a["sustained_qps"], b["sustained_qps"])
        return out

    # HARD core budget per level, same rationale as bench_scaling.py:
    # un-pinned local[N] consumes >N cores (GC/IO threads), inflating the
    # small level and understating the N-vs-4N ratio
    pin = (os.environ.get("BENCH_PIN_CORES", "1") == "1"
           and shutil.which("taskset"))
    for w in range(windows):
        for cpus in (small_n, large_n):
            os.sync()
            time.sleep(15)
            cmd = [sys.executable, os.path.abspath(__file__), "--worker",
                   str(cpus), idx_path]
            if pin:
                cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
            proc = subprocess.run(
                cmd,
                capture_output=True, text=True, timeout=3600,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
            line = [ln for ln in proc.stdout.splitlines()
                    if ln.startswith("WORKER_RESULT ")]
            if not line:
                print(proc.stdout[-3000:], proc.stderr[-3000:])
                raise RuntimeError(f"worker {cpus} failed (window {w})")
            got = json.loads(line[-1][len("WORKER_RESULT "):])
            raw.setdefault(cpus, []).append(got)
            results[cpus] = merge(results.get(cpus), got)
            print(f"window {w} local[{cpus}]: total={got['total_query_secs']}s "
                  f"sustained_qps={got['sustained_qps']}", file=sys.stderr)
    small, large = results[small_n], results[large_n]
    factor = large_n / small_n
    result = {
        "n_docs": n_docs,
        # headline numbers are BEST-OF-N interleaved windows per level
        # (anti-CPU-steal protocol); every raw window is disclosed below
        "protocol": (f"best-of-{windows} interleaved windows"
                     + (", cores hard-pinned per level (taskset)" if pin
                        else "")),
        "pinned_cores": bool(pin),
        f"local{small_n}": small,
        f"local{large_n}": large,
        "windows_raw": {f"local{c}": v for c, v in raw.items()},
        "scaling_efficiency_query_sustained": round(
            (large["sustained_qps"] / small["sustained_qps"]) / factor, 3),
        "scaling_efficiency_query_serial": round(
            (small["total_query_secs"] / large["total_query_secs"]) / factor, 3),
    }
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
