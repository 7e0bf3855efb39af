"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship BM25 top-k on sf0.001;
``queries()``/``oracle_sql()`` expose one entry per implemented operator
(SURVEY.md §2 + training-data pipeline ops), verified against DuckDB.
"""
from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

# --- fixed query constants (shared by Spark queries and SQL oracles) ----
TERM = "spark"
OR_TERMS = ["spark", "query", "join"]
AND_TERMS = ["spark", "window", "batch"]
PHRASE2 = ["table", "hash"]
PHRASE3 = ["slow", "hash", "batch"]
K1, B = 1.2, 0.75

# DuckDB-side tokenizer, byte-equivalent to Python str.split()
_TOKS = r"list_filter(string_split_regex(text, '\s+'), x -> len(x)>0)"


def _r6(col):
    """Engine-portable 6-decimal rounding (textops._round6): the same
    double-op sequence in Spark and DuckDB, no half-ulp divergence."""
    return F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def _r6_sql(x: str) -> str:
    return f"floor(({x}) * 1e6 + 0.5) / 1e6"
_TOK_CTE = f"""
WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) - 1 AS posn FROM d)
"""

_INDEX_CACHE: dict = {}
_PKG_SHIPPED: set = set()


def _ensure_pkg_on_executors(spark: SparkSession) -> None:
    """Ship searcharray_spark to executor python workers via addPyFile —
    the kernel closures reference the package by module, so workers must
    be able to import it even if the session's JVM launched with a cwd /
    PYTHONPATH that doesn't include this repo."""
    key = id(spark.sparkContext)
    if key in _PKG_SHIPPED:
        return
    import tempfile
    import zipfile

    import searcharray_spark

    pkg_dir = os.path.dirname(os.path.abspath(searcharray_spark.__file__))
    zpath = os.path.join(tempfile.gettempdir(), "searcharray_spark_pkg.zip")
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for root, _, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        z.write(full, rel)
    spark.sparkContext.addPyFile(zpath)
    _PKG_SHIPPED.add(key)


def _index_for(spark: SparkSession, sf_dir: str):
    """Build (once) and cache the inverted index for a testdata dir."""
    from searcharray_spark import SearchIndex, build_index

    _ensure_pkg_on_executors(spark)

    key = os.path.abspath(sf_dir)
    if key in _INDEX_CACHE:
        return _INDEX_CACHE[key]
    cache_root = os.environ.get("SPARK_GRAFT_INDEX_CACHE", "/tmp/searcharray_spark_idx")
    idx_path = os.path.join(cache_root, key.strip("/").replace("/", "_") + "_v3")
    if os.path.exists(os.path.join(idx_path, "meta.json")):
        idx = SearchIndex(spark, idx_path)
    else:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        idx = build_index(spark, docs, idx_path, doc_id_col="doc_id",
                          tokenizer="ws", docs_per_block=1 << 14)
    _INDEX_CACHE[key] = idx
    return idx


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


# deterministic maintenance-delete predicate for the delete_then_* rows
DEL_MOD, DEL_REM = 7, 3


def _index_for_deleted(spark: SparkSession, sf_dir: str):
    """Build (once) an index over documents, then tombstone every doc
    with doc_id % DEL_MOD == DEL_REM via the public delete_docs API —
    the maintenance plane (reference P8) exercised through the driver
    gate. A marker file makes the build+delete idempotent across runs."""
    from searcharray_spark import SearchIndex, build_index

    _ensure_pkg_on_executors(spark)
    key = ("deleted", os.path.abspath(sf_dir))
    if key in _INDEX_CACHE:
        return _INDEX_CACHE[key]
    cache_root = os.environ.get("SPARK_GRAFT_INDEX_CACHE", "/tmp/searcharray_spark_idx")
    idx_path = os.path.join(
        cache_root, os.path.abspath(sf_dir).strip("/").replace("/", "_") + "_v3_del")
    marker = os.path.join(idx_path, "_delete_applied")
    if os.path.exists(os.path.join(idx_path, "meta.json")) and os.path.exists(marker):
        idx = SearchIndex(spark, idx_path)
    else:
        import shutil
        shutil.rmtree(idx_path, ignore_errors=True)
        docs = _docs(spark, sf_dir)
        idx = build_index(spark, docs, idx_path, doc_id_col="doc_id",
                          tokenizer="ws", docs_per_block=1 << 14)
        # bounded maintenance batch (the tombstone side-table path takes
        # over past TOMBSTONE_DRIVER_MAX_ROWS, so this collect is the
        # designed small-batch input shape)
        ids = [r[0] for r in docs.select("doc_id")
               .filter(F.col("doc_id") % DEL_MOD == DEL_REM).collect()]
        idx.delete_docs(ids)
        with open(marker, "w") as f:
            f.write("1")
    _INDEX_CACHE[key] = idx
    return idx


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 OR-query over the sf0.001 documents table."""
    return q_bm25_top10(spark, "/root/testdata/sf0.001")


# --- index-backed queries ----------------------------------------------

def q_term_freqs(spark, sf_dir):
    idx = _index_for(spark, sf_dir)
    return idx.termfreqs(TERM).select(
        "doc_id", F.col("tf").cast("long").alias("tf"))


def q_doc_freqs(spark, sf_dir):
    idx = _index_for(spark, sf_dir)
    return idx.term_stats.filter(F.col("term").isin(OR_TERMS + AND_TERMS)) \
        .select("term", F.col("df").cast("long").alias("df"))


def q_doc_lengths(spark, sf_dir):
    idx = _index_for(spark, sf_dir)
    return idx.doclengths().select(
        "doc_id", F.col("doc_len").cast("long").alias("doc_len"))


def q_corpus_stats(spark, sf_dir):
    idx = _index_for(spark, sf_dir)
    return idx.docstats.agg(
        F.count("*").cast("long").alias("num_docs"),
        _r6(F.avg("doc_len")).alias("avg_doc_len"))


def q_top_terms(spark, sf_dir):
    idx = _index_for(spark, sf_dir)
    return idx.term_stats \
        .select("term", F.col("df").cast("long").alias("df"),
                F.col("tf_total").cast("long").alias("tf_total")) \
        .orderBy(F.desc("df"), F.asc("term")).limit(20)


def q_bm25_top10(spark, sf_dir):
    """BM25 OR-query top-10, double-precision parity form.

    (The float32 reference-identical scorer is exercised by the pytest
    goldens; here both engines compute the same double expression so the
    DuckDB value-hash matches.)
    """
    idx = _index_for(spark, sf_dir)
    n = idx.num_docs
    avgdl_df = idx.docstats.agg(F.avg("doc_len").alias("a"))
    hits = idx.score_many(OR_TERMS)  # (token_idx, doc_id, tf, score)
    terms_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(OR_TERMS)], "token_idx int, term string")
    stats = idx.term_stats.filter(F.col("term").isin(OR_TERMS)).select("term", "df")
    hits = hits.join(F.broadcast(terms_df), "token_idx") \
        .join(F.broadcast(stats), "term") \
        .join(idx.docstats.select("doc_id", "doc_len"), "doc_id") \
        .crossJoin(F.broadcast(avgdl_df))
    idf = F.log(F.lit(1.0) + (F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tfd = F.col("tf").cast("double")
    dl = F.col("doc_len").cast("double")
    score = idf * tfd / (tfd + F.lit(K1) * (F.lit(1 - B) + F.lit(B) * dl / F.col("a")))
    return hits.groupBy("doc_id").agg(F.sum(score).alias("s")) \
        .select("doc_id", _r6(F.col("s")).alias("score")) \
        .orderBy(F.desc("s"), F.asc("doc_id")).limit(10)


def q_phrase_freqs_2(spark, sf_dir):
    idx = _index_for(spark, sf_dir)
    return idx.termfreqs(PHRASE2).select(
        "doc_id", F.col("tf").cast("long").alias("pf"))


def q_phrase_freqs_3(spark, sf_dir):
    idx = _index_for(spark, sf_dir)
    return idx.termfreqs(PHRASE3).select(
        "doc_id", F.col("tf").cast("long").alias("pf"))


def q_or_matches(spark, sf_dir):
    """Docs matching >= 2 of the OR terms with their distinct-term match
    count — exercises the kernel-side OR-combine path (per-doc token
    counts computed INSIDE the scan kernel, no groupBy exchange on
    aligned indexes). Integer columns, hash-exact vs the oracle."""
    idx = _index_for(spark, sf_dir)
    return idx.search_or(OR_TERMS, mm=2) \
        .select("doc_id", F.col("n_matches").cast("long").alias("n_matches")) \
        .orderBy("doc_id")


def q_and_search(spark, sf_dir):
    idx = _index_for(spark, sf_dir)
    hits = idx.score_many(AND_TERMS)
    return hits.groupBy("doc_id").agg(
        F.countDistinct("token_idx").alias("nm"),
        F.sum(F.col("tf").cast("long")).alias("sum_tf"),
    ).filter(F.col("nm") == len(AND_TERMS)).select("doc_id", "sum_tf")


def q_minmax_window_tf(spark, sf_dir):
    """tf of TERM restricted to positions 0..17 (first posn block)."""
    idx = _index_for(spark, sf_dir)
    return idx.termfreqs(TERM, min_posn=0, max_posn=17).select(
        "doc_id", F.col("tf").cast("long").alias("tf"))


def q_slop_matchset(spark, sf_dir):
    """Docs matching PHRASE2 with slop=1 (order-free window of width <= 2).

    The per-doc frequency is engine-defined (disjoint minimal windows),
    but the MATCH SET is SQL-expressible: exists two distinct positions
    of the two terms within width 2."""
    idx = _index_for(spark, sf_dir)
    return idx.termfreqs(PHRASE2, slop=1).select("doc_id").distinct()


EDISMAX_TIE = 0.25


def q_edismax_top10(spark, sf_dir):
    """Solr edismax, term-centric: two qf fields over the same index with
    boosts 1 and 2, tie=0.25, mm=2 — exercises dismax-across-fields, the
    tie breaker, and the mm filter. ``exact=True`` scores in double
    precision (JVM SQL over exact tfs) so the DuckDB oracle matches
    value-for-value; the float32 reference-identical path is covered by
    pytest goldens."""
    from searcharray_spark.solr import edismax
    idx = _index_for(spark, sf_dir)
    out = edismax({"text": idx, "text2": idx}, q=" ".join(OR_TERMS),
                  qf=["text", "text2^2"], mm="2", tie=EDISMAX_TIE, exact=True)
    return out.select("doc_id", _r6(F.col("score")).alias("score"), F.col("score").alias("_s")) \
        .orderBy(F.desc("_s"), F.asc("doc_id")).limit(10).drop("_s")


def q_positions(spark, sf_dir):
    idx = _index_for(spark, sf_dir)
    return idx.positions(TERM) \
        .select("doc_id", F.explode("posns").alias("p")) \
        .select("doc_id", F.col("p").cast("long").alias("posn"))


# deterministic in-place update: every doc_id % UPD_MOD == UPD_REM gets
# this replacement text (the oracle mirrors it with a CASE WHEN)
UPD_MOD, UPD_REM = 11, 5
UPD_TEXT = "spark spark updated table"


def _index_for_updated(spark: SparkSession, sf_dir: str):
    """Build (once) an index, then replace a deterministic doc subset via
    the public update_docs API (reference P8 __setitem__): old content is
    tombstoned, new content lands in an update segment that overrides the
    base rows at query time."""
    from searcharray_spark import SearchIndex, build_index

    _ensure_pkg_on_executors(spark)
    key = ("updated", os.path.abspath(sf_dir))
    if key in _INDEX_CACHE:
        return _INDEX_CACHE[key]
    cache_root = os.environ.get("SPARK_GRAFT_INDEX_CACHE", "/tmp/searcharray_spark_idx")
    idx_path = os.path.join(
        cache_root, os.path.abspath(sf_dir).strip("/").replace("/", "_") + "_v3_upd")
    marker = os.path.join(idx_path, "_update_applied")
    if os.path.exists(os.path.join(idx_path, "meta.json")) and os.path.exists(marker):
        idx = SearchIndex(spark, idx_path)
    else:
        import shutil
        shutil.rmtree(idx_path, ignore_errors=True)
        docs = _docs(spark, sf_dir)
        idx = build_index(spark, docs, idx_path, doc_id_col="doc_id",
                          tokenizer="ws", docs_per_block=1 << 14)
        upd = docs.filter(F.col("doc_id") % UPD_MOD == UPD_REM) \
            .select("doc_id", F.lit(UPD_TEXT).alias("text"))
        idx.update_docs(upd)
        with open(marker, "w") as f:
            f.write("1")
    _INDEX_CACHE[key] = idx
    return idx


def q_update_then_search(spark, sf_dir):
    """Per-doc tf of TERM AFTER an in-place update of a doc subset: the
    updated docs' old postings must be dead (tombstoned) and the update
    segment's postings must win — plus the patched corpus stats views
    (doc lengths) must reflect the new content."""
    idx = _index_for_updated(spark, sf_dir)
    tf = idx.termfreqs(TERM).select(
        "doc_id", F.col("tf").cast("long").alias("tf"))
    dl = idx.doclengths().select("doc_id", F.col("doc_len").cast("long").alias("doc_len"))
    return tf.join(dl, "doc_id").select("doc_id", "tf", "doc_len")


def q_delete_then_stats(spark, sf_dir):
    """Corpus stats AFTER a maintenance delete: delete_docs patches
    num_docs/total_tokens EXACTLY (stats_patch.json), so the handle
    scalars must hash-match a DuckDB recount over the surviving docs."""
    idx = _index_for_deleted(spark, sf_dir)
    return spark.createDataFrame(
        [(int(idx.num_docs), float(idx.total_tokens) / idx.num_docs)],
        "num_docs long, avg_raw double",
    ).select("num_docs", _r6(F.col("avg_raw")).alias("avg_doc_len"))


def q_delete_then_bm25(spark, sf_dir):
    """BM25 OR-query top-10 AFTER a maintenance delete (reference P8 →
    scoring): tombstoned docs are excluded inside the scan kernel, live
    df is derived from the surviving postings, and N/avgdl come from the
    exactly-patched handle stats + tombstone-filtered docstats view.
    Double-precision parity form as in bm25_top10."""
    idx = _index_for_deleted(spark, sf_dir)
    n = idx.num_docs
    avgdl_df = idx.docstats.agg(F.avg("doc_len").alias("a"))
    hits = idx.score_many(OR_TERMS)  # (token_idx, doc_id, tf) — live docs only
    dfs = hits.groupBy("token_idx").agg(F.count("*").alias("df"))
    hits = hits.join(F.broadcast(dfs), "token_idx") \
        .join(idx.docstats.select("doc_id", "doc_len"), "doc_id") \
        .crossJoin(F.broadcast(avgdl_df))
    idf = F.log(F.lit(1.0) + (F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tfd = F.col("tf").cast("double")
    dl = F.col("doc_len").cast("double")
    score = idf * tfd / (tfd + F.lit(K1) * (F.lit(1 - B) + F.lit(B) * dl / F.col("a")))
    return hits.groupBy("doc_id").agg(F.sum(score).alias("s")) \
        .select("doc_id", _r6(F.col("s")).alias("score")) \
        .orderBy(F.desc("s"), F.asc("doc_id")).limit(10)


def q_bm25_filtered_top10(spark, sf_dir):
    """Filtered-corpus scoring (reference P2 row-subset views): BM25
    OR-query top-10 over docs with lang='en' only. The doc filter is a
    packed-id semi-join INSIDE the scoring kernel (plus whole-block
    pruning); idf/avgdl/N stay corpus-global. Double-precision
    re-expression as in bm25_top10 so the oracle value-matches."""
    idx = _index_for(spark, sf_dir)
    cand = _docs(spark, sf_dir).filter(F.col("lang") == "en").select("doc_id")
    n = idx.num_docs
    avgdl_df = idx.docstats.agg(F.avg("doc_len").alias("a"))
    hits = idx.score_many(OR_TERMS, candidates=cand)
    terms_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(OR_TERMS)], "token_idx int, term string")
    stats = idx.term_stats.filter(F.col("term").isin(OR_TERMS)).select("term", "df")
    hits = hits.join(F.broadcast(terms_df), "token_idx") \
        .join(F.broadcast(stats), "term") \
        .join(idx.docstats.select("doc_id", "doc_len"), "doc_id") \
        .crossJoin(F.broadcast(avgdl_df))
    idf = F.log(F.lit(1.0) + (F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tfd = F.col("tf").cast("double")
    dl = F.col("doc_len").cast("double")
    score = idf * tfd / (tfd + F.lit(K1) * (F.lit(1 - B) + F.lit(B) * dl / F.col("a")))
    return hits.groupBy("doc_id").agg(F.sum(score).alias("s")) \
        .select("doc_id", _r6(F.col("s")).alias("score")) \
        .orderBy(F.desc("s"), F.asc("doc_id")).limit(10)


def q_term_freqs_pretokenized(spark, sf_dir):
    """Index built from a pre-tokenized array<string> column (reference
    S3, build_index_from_terms_list) — must match the text-built index
    value-for-value (same oracle as term_freqs)."""
    from searcharray_spark import SearchIndex, build_index

    _ensure_pkg_on_executors(spark)
    key = os.path.abspath(sf_dir)
    cache_root = os.environ.get("SPARK_GRAFT_INDEX_CACHE", "/tmp/searcharray_spark_idx")
    idx_path = os.path.join(cache_root, key.strip("/").replace("/", "_") + "_pretok_v2")
    if os.path.exists(os.path.join(idx_path, "meta.json")):
        idx = SearchIndex(spark, idx_path)
    else:
        docs = _docs(spark, sf_dir).select(
            "doc_id",
            F.filter(F.split(F.col("text"), r"\s+"),
                     lambda x: F.length(x) > 0).alias("tokens"))
        idx = build_index(spark, docs, idx_path, tokens_col="tokens",
                          doc_id_col="doc_id", docs_per_block=1 << 14)
    return idx.termfreqs(TERM).select(
        "doc_id", F.col("tf").cast("long").alias("tf"))


# --- text-pipeline operators -------------------------------------------

def q_token_stats(spark, sf_dir):
    from searcharray_spark.textops import token_stats
    return token_stats(_docs(spark, sf_dir))


def q_quality_score(spark, sf_dir):
    from searcharray_spark.textops import quality_score
    return quality_score(_docs(spark, sf_dir))


def q_lang_id(spark, sf_dir):
    from searcharray_spark.textops import lang_id
    return lang_id(_docs(spark, sf_dir))


def q_exact_dedup(spark, sf_dir):
    from searcharray_spark.textops import exact_dedup
    return exact_dedup(_docs(spark, sf_dir))


def q_ngram_jaccard(spark, sf_dir):
    from searcharray_spark.textops import ngram_jaccard_pairs
    return ngram_jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.2)


def q_minhash_neardup(spark, sf_dir):
    from searcharray_spark.textops import minhash_neardup_pairs
    return minhash_neardup_pairs(_docs(spark, sf_dir), threshold=0.2)


def q_simhash(spark, sf_dir):
    from searcharray_spark.textops import simhash
    return simhash(_docs(spark, sf_dir))


def q_fingerprint(spark, sf_dir):
    from searcharray_spark.textops import doc_fingerprint
    return doc_fingerprint(_docs(spark, sf_dir))


# --- similarity search --------------------------------------------------

def _query_vec(spark, sf_dir):
    row = _embs(spark, sf_dir).filter(F.col("vec_id") == 0).first()
    return list(row["embedding"])


def q_ann_cosine_top10(spark, sf_dir):
    from searcharray_spark.ann import cosine_topk
    return cosine_topk(_embs(spark, sf_dir), _query_vec(spark, sf_dir),
                       k=10, exclude_id=0)


LSH_PLANES = 4
LSH_PROBES = 2  # query bucket + the one lowest-margin bit flip


def q_ann_lsh_top10(spark, sf_dir):
    from searcharray_spark.ann import lsh_topk
    return lsh_topk(_embs(spark, sf_dir), _query_vec(spark, sf_dir),
                    k=10, n_planes=LSH_PLANES, n_probes=LSH_PROBES)


def q_embedding_neardup(spark, sf_dir):
    """LSH-bucketed near-dup pairs — the scale path (per-bucket join, no
    cross join); the oracle replicates the bucket condition exactly."""
    from searcharray_spark.ann import cosine_neardup_pairs
    return cosine_neardup_pairs(_embs(spark, sf_dir), threshold=0.3,
                                n_planes=LSH_PLANES)


# --- doc-major row surface (rows.py; reference P1/P3/P5/P7) --------------

def _bag_sig():
    """Canonical 'term:tf term:tf ...' signature of a doc's sorted bag —
    the portable stand-in for nested-struct hashing in the gate."""
    return F.array_join(
        F.transform("tfs", lambda e: F.concat_ws(":", e["term"], e["tf"])),
        " ")


def q_doc_term_matrix(spark, sf_dir):
    """Full doc-major (doc_id, term, tf) derivation (SURVEY A5 'derive
    on demand', reference doc->termset views)."""
    idx = _index_for(spark, sf_dir)
    return idx.doc_termfreqs().select("doc_id", "term", "tf")


ROW_VIEW_DOC = 7


def q_doc_row_view(spark, sf_dir):
    """One doc materialized as a Terms scalar (reference
    __getitem__(int), P1): tf + decoded positions per term."""
    idx = _index_for(spark, sf_dir)
    t = idx.doc(ROW_VIEW_DOC)
    rows = [(term, int(tf), ",".join(str(int(p)) for p in t.posns[term]))
            for term, tf in sorted(t.postings.items())]
    return spark.createDataFrame(rows, "term string, tf long, posns_sig string")


TAKE_IDS = [5, 3, 123456789, 10, 3]  # out-of-range id exercises the fill


def q_take_rows(spark, sf_dir):
    """take() with pandas fill semantics (reference take, P3): missing
    rows land as the empty Terms."""
    idx = _index_for(spark, sf_dir)
    got = idx.take(TAKE_IDS, allow_fill=True)
    rows = [(i, len(t), int(t.doc_len),
             " ".join(f"{k}:{v}" for k, v in sorted(t.postings.items())))
            for i, t in enumerate(got)]
    return spark.createDataFrame(
        rows, "ord long, n_terms long, doc_len long, sig string")


def q_value_counts(spark, sf_dir):
    """Docs grouped by identical (bag, doc_len) (reference value_counts,
    P7)."""
    idx = _index_for(spark, sf_dir)
    return idx.value_counts().select(
        _bag_sig().alias("sig"), "doc_len",
        F.col("count").cast("long").alias("cnt"))


def q_snapshot_read(spark, sf_dir):
    """Iceberg-style time travel: a read-only handle opened as of epoch 0
    (as-built) on an index that was LATER mass-deleted must serve the
    ORIGINAL corpus exactly — per-doc tf over the full match set AND the
    historical corpus stats (epoch-stamped stats log)."""
    from searcharray_spark import SearchIndex
    idx_del = _index_for_deleted(spark, sf_dir)  # ensures deletes exist
    snap = SearchIndex(spark, idx_del.path, as_of=0)
    tf = snap.termfreqs(TERM).select(
        "doc_id", F.col("tf").cast("long").alias("tf"))
    stats = spark.createDataFrame(
        [(int(snap.num_docs), float(snap.total_tokens) / snap.num_docs)],
        "num_docs long, avg_raw double").select(
        "num_docs", _r6(F.col("avg_raw")).alias("avg_doc_len"))
    return tf.crossJoin(F.broadcast(stats))


def q_rowwise_eq(spark, sf_dir):
    """Elementwise doc equality (reference __eq__, P5): the base index
    vs the in-place-updated one — eq must flip exactly where update_docs
    replaced content."""
    base = _index_for(spark, sf_dir)
    upd = _index_for_updated(spark, sf_dir)
    return base.rowwise_eq(upd).select("doc_id", "eq")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "term_freqs": q_term_freqs,
        "doc_freqs": q_doc_freqs,
        "doc_lengths": q_doc_lengths,
        "corpus_stats": q_corpus_stats,
        "top_terms": q_top_terms,
        "bm25_top10": q_bm25_top10,
        "bm25_filtered_top10": q_bm25_filtered_top10,
        "delete_then_stats": q_delete_then_stats,
        "update_then_search": q_update_then_search,
        "delete_then_bm25": q_delete_then_bm25,
        "term_freqs_pretokenized": q_term_freqs_pretokenized,
        "phrase_freqs_2": q_phrase_freqs_2,
        "phrase_freqs_3": q_phrase_freqs_3,
        "and_search": q_and_search,
        "or_matches": q_or_matches,
        "slop_matchset": q_slop_matchset,
        "edismax_top10": q_edismax_top10,
        "minmax_window_tf": q_minmax_window_tf,
        "positions": q_positions,
        "doc_term_matrix": q_doc_term_matrix,
        "doc_row_view": q_doc_row_view,
        "take_rows": q_take_rows,
        "value_counts": q_value_counts,
        "rowwise_eq": q_rowwise_eq,
        "snapshot_read": q_snapshot_read,
        "token_stats": q_token_stats,
        "quality_score": q_quality_score,
        "lang_id": q_lang_id,
        "exact_dedup": q_exact_dedup,
        "ngram_jaccard": q_ngram_jaccard,
        "minhash_neardup": q_minhash_neardup,
        "simhash": q_simhash,
        "fingerprint": q_fingerprint,
        "ann_cosine_top10": q_ann_cosine_top10,
        "ann_lsh_top10": q_ann_lsh_top10,
        "embedding_neardup": q_embedding_neardup,
    }


# --- oracle SQL builders for hash/LSH-based ops --------------------------
# hash60 (searcharray_spark.textops.hash60) rendered in DuckDB SQL
def _h60(x: str) -> str:
    return f"CAST(('0x' || substring(md5({x}),1,15)) AS BIGINT)"


# word-3-gram shingles in DuckDB (mirrors textops.shingles_col(n=3))
_SHINGLE3 = """CASE WHEN len(toks) >= 3 THEN
      list_transform(generate_series(1, len(toks) - 2),
                     i -> array_to_string(toks[i:i+2], ' '))
      ELSE [array_to_string(toks, ' ')] END"""


def _simhash_oracle() -> str:
    from searcharray_spark.textops import SIMHASH_BITS
    votes = ",\n                   ".join(
        f"sum((h >> {i}) & 1) AS v{i}" for i in range(SIMHASH_BITS))
    bits = " + ".join(f"(CASE WHEN 2 * v{i} > n THEN {1 << i} ELSE 0 END)"
                      for i in range(SIMHASH_BITS))
    return f"""
        WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        tok AS (SELECT doc_id, unnest(toks) AS term FROM d),
        h AS (SELECT doc_id, {_h60('term')} AS h FROM tok),
        v AS (SELECT doc_id, count(*) AS n,
                   {votes}
              FROM h GROUP BY doc_id)
        SELECT d2.doc_id, coalesce(CAST(({bits}) AS BIGINT), 0) AS simhash
        FROM (SELECT doc_id FROM documents) d2 LEFT JOIN v USING (doc_id)"""


def _minhash_oracle(threshold: float) -> str:
    from searcharray_spark.textops import _minhash_perm_specs
    a, b, p = _minhash_perm_specs(64)
    mins = ",\n                     ".join(
        f"min((hm * {int(a[i])} + {int(b[i])}) % {int(p)}) AS m{i}"
        for i in range(64))
    eq = " + ".join(f"(CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END)"
                    for i in range(64))
    bands = " OR ".join(
        "(" + " AND ".join(f"a.m{j} = b.m{j}" for j in range(bd * 4, bd * 4 + 4)) + ")"
        for bd in range(16))
    return f"""
        WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        sh AS (SELECT doc_id AS id, unnest(list_distinct({_SHINGLE3})) AS shingle
               FROM d),
        h AS (SELECT id, {_h60('shingle')} % {int(p)} AS hm FROM sh),
        sig AS (SELECT id, {mins}
                FROM h GROUP BY id),
        pairs AS (SELECT a.id AS id_a, b.id AS id_b, ({eq}) AS n_eq,
                         ({bands}) AS collide
                  FROM sig a JOIN sig b ON a.id < b.id)
        SELECT id_a, id_b, floor((n_eq / 64.0) * 1e6 + 0.5) / 1e6 AS est_jaccard
        FROM pairs WHERE collide AND n_eq / 64.0 >= {threshold}"""


def _plane_sql_arrays():
    from searcharray_spark.ann import _hyperplanes
    planes = _hyperplanes(64, LSH_PLANES, 13)
    return ["[" + ", ".join(repr(float(x)) for x in planes[i]) + "]"
            for i in range(LSH_PLANES)]


def _ann_lsh_oracle() -> str:
    """Single-bit multi-probe (LSH_PROBES=2): candidates match the query
    bucket exactly OR differ in exactly one sign bit — the one whose
    |dot| margin is smallest (what lsh_probe_buckets flips)."""
    ps = _plane_sql_arrays()
    s_cols = ",\n               ".join(
        f"(list_dot_product(CAST(embedding AS DOUBLE[]), {ps[i]}) >= 0) AS s{i}"
        for i in range(LSH_PLANES))
    qd = ",\n              ".join(
        f"list_dot_product(CAST(embedding AS DOUBLE[]), {ps[i]}) AS d{i}"
        for i in range(LSH_PLANES))
    mism = " + ".join(f"(CASE WHEN b.s{i} <> (q.d{i} >= 0) THEN 1 ELSE 0 END)"
                      for i in range(LSH_PLANES))
    mism_margin = "CASE " + " ".join(
        f"WHEN b.s{i} <> (q.d{i} >= 0) THEN abs(q.d{i})"
        for i in range(LSH_PLANES)) + " END"
    min_margin = "least(" + ", ".join(f"abs(q.d{i})" for i in range(LSH_PLANES)) + ")"
    return f"""
        WITH b AS (SELECT vec_id, embedding,
               {s_cols}
               FROM embeddings),
        q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv,
              {qd}
              FROM embeddings WHERE vec_id = 0)
        SELECT b.vec_id,
               floor(list_cosine_similarity(CAST(b.embedding AS DOUBLE[]), q.qv) * 1e6 + 0.5) / 1e6 AS cosine
        FROM b, q
        WHERE ({mism}) = 0 OR (({mism}) = 1 AND {mism_margin} = {min_margin})
        ORDER BY list_cosine_similarity(CAST(b.embedding AS DOUBLE[]), q.qv) DESC,
                 b.vec_id ASC
        LIMIT 10"""


def _embedding_neardup_oracle(threshold: float) -> str:
    ps = _plane_sql_arrays()
    s_cols = ",\n               ".join(
        f"(list_dot_product(CAST(embedding AS DOUBLE[]), {ps[i]}) >= 0) AS s{i}"
        for i in range(LSH_PLANES))
    same_bucket = " AND ".join(f"a.s{i} = b.s{i}" for i in range(LSH_PLANES))
    cos = ("list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
           "CAST(b.embedding AS DOUBLE[]))")
    return f"""
        WITH bk AS (SELECT vec_id, embedding,
               {s_cols}
               FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, floor({cos} * 1e6 + 0.5) / 1e6 AS cosine
        FROM bk a JOIN bk b ON a.vec_id < b.vec_id AND {same_bucket}
        WHERE floor({cos} * 1e6 + 0.5) / 1e6 >= {threshold}"""


def _edismax_oracle() -> str:
    or_in = ", ".join(f"'{t}'" for t in OR_TERMS)
    # term_score mirrors the Spark op tree: boosts 1.0 / 2.0 over the same
    # per-term BM25 s, dismax + tie, mm=2
    ts = ("greatest(sc * 1.0, sc * 2.0) + ((sc * 1.0 + sc * 2.0) "
          f"- greatest(sc * 1.0, sc * 2.0)) * {EDISMAX_TIE}")
    return _TOK_CTE + f""",
        dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
        stats AS (SELECT (SELECT count(*) FROM documents) AS n,
                         (SELECT avg(len({_TOKS})) FROM documents) AS avgdl),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
               WHERE term IN ({or_in}) GROUP BY doc_id, term),
        df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
               WHERE term IN ({or_in}) GROUP BY term),
        s AS (SELECT tf.doc_id,
                     ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl)) AS sc
              FROM tf JOIN df USING (term) JOIN dl ON tf.doc_id = dl.doc_id
              CROSS JOIN stats),
        t AS (SELECT doc_id, {ts} AS ts FROM s)
        SELECT doc_id, floor(sum(ts) * 1e6 + 0.5) / 1e6 AS score
        FROM t GROUP BY doc_id HAVING count(*) >= 2
        ORDER BY sum(ts) DESC, doc_id ASC LIMIT 10"""


def oracle_sql() -> dict[str, str]:
    terms_in = ", ".join(f"'{t}'" for t in sorted(set(OR_TERMS + AND_TERMS)))
    or_in = ", ".join(f"'{t}'" for t in OR_TERMS)
    and_in = ", ".join(f"'{t}'" for t in AND_TERMS)
    stop_in = ", ".join(
        f"'{s}'" for s in __import__("searcharray_spark.textops", fromlist=["EN_STOPWORDS"]).EN_STOPWORDS)
    return {
        "term_freqs": _TOK_CTE + f"""
            SELECT doc_id, count(*)::BIGINT AS tf FROM tok
            WHERE term = '{TERM}' GROUP BY doc_id""",
        "doc_freqs": _TOK_CTE + f"""
            SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok
            WHERE term IN ({terms_in}) GROUP BY term""",
        "doc_lengths": f"""
            SELECT doc_id, len({_TOKS})::BIGINT AS doc_len FROM documents""",
        "corpus_stats": f"""
            SELECT count(*)::BIGINT AS num_docs,
                   floor(avg(len({_TOKS})) * 1e6 + 0.5) / 1e6 AS avg_doc_len FROM documents""",
        "top_terms": _TOK_CTE + """
            SELECT term, count(DISTINCT doc_id)::BIGINT AS df,
                   count(*)::BIGINT AS tf_total
            FROM tok GROUP BY term ORDER BY df DESC, term ASC LIMIT 20""",
        "bm25_top10": _TOK_CTE + f""",
            dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
            stats AS (SELECT (SELECT count(*) FROM documents) AS n,
                             (SELECT avg(len({_TOKS})) FROM documents) AS avgdl),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
                   WHERE term IN ({or_in}) GROUP BY doc_id, term),
            df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
                   WHERE term IN ({or_in}) GROUP BY term)
            SELECT tf.doc_id,
                   floor(sum(ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                         * tf.tf / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl))) * 1e6 + 0.5) / 1e6 AS score
            FROM tf JOIN df USING (term) JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN stats
            GROUP BY tf.doc_id
            ORDER BY sum(ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl))) DESC,
                     tf.doc_id ASC LIMIT 10""",
        # same stats CTEs as bm25_top10; only the scored doc set is
        # restricted (global idf/avgdl/N — standard filter semantics)
        "bm25_filtered_top10": _TOK_CTE + f""",
            dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
            stats AS (SELECT (SELECT count(*) FROM documents) AS n,
                             (SELECT avg(len({_TOKS})) FROM documents) AS avgdl),
            tf AS (SELECT t.doc_id, t.term, count(*) AS tf FROM tok t
                   JOIN documents dd ON t.doc_id = dd.doc_id AND dd.lang = 'en'
                   WHERE t.term IN ({or_in}) GROUP BY t.doc_id, t.term),
            df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
                   WHERE term IN ({or_in}) GROUP BY term)
            SELECT tf.doc_id,
                   floor(sum(ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                         * tf.tf / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl))) * 1e6 + 0.5) / 1e6 AS score
            FROM tf JOIN df USING (term) JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN stats
            GROUP BY tf.doc_id
            ORDER BY sum(ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl))) DESC,
                     tf.doc_id ASC LIMIT 10""",
        "update_then_search": f"""
            WITH dd AS (SELECT doc_id,
                        CASE WHEN doc_id % {UPD_MOD} = {UPD_REM}
                             THEN '{UPD_TEXT}' ELSE text END AS text
                        FROM documents),
            d AS (SELECT doc_id, {_TOKS} AS toks FROM dd),
            tok AS (SELECT doc_id, unnest(toks) AS term FROM d),
            dl AS (SELECT doc_id, len(toks)::BIGINT AS doc_len FROM d)
            SELECT tok.doc_id, count(*)::BIGINT AS tf, any_value(dl.doc_len) AS doc_len
            FROM tok JOIN dl ON tok.doc_id = dl.doc_id
            WHERE term = '{TERM}' GROUP BY tok.doc_id""",
        "delete_then_stats": f"""
            SELECT count(*)::BIGINT AS num_docs,
                   floor(avg(len({_TOKS})) * 1e6 + 0.5) / 1e6 AS avg_doc_len
            FROM documents WHERE doc_id % {DEL_MOD} <> {DEL_REM}""",
        # bm25_top10 with the deleted docs removed from EVERY view
        # (match set, df, N, avgdl) — the semantics delete_docs promises
        "delete_then_bm25": f"""
            WITH dd AS (SELECT doc_id, text FROM documents
                        WHERE doc_id % {DEL_MOD} <> {DEL_REM}),
            d AS (SELECT doc_id, {_TOKS} AS toks FROM dd),
            tok AS (SELECT doc_id, unnest(toks) AS term FROM d),
            dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
            stats AS (SELECT (SELECT count(*) FROM dd) AS n,
                             (SELECT avg(len({_TOKS})) FROM dd) AS avgdl),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
                   WHERE term IN ({or_in}) GROUP BY doc_id, term),
            df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
                   WHERE term IN ({or_in}) GROUP BY term)
            SELECT tf.doc_id,
                   floor(sum(ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                         * tf.tf / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl))) * 1e6 + 0.5) / 1e6 AS score
            FROM tf JOIN df USING (term) JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN stats
            GROUP BY tf.doc_id
            ORDER BY sum(ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl))) DESC,
                     tf.doc_id ASC LIMIT 10""",
        "term_freqs_pretokenized": _TOK_CTE + f"""
            SELECT doc_id, count(*)::BIGINT AS tf FROM tok
            WHERE term = '{TERM}' GROUP BY doc_id""",
        "phrase_freqs_2": _TOK_CTE + f"""
            SELECT a.doc_id, count(*)::BIGINT AS pf
            FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.posn = a.posn + 1
            WHERE a.term = '{PHRASE2[0]}' AND b.term = '{PHRASE2[1]}'
            GROUP BY a.doc_id""",
        "phrase_freqs_3": _TOK_CTE + f"""
            SELECT a.doc_id, count(*)::BIGINT AS pf
            FROM tok a
            JOIN tok b ON a.doc_id = b.doc_id AND b.posn = a.posn + 1
            JOIN tok c ON a.doc_id = c.doc_id AND c.posn = a.posn + 2
            WHERE a.term = '{PHRASE3[0]}' AND b.term = '{PHRASE3[1]}'
              AND c.term = '{PHRASE3[2]}'
            GROUP BY a.doc_id""",
        "and_search": _TOK_CTE + f"""
            SELECT doc_id, sum(cnt)::BIGINT AS sum_tf FROM (
              SELECT doc_id, term, count(*) AS cnt FROM tok
              WHERE term IN ({and_in}) GROUP BY doc_id, term)
            GROUP BY doc_id HAVING count(DISTINCT term) = {len(AND_TERMS)}""",
        "or_matches": _TOK_CTE + f"""
            SELECT doc_id, count(DISTINCT term)::BIGINT AS n_matches
            FROM tok WHERE term IN ({or_in})
            GROUP BY doc_id HAVING count(DISTINCT term) >= 2
            ORDER BY doc_id""",
        "slop_matchset": _TOK_CTE + f"""
            SELECT DISTINCT a.doc_id FROM tok a
            JOIN tok b ON a.doc_id = b.doc_id AND a.posn <> b.posn
            WHERE a.term = '{PHRASE2[0]}' AND b.term = '{PHRASE2[1]}'
              AND abs(a.posn - b.posn) <= 2""",
        "minmax_window_tf": _TOK_CTE + f"""
            SELECT doc_id, count(*)::BIGINT AS tf FROM tok
            WHERE term = '{TERM}' AND posn BETWEEN 0 AND 17 GROUP BY doc_id""",
        "positions": _TOK_CTE + f"""
            SELECT doc_id, posn::BIGINT AS posn FROM tok WHERE term = '{TERM}'""",
        "doc_term_matrix": _TOK_CTE + """
            SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok
            GROUP BY doc_id, term""",
        "doc_row_view": _TOK_CTE + f"""
            SELECT term, count(*)::BIGINT AS tf,
                   string_agg(posn::VARCHAR, ',' ORDER BY posn) AS posns_sig
            FROM tok WHERE doc_id = {ROW_VIEW_DOC} GROUP BY term""",
        "take_rows": _TOK_CTE + f""",
            cnt AS (SELECT doc_id, term, count(*) AS tf FROM tok
                    GROUP BY doc_id, term),
            bag AS (SELECT doc_id, count(*)::BIGINT AS n_terms,
                           sum(tf)::BIGINT AS doc_len,
                           string_agg(term || ':' || tf, ' ' ORDER BY term) AS sig
                    FROM cnt GROUP BY doc_id),
            want(ord, doc_id) AS (VALUES {", ".join(f"({i}, {d})" for i, d in enumerate(TAKE_IDS))})
            SELECT want.ord::BIGINT AS ord,
                   coalesce(bag.n_terms, 0)::BIGINT AS n_terms,
                   coalesce(bag.doc_len, 0)::BIGINT AS doc_len,
                   coalesce(bag.sig, '') AS sig
            FROM want LEFT JOIN bag USING (doc_id)""",
        # dropna mirror: the empty doc (no tokens AND doc_len 0) is
        # dropped, reference value_counts' counts.pop(Terms({}))
        "value_counts": _TOK_CTE + """,
            cnt AS (SELECT doc_id, term, count(*) AS tf FROM tok
                    GROUP BY doc_id, term),
            bag AS (SELECT d.doc_id,
                           coalesce(string_agg(term || ':' || tf, ' ' ORDER BY term), '') AS sig,
                           coalesce(sum(tf), 0)::BIGINT AS doc_len
                    FROM d LEFT JOIN cnt ON d.doc_id = cnt.doc_id
                    GROUP BY d.doc_id)
            SELECT sig, doc_len, count(*)::BIGINT AS cnt FROM bag
            WHERE NOT (sig = '' AND doc_len = 0)
            GROUP BY sig, doc_len""",
        # the as-built snapshot of a later-deleted index == the plain
        # original corpus (match set + historical stats)
        "snapshot_read": _TOK_CTE + f""",
            tf AS (SELECT doc_id, count(*)::BIGINT AS tf FROM tok
                   WHERE term = '{TERM}' GROUP BY doc_id),
            stats AS (SELECT count(*)::BIGINT AS num_docs,
                             floor(avg(len({_TOKS})) * 1e6 + 0.5) / 1e6 AS avg_doc_len
                      FROM documents)
            SELECT doc_id, tf, num_docs, avg_doc_len
            FROM tf CROSS JOIN stats""",
        # per-doc bag equality of original vs updated corpus — exactly
        # what rowwise_eq(base, updated) must report
        "rowwise_eq": f"""
            WITH u AS (SELECT doc_id,
                       CASE WHEN doc_id % {UPD_MOD} = {UPD_REM}
                            THEN '{UPD_TEXT}' ELSE text END AS text
                       FROM documents),
            a_cnt AS (SELECT doc_id, term, count(*) AS tf
                      FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
                      GROUP BY doc_id, term),
            b_cnt AS (SELECT doc_id, term, count(*) AS tf
                      FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM u)
                      GROUP BY doc_id, term),
            a_bag AS (SELECT doc_id,
                             coalesce(string_agg(term || ':' || tf, ' ' ORDER BY term), '') AS sig,
                             coalesce(sum(tf), 0) AS dl
                      FROM documents LEFT JOIN a_cnt USING (doc_id) GROUP BY doc_id),
            b_bag AS (SELECT doc_id,
                             coalesce(string_agg(term || ':' || tf, ' ' ORDER BY term), '') AS sig,
                             coalesce(sum(tf), 0) AS dl
                      FROM u LEFT JOIN b_cnt USING (doc_id) GROUP BY doc_id)
            SELECT doc_id, (a_bag.sig = b_bag.sig AND a_bag.dl = b_bag.dl) AS eq
            FROM a_bag JOIN b_bag USING (doc_id)""",
        "token_stats": f"""
            WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
            SELECT doc_id, len(toks)::BIGINT AS n_tokens,
                   len(list_distinct(toks))::BIGINT AS n_unique,
                   floor((CASE WHEN len(toks) > 0
                         THEN list_sum(list_transform(toks, x -> len(x)))::DOUBLE / len(toks)
                         ELSE 0.0 END) * 1e6 + 0.5) / 1e6 AS avg_token_len
            FROM d""",
        # rounding: floor(x*1e6 + 0.5)/1e6 — identical double-op sequence to
        # the Spark expression (textops._round6), so no half-ulp divergence
        "quality_score": f"""
            WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            s AS (SELECT doc_id, len(toks) AS n,
                         len(list_distinct(toks)) AS nu,
                         len(list_filter(toks, x -> x IN ({stop_in}))) AS ns
                  FROM d),
            r AS (SELECT doc_id, n,
                         CASE WHEN n > 0 THEN nu::DOUBLE / n ELSE 0.0 END AS ur,
                         CASE WHEN n > 0 THEN ns::DOUBLE / n ELSE 0.0 END AS sr
                  FROM s)
            SELECT doc_id, n::BIGINT AS n_tokens,
                   floor(ur * 1e6 + 0.5) / 1e6 AS unique_ratio,
                   floor(sr * 1e6 + 0.5) / 1e6 AS stopword_ratio,
                   floor((least(1.0, n / 100.0) * 0.5 + ur * 0.3
                          + least(1.0, sr * 5) * 0.2) * 1e6 + 0.5) / 1e6 AS quality
            FROM r""",
        "lang_id": f"""
            WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            s AS (SELECT doc_id, len(toks) AS n,
                         len(list_filter(toks, x -> x IN ({stop_in}))) AS ns
                  FROM d),
            r AS (SELECT doc_id,
                         CASE WHEN n > 0 THEN ns::DOUBLE / n ELSE 0.0 END AS ratio
                  FROM s)
            SELECT doc_id, floor(ratio * 1e6 + 0.5) / 1e6 AS stopword_ratio,
                   CASE WHEN ratio >= 0.05 THEN 'en' ELSE 'unknown' END AS lang_pred
            FROM r""",
        "exact_dedup": """
            SELECT md5(text) AS text_hash, count(*)::BIGINT AS n_docs,
                   min(doc_id) AS keeper_id
            FROM documents GROUP BY md5(text)""",
        "ngram_jaccard": f"""
            WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            sh AS (SELECT doc_id AS id, unnest(list_distinct(
                     CASE WHEN len(toks) >= 3 THEN
                       list_transform(generate_series(1, len(toks) - 2),
                                      i -> array_to_string(toks[i:i+2], ' '))
                     ELSE [array_to_string(toks, ' ')] END)) AS shingle
                   FROM d),
            cnt AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
            inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
                      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
                      GROUP BY a.id, b.id)
            SELECT id_a, id_b,
                   floor((n_inter::DOUBLE / (ca.n_sh + cb.n_sh - n_inter)) * 1e6 + 0.5) / 1e6 AS jaccard
            FROM inter
            JOIN cnt ca ON inter.id_a = ca.id
            JOIN cnt cb ON inter.id_b = cb.id
            WHERE n_inter::DOUBLE / (ca.n_sh + cb.n_sh - n_inter) >= 0.2""",
        "ann_cosine_top10": """
            WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   floor(list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qv) * 1e6 + 0.5) / 1e6 AS cosine
            FROM embeddings, q WHERE vec_id <> 0
            ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qv) DESC, vec_id ASC
            LIMIT 10""",
        "embedding_neardup": _embedding_neardup_oracle(0.3),
        "fingerprint": f"""
            WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
            SELECT doc_id,
                   {_h60("array_to_string(list_sort(list_distinct(toks)), ' ')")}
                   AS fingerprint
            FROM d""",
        "simhash": _simhash_oracle(),
        "minhash_neardup": _minhash_oracle(0.2),
        "ann_lsh_top10": _ann_lsh_oracle(),
        "edismax_top10": _edismax_oracle(),
    }
