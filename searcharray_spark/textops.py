"""Large-scale text-pipeline operators over a documents DataFrame.

Beyond the reference's search operators: the deduplication / quality /
language-ID / fingerprinting ops a web-scale training-data pipeline needs.
All are expressed with JVM-side built-in functions (whole-stage codegen)
except simhash, which is an Arrow-batched pandas UDF on numpy.

Every op takes/returns DataFrames; nothing collects to the driver.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import LongType

# English stopword set for the language-ID heuristic and quality ratios.
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "by", "at", "it", "this", "that", "be",
]


def tokens_col(text_col: str = "text") -> Column:
    """Whitespace tokens, byte-identical to Python ``str.split()``:
    split on runs of whitespace, drop empties."""
    return F.filter(F.split(F.col(text_col), r"\s+"), lambda x: F.length(x) > 0)


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("tokens", tokens_col(text_col))


# ---------------------------------------------------------------------------
# token / quality stats
# ---------------------------------------------------------------------------

def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc token statistics: n_tokens, n_unique, avg_token_len."""
    t = with_tokens(df, text_col)
    return t.select(
        F.col(id_col),
        F.size("tokens").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("tokens")).cast("long").alias("n_unique"),
        F.round(
            F.when(F.size("tokens") > 0,
                   F.aggregate("tokens", F.lit(0).cast("double"),
                               lambda acc, x: acc + F.length(x)) / F.size("tokens"))
            .otherwise(F.lit(0.0)), 6).alias("avg_token_len"),
    )


def _round6(col: Column) -> Column:
    """Half-up 6-decimal rounding on IEEE doubles: floor(x*1e6 + 0.5)/1e6.

    Spark's F.round (HALF_UP on BigDecimal) and DuckDB's round (on binary
    doubles) disagree on half-ulp boundaries; this expression is the same
    sequence of double ops in both engines, so results are bit-identical
    (oracle SQL uses the identical formula). Non-negative inputs only.
    """
    return F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality signals: length, lexical diversity, stopword
    ratio, and a combined [0,1] score. Deterministic, SQL-expressible.
    The combined score is computed from the UNROUNDED ratios and rounded
    once (engine-portable floor-based rounding, see _round6)."""
    t = with_tokens(df, text_col)
    n = F.size("tokens")
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter("tokens", lambda x: F.array_contains(stop_arr, x)))
    uniq_ratio = F.when(n > 0, F.size(F.array_distinct("tokens")) / n).otherwise(0.0)
    stop_ratio = F.when(n > 0, n_stop / n).otherwise(0.0)
    quality = (F.least(F.lit(1.0), n / F.lit(100.0)) * 0.5
               + uniq_ratio * 0.3
               + F.least(F.lit(1.0), stop_ratio * 5) * 0.2)
    return t.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        _round6(uniq_ratio).alias("unique_ratio"),
        _round6(stop_ratio).alias("stopword_ratio"),
        _round6(quality).alias("quality"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            threshold: float = 0.05) -> DataFrame:
    """Stopword-ratio language ID (en vs unknown). A real pipeline plugs a
    model here; the Spark plumbing (vectorized, no shuffle) is the point."""
    t = with_tokens(df, text_col)
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    ratio = F.when(F.size("tokens") > 0,
                   F.size(F.filter("tokens", lambda x: F.array_contains(stop_arr, x)))
                   / F.size("tokens")).otherwise(0.0)
    return t.select(
        F.col(id_col),
        F.round(ratio, 6).alias("stopword_ratio"),
        F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("unknown")).alias("lang_pred"),
    )


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact-duplicate groups by content hash: (text_hash, n_docs,
    keeper_id). Keep-first policy: keeper = min doc id. One hash-groupBy —
    map-side partial agg, no skew risk (hash keys uniform)."""
    return df.groupBy(F.md5(F.col(text_col)).alias("text_hash")).agg(
        F.count("*").alias("n_docs"),
        F.min(id_col).alias("keeper_id"),
    )


def shingles_col(n: int = 3) -> Column:
    """Word n-gram shingles from a ``tokens`` column."""
    return F.when(
        F.size("tokens") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("tokens") - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice("tokens", i, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", F.col("tokens"))))


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """Near-duplicate pairs by word-n-gram Jaccard similarity.

    Distributed shape: explode distinct shingles -> self-join on shingle
    (co-partitioned by the shuffle on the join key) -> per-pair
    intersection counts -> join per-doc shingle counts -> Jaccard.
    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    sh = with_tokens(df, text_col).select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(shingles_col(n))).alias("shingle"))
    counts = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                   & (F.col("a.id") < F.col("b.id"))) \
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")) \
        .agg(F.count("*").alias("n_inter"))
    ca = counts.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    out = inter.join(F.broadcast(ca), "id_a").join(F.broadcast(cb), "id_b") \
        .withColumn("jaccard", F.round(
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6)) \
        .filter(F.col("jaccard") >= threshold) \
        .select("id_a", "id_b", "jaccard")
    return out


def _minhash_perm_specs(num_hashes: int, seed: int = 7):
    """Deterministic (a, b) parameters for universal-hash permutations."""
    rng = np.random.default_rng(seed)
    # Mersenne prime 2^31-1 keeps a*h + b inside int64 (no JVM overflow)
    p = (1 << 31) - 1
    a = rng.integers(1, p, num_hashes, dtype=np.int64)
    b = rng.integers(0, p, num_hashes, dtype=np.int64)
    return a, b, p


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 3,
                       num_hashes: int = 64) -> DataFrame:
    """MinHash signatures over word-shingles: (id, sig array<long>).

    Shingle -> xxhash64 -> k universal-hash permutations -> min per
    permutation. The permutation fan-out happens inside an aggregate
    expression (no row explosion beyond shingles).
    """
    a, b, p = _minhash_perm_specs(num_hashes)
    sh = with_tokens(df, text_col).select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(shingles_col(n))).alias("shingle"))
    sh = sh.withColumn("h", F.xxhash64("shingle"))
    # per (id, perm i): min((a_i * h + b_i) mod p) — computed columnwise
    h_mod = F.pmod(F.col("h"), F.lit(int(p)))
    mins = [
        F.min(F.pmod(h_mod * F.lit(int(a[i])) + F.lit(int(b[i])), F.lit(int(p))))
        .alias(f"m{i}")
        for i in range(num_hashes)
    ]
    agg = sh.groupBy("id").agg(*mins)
    return agg.select("id", F.array(*[F.col(f"m{i}") for i in range(num_hashes)]).alias("sig"))


def minhash_neardup_pairs(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", n: int = 3,
                          num_hashes: int = 64, bands: int = 16,
                          threshold: float = 0.5) -> DataFrame:
    """MinHash + LSH banding near-dup candidates, verified by signature
    agreement: band-bucket join finds candidates, estimated Jaccard =
    fraction of matching minhashes. Returns (id_a, id_b, est_jaccard)."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes)
    banded = sigs.select(
        "id", "sig",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda bnd: F.xxhash64(F.concat_ws(
                ",", F.transform(F.slice("sig", bnd * rows_per_band + 1, rows_per_band),
                                 lambda x: x.cast("string")))),
        )).alias("band", "bucket"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = a.join(b, (F.col("a.band") == F.col("b.band"))
                  & (F.col("a.bucket") == F.col("b.bucket"))
                  & (F.col("a.id") < F.col("b.id"))) \
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.sig").alias("sig_a"), F.col("b.sig").alias("sig_b")) \
        .dropDuplicates(["id_a", "id_b"])
    est = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                          lambda m: m)) / F.lit(num_hashes)
    return cand.withColumn("est_jaccard", F.round(est, 6)) \
        .filter(F.col("est_jaccard") >= threshold) \
        .select("id_a", "id_b", "est_jaccard")


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc (token-hash bit voting) as an Arrow-batched
    pandas UDF — numpy bit matrix, no per-row Python."""

    @F.pandas_udf(LongType())
    def _simhash(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        bit_idx = np.arange(64, dtype=np.uint64)
        for i, text in enumerate(texts):
            toks = text.split() if isinstance(text, str) else []
            if not toks:
                continue
            hashes = np.array([hash_token(t) for t in toks], dtype=np.uint64)
            bits = ((hashes[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
            votes = bits.sum(axis=0) * 2 - len(toks)
            sig = np.uint64(0)
            for bpos in np.flatnonzero(votes > 0):
                sig |= np.uint64(1) << np.uint64(bpos)
            out[i] = np.int64(sig.astype(np.int64))
        return pd.Series(out)

    def hash_token(tok: str) -> int:
        # FNV-1a 64-bit: deterministic across processes (unlike hash())
        h = 0xCBF29CE484222325
        for ch in tok.encode("utf-8"):
            h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    return df.select(F.col(id_col), _simhash(F.col(text_col)).alias("simhash"))


def doc_fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Order-insensitive content fingerprint: xxhash64 over the sorted
    distinct token set (cheap near-exact dedup key)."""
    t = with_tokens(df, text_col)
    return t.select(
        F.col(id_col),
        F.xxhash64(F.concat_ws(" ", F.array_sort(F.array_distinct("tokens"))))
        .alias("fingerprint"),
    )
