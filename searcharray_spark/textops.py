"""Large-scale text-pipeline operators over a documents DataFrame.

Beyond the reference's search operators: the deduplication / quality /
language-ID / fingerprinting ops a web-scale training-data pipeline needs.
All are expressed with JVM-side built-in functions (whole-stage codegen);
no Python UDFs anywhere in these paths.

Every op takes/returns DataFrames; nothing collects to the driver.
"""
from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

# English stopword set for the language-ID heuristic and quality ratios.
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "by", "at", "it", "this", "that", "be",
]


def tokens_col(text_col: str = "text") -> Column:
    """Whitespace tokens, byte-identical to Python ``str.split()``:
    split on runs of whitespace, drop empties."""
    return F.filter(F.split(F.col(text_col), r"\s+"), lambda x: F.length(x) > 0)


def _round6(col: Column) -> Column:
    """Half-up 6-decimal rounding on IEEE doubles: floor(x*1e6 + 0.5)/1e6.

    Spark's F.round (HALF_UP on BigDecimal) and DuckDB's round (on binary
    doubles) disagree on half-ulp boundaries; this expression is the same
    sequence of double ops in both engines, so results are bit-identical
    (oracle SQL uses the identical formula). Used for EVERY rounded
    output column in this package.

    Convention for NEGATIVE inputs (e.g. cosine similarities): halves
    round toward +inf (-0.0000005 -> -0.0, not -0.000001), unlike
    HALF_UP's away-from-zero. Deliberate: the oracle SQL applies the
    same formula, so both engines agree; only the half-ulp boundary of
    negative values differs from a HALF_UP convention.
    """
    return F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def hash60(col: Column) -> Column:
    """Deterministic 60-bit non-negative int64 hash of a string column.

    md5 hex prefix (15 nibbles) parsed as an integer — JVM-side,
    whole-stage codegen, and expressible verbatim in ANSI SQL/DuckDB
    (``CAST('0x' || substring(md5(x),1,15) AS BIGINT)``), so every op
    built on it gets a value-level oracle. xxhash64 would be ~3x faster
    but is engine-specific; at scale the shuffle dominates either way.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# the DuckDB-side rendering of hash60 (oracle SQL helpers)
HASH60_SQL = "CAST(('0x' || substring(md5({x}),1,15)) AS BIGINT)"


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
        _round6(
            F.when(F.size("tokens") > 0,
                   F.aggregate("tokens", F.lit(0).cast("double"),
                               lambda acc, x: acc + F.length(x)) / F.size("tokens"))
            .otherwise(F.lit(0.0))).alias("avg_token_len"),
    )


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
        _round6(ratio).alias("stopword_ratio"),
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
                        threshold: float = 0.5,
                        max_shingle_df: int = 10000) -> DataFrame:
    """Near-duplicate pairs by word-n-gram Jaccard similarity.

    Distributed shape: explode distinct shingles -> self-join on shingle
    (co-partitioned by the shuffle on the join key) -> per-pair
    intersection counts -> join per-doc shingle counts -> Jaccard.
    Returns (id_a, id_b, jaccard) with id_a < id_b.

    ``max_shingle_df`` drops shingles appearing in more than that many
    docs before the self-join: one hot shingle otherwise produces O(df^2)
    pairs (a quadratic blow-up at web scale). Dropping hot shingles only
    lowers the estimated Jaccard of pairs sharing them — standard
    near-dup practice; true near-duplicates share plenty of rare
    shingles. (The per-doc denominator counts ALL shingles, so dropped
    ones never inflate similarity.)
    """
    sh = with_tokens(df, text_col).select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(shingles_col(n))).alias("shingle"))
    counts = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    hot = sh.groupBy("shingle").agg(F.count("*").alias("sh_df")) \
        .filter(F.col("sh_df") > max_shingle_df).select("shingle")
    sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    a = sh.alias("a")
    b = sh.alias("b")
    inter = a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                   & (F.col("a.id") < F.col("b.id"))) \
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")) \
        .agg(F.count("*").alias("n_inter"))
    ca = counts.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    out = inter.join(F.broadcast(ca), "id_a").join(F.broadcast(cb), "id_b") \
        .withColumn("jaccard", _round6(
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")))) \
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
    sh = sh.withColumn("h", hash60(F.col("shingle")))
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
    return cand.withColumn("est_jaccard", _round6(est)) \
        .filter(F.col("est_jaccard") >= threshold) \
        .select("id_a", "id_b", "est_jaccard")


SIMHASH_BITS = 60  # hash60 width: every bit vote is JVM- and SQL-portable


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """60-bit SimHash per doc (token-hash bit voting), fully JVM-side.

    Shape: explode tokens -> hash60 per token -> one groupBy(doc) with 60
    bit-vote sums (whole-stage codegen; map-side partial aggregation) ->
    signature from the majority bits. No Python anywhere in the path, and
    value-verifiable by the DuckDB oracle (same hash, same votes). Docs
    with no tokens get signature 0.
    """
    toks = with_tokens(df, text_col).select(
        F.col(id_col), F.explode("tokens").alias("tok"))
    toks = toks.withColumn("h", hash60(F.col("tok")))
    votes = [F.sum(F.shiftright(F.col("h"), i) % 2).alias(f"v{i}")
             for i in range(SIMHASH_BITS)]
    agg = toks.groupBy(id_col).agg(F.count("*").alias("n"), *votes)
    sig = None
    for i in range(SIMHASH_BITS):
        bit = F.when(F.col(f"v{i}") * 2 > F.col("n"), F.lit(1 << i)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    agg = agg.select(F.col(id_col), sig.cast("long").alias("simhash"))
    return df.select(id_col).join(agg, id_col, "left").select(
        F.col(id_col), F.coalesce(F.col("simhash"), F.lit(0)).cast("long").alias("simhash"))


def doc_fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Order-insensitive content fingerprint: hash60 over the sorted
    distinct token set (cheap near-exact dedup key, oracle-verifiable)."""
    t = with_tokens(df, text_col)
    return t.select(
        F.col(id_col),
        hash60(F.concat_ws(" ", F.array_sort(F.array_distinct("tokens"))))
        .alias("fingerprint"),
    )
