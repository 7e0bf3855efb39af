"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force cosine top-k — the exact baseline. Dot
  product via JVM-side ``zip_with`` + ``aggregate`` (no Python), top-k
  via TakeOrdered.
- ``lsh_buckets`` / ``lsh_topk``: random-hyperplane LSH — the scale path:
  candidates restricted to the query's bucket (probe neighbors with
  ``n_probes``), then exact cosine on the candidates only.
- ``cosine_neardup_pairs``: all-pairs near-duplicates above a cosine
  threshold (bucketed to avoid the full cross join at scale).
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from .textops import _round6


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0).cast("double"), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0).cast("double"), lambda acc, x: acc + x))


def cosine_topk(df: DataFrame, query_vec: Sequence[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                exclude_id=None) -> DataFrame:
    """Exact cosine top-k: (id, cosine). Ties broken by id."""
    q = [float(x) for x in query_vec]
    qn = float(np.sqrt(np.dot(q, q)))
    qcol = F.array(*[F.lit(x).cast("double") for x in q])
    out = df.select(
        F.col(id_col),
        _round6(_dot(F.col(vec_col).cast("array<double>"), qcol)
                / (_norm(F.col(vec_col).cast("array<double>")) * F.lit(qn)))
        .alias("cosine"),
    )
    if exclude_id is not None:
        out = out.filter(F.col(id_col) != exclude_id)
    return out.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 13) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_buckets(df: DataFrame, dim: int, n_planes: int = 16,
                id_col: str = "vec_id", vec_col: str = "embedding",
                seed: int = 13) -> DataFrame:
    """Random-hyperplane signature per vector: (id, embedding, bucket).

    bucket = sign-bit string of <v, h_i> — vectors with high cosine land
    in the same bucket with high probability. Computed JVM-side.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    bits = []
    v = F.col(vec_col).cast("array<double>")
    for i in range(n_planes):
        h = F.array(*[F.lit(float(x)).cast("double") for x in planes[i]])
        bits.append(F.when(_dot(v, h) >= 0, F.lit(1)).otherwise(F.lit(0)))
    bucket = F.concat_ws("", *[b.cast("string") for b in bits])
    return df.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def lsh_probe_buckets(query_vec: Sequence[float], n_planes: int,
                      n_probes: int, seed: int = 13) -> List[str]:
    """Multi-probe bucket list for a query: the query's own bucket plus
    the buckets reached by flipping the lowest-|margin| sign bits (the
    hyperplanes the query is closest to — where near neighbors most
    likely fell on the other side). Capped at n_planes + 1 buckets.
    """
    q = np.asarray(list(query_vec), dtype=np.float64)
    planes = _hyperplanes(len(q), n_planes, seed)
    d = planes @ q
    base = d >= 0
    probes = ["".join("1" if b else "0" for b in base)]
    for i in np.argsort(np.abs(d))[:max(0, min(n_probes, n_planes + 1) - 1)]:
        flipped = base.copy()
        flipped[i] = ~flipped[i]
        probes.append("".join("1" if b else "0" for b in flipped))
    return probes


def lsh_topk(df: DataFrame, query_vec: Sequence[float], k: int = 10,
             n_planes: int = 8, n_probes: int = 3, id_col: str = "vec_id",
             vec_col: str = "embedding", seed: int = 13) -> DataFrame:
    """Approximate top-k: restrict to the query's LSH bucket plus
    ``n_probes - 1`` neighboring buckets (multi-probe: flip the sign bits
    with the smallest |dot| margin), then exact cosine on the candidates
    only. Recall grows with n_probes at linear candidate cost — the scale
    path versus a full-table scan."""
    probes = lsh_probe_buckets(query_vec, n_planes, n_probes, seed)
    bucketed = lsh_buckets(df, len(list(query_vec)), n_planes, id_col, vec_col, seed)
    cands = bucketed.filter(F.col("bucket").isin(probes)).drop("bucket")
    return cosine_topk(cands, query_vec, k, id_col, vec_col)


def cosine_neardup_pairs(df: DataFrame, threshold: float = 0.95,
                         n_planes: int = 8, id_col: str = "vec_id",
                         vec_col: str = "embedding", dim: int = None,
                         seed: int = 13) -> DataFrame:
    """Embedding near-duplicate pairs (cosine >= threshold).

    Bucket with random hyperplanes first so the pair join is per-bucket,
    not a full cross join. High-threshold pairs rarely split across
    buckets with few planes; exactness-vs-cost is tunable via n_planes
    (n_planes=0 -> exact full cross join).
    """
    if n_planes > 0:
        if dim is None:
            first = df.select(F.size(vec_col).alias("d")).first()
            dim = int(first["d"])
        src = lsh_buckets(df, dim, n_planes, id_col, vec_col, seed)
        join_cond = (F.col("a.bucket") == F.col("b.bucket")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    else:
        src = df.select(id_col, vec_col).withColumn("bucket", F.lit(0))
        join_cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    a = src.alias("a")
    b = src.alias("b")
    va = F.col(f"a.{vec_col}").cast("array<double>")
    vb = F.col(f"b.{vec_col}").cast("array<double>")
    pairs = a.join(b, join_cond).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        _round6(_dot(va, vb) / (_norm(va) * _norm(vb))).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= threshold)
