"""Deterministic synthetic Common-Crawl-style corpus generator.

Produces the BASELINE.json input_hint schema:
  (url string, warc_ts timestamp, html binary, text string, lang string)

Generation is distributed (mapInPandas over chunk specs) and seeded per
chunk, so the same (n_docs, seed) always yields byte-identical rows
regardless of cluster size or partitioning — the per-row invariant the
correctness protocol needs (FIXTURES.md F1). Vocabulary is Zipf-ranked
("the"-like hot terms through rare tail), which exercises hot-term skew
in the index build.
"""
from __future__ import annotations

import datetime as _dt
from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType, LongType, StringType, StructField, StructType, TimestampType,
)

CORPUS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])

# a base of real-ish common words for the hot end of the Zipf curve
_COMMON = (
    "the of and to a in is was for on with as by at it this that be are "
    "from or an have not they which one you were all her she there been "
    "their has more will would about time up out into than its only"
).split()


def make_vocab(size: int = 30000) -> List[str]:
    vocab = list(_COMMON)
    vocab += [f"w{i:05d}" for i in range(size - len(vocab))]
    return vocab


def generate_corpus(spark: SparkSession, n_docs: int, seed: int = 42,
                    avg_len: int = 60, vocab_size: int = 30000,
                    chunk_size: int = 5000) -> DataFrame:
    """Deterministic corpus as a DataFrame (not yet written)."""
    chunks = [(start, min(chunk_size, n_docs - start))
              for start in range(0, n_docs, chunk_size)]
    chunks_df = spark.createDataFrame(chunks, "start long, n long") \
        .repartition(len(chunks))
    vocab = np.array(make_vocab(vocab_size), dtype=object)
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = (1.0 / ranks ** 1.07)
    probs /= probs.sum()
    cum = np.cumsum(probs)
    base_ts = _dt.datetime(2024, 1, 1)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for row in pdf.itertuples():
                rng = np.random.default_rng(seed + int(row.start))
                n = int(row.n)
                lens = rng.integers(max(2, avg_len // 6), avg_len * 2 - avg_len // 6, n)
                total = int(lens.sum())
                draws = rng.random(total)
                word_idx = np.searchsorted(cum, draws)
                texts = []
                pos = 0
                for ln in lens:
                    texts.append(" ".join(vocab[word_idx[pos:pos + ln]]))
                    pos += ln
                doc_ids = np.arange(row.start, row.start + n, dtype=np.int64)
                yield pd.DataFrame({
                    "doc_id": doc_ids,
                    "url": [f"https://example.org/crawl/{d:012d}" for d in doc_ids],
                    "warc_ts": [base_ts + _dt.timedelta(seconds=int(d)) for d in doc_ids],
                    "html": [f"<html><body><p>{t}</p></body></html>".encode()
                             for t in texts],
                    "text": texts,
                    "lang": "en",
                })

    return chunks_df.mapInPandas(gen, CORPUS_SCHEMA)


def extract_text_from_html(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Byte-identical text extraction from the html wrapper (the synthetic
    inverse of the generator's wrapping) as a vectorized pandas UDF —
    stands in for a real WARC/HTML extraction stage."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType as _S

    @F.pandas_udf(_S())
    def _extract(html: pd.Series) -> pd.Series:
        return html.map(
            lambda b: b.decode("utf-8", "replace")
            .removeprefix("<html><body><p>")
            .removesuffix("</p></body></html>") if b is not None else None)

    return df.withColumn("extracted_text", _extract(F.col(html_col)))
