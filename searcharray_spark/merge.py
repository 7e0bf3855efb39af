"""Index maintenance: merge independently built indexes.

Reference semantics: PosnBitArray.concat / merge
(/root/reference/searcharray/phrase/middle_out.py:366-408) — append
batches with disjoint doc ranges, or merge overlapping ones. In the
Spark engine, indexes over DISJOINT doc-id ranges merge as pure
metadata/table unions — no posting bytes are rewritten (each posting
row stays keyed by its (term, block); doc blocks don't collide when doc
ranges don't). This is the segment-merge primitive incremental /
streaming ingestion builds on.
"""
from __future__ import annotations

import json
import os
from typing import List, Sequence

from pyspark.sql import SparkSession, functions as F

from .index import SearchIndex


def merge_indexes(spark: SparkSession, index_paths: Sequence[str],
                  out_path: str) -> SearchIndex:
    """Merge indexes with disjoint doc-id ranges into one index.

    All inputs must share tokenizer and docs_per_block; their doc blocks
    must not overlap (disjoint doc-id ranges => disjoint block ids).
    """
    metas = []
    for p in index_paths:
        with open(os.path.join(p, "meta.json")) as fh:
            metas.append(json.load(fh))
    tokenizers_ = {m["tokenizer"] for m in metas}
    dpbs = {m["docs_per_block"] for m in metas}
    if len(tokenizers_) != 1 or len(dpbs) != 1:
        raise ValueError("indexes disagree on tokenizer or docs_per_block")

    os.makedirs(out_path, exist_ok=True)
    n_parts = max(4, spark.sparkContext.defaultParallelism)

    def union_of(table: str):
        df = None
        for p in index_paths:
            part = spark.read.parquet(os.path.join(p, table))
            df = part if df is None else df.unionByName(part)
        return df

    union_of("postings").repartitionByRange(n_parts, "term", "block_id") \
        .sortWithinPartitions("term", "block_id") \
        .write.mode("overwrite").parquet(os.path.join(out_path, "postings"))
    # doc ranges need not be block-aligned: a boundary block may appear in
    # two segments — coalesce its doclens rows (and verify the doc ids are
    # actually disjoint). (Posting rows for a shared (term, block) are
    # merged lazily by the query kernel.)
    import numpy as np
    import pandas as pd

    def _coalesce(key, pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 1:
            return pdf
        ids = np.concatenate([np.frombuffer(b, dtype="<i8")
                              for b in pdf["doc_ids"]])
        lens = np.concatenate([np.frombuffer(b, dtype="<f4")
                               for b in pdf["doc_lens"]])
        order = np.argsort(ids)
        ids, lens = ids[order], lens[order]
        if len(ids) > 1 and (np.diff(ids) == 0).any():
            raise ValueError(
                f"overlapping doc ids in block {int(key[0])} during merge")
        return pd.DataFrame({"block_id": [int(key[0])],
                             "doc_ids": [ids.astype('<i8').tobytes()],
                             "doc_lens": [lens.astype('<f4').tobytes()]})

    union_of("doclens").groupBy("block_id").applyInPandas(
        _coalesce, "block_id long, doc_ids binary, doc_lens binary") \
        .write.mode("overwrite").parquet(os.path.join(out_path, "doclens"))
    union_of("term_stats").groupBy("term").agg(
        F.sum("df").alias("df"),
        F.sum("tf_total").alias("tf_total"),
        F.sum("n_blocks").alias("n_blocks"),
    ).repartitionByRange(max(1, n_parts // 4), "term") \
        .sortWithinPartitions("term") \
        .write.mode("overwrite").parquet(os.path.join(out_path, "term_stats"))

    num_docs = sum(m["num_docs"] for m in metas)
    total_tokens = sum(m["total_tokens"] for m in metas)
    meta = dict(metas[0])
    meta.update({
        "num_docs": num_docs,
        "total_tokens": total_tokens,
        "avg_doc_len": (total_tokens / num_docs) if num_docs else 0.0,
        "merged_from": list(index_paths),
    })
    with open(os.path.join(out_path, "meta.json"), "w") as fh:
        json.dump(meta, fh, indent=2)
    return SearchIndex(spark, out_path)
