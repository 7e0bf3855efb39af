"""Query side: SearchIndex over the on-disk index tables.

API parity with the reference array surface
(/root/reference/searcharray/postings.py:607-708 — termfreqs, docfreq,
doclengths, positions, score) re-expressed as sparse DataFrames:
results are (doc_id, tf|score) rows, never dense arrays, until a test
helper densifies at small scale.

Query execution model (no posting shuffle at query time):
- postings scan is pruned to the query terms (parquet min/max on the
  term-sorted files + pushed-down ``term IN (...)`` filter),
- hits are computed block-locally by cogrouping query-term posting rows
  with the block's packed doclens row (``applyInPandas`` over
  ``block_id``), numpy kernels inside,
- only (doc_id, score) survivors leave the kernel; global top-k is
  Spark's TakeOrdered (per-partition top-k, then driver merge).
"""
from __future__ import annotations

import json
import os
from typing import Iterable, List, Optional, Sequence, Union

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType, FloatType, IntegerType, LongType, StructField, StructType,
)

from . import kernels as K
from . import similarity as sim_mod
from . import tokenizers

TokenArg = Union[str, Sequence[str]]

HITS_SCHEMA = StructType([
    StructField("token_idx", IntegerType()),
    StructField("doc_id", LongType()),
    StructField("tf", FloatType()),
    StructField("score", FloatType()),
])

POSITIONS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("posns", ArrayType(IntegerType())),
])


def _normalize_token(token: TokenArg) -> List[str]:
    if isinstance(token, str):
        return [token]
    toks = list(token)
    if not all(isinstance(t, str) for t in toks):
        raise ValueError(f"expected str or list of str, got {token!r}")
    return toks


class SearchIndex:
    """Handle to a built index (see indexing.build_index for the layout)."""

    def __init__(self, spark: SparkSession, path: str, tokenizer=None):
        self.spark = spark
        self.path = path
        with open(os.path.join(path, "meta.json")) as fh:
            self.meta = json.load(fh)
        self.docs_per_block = int(self.meta["docs_per_block"])
        self.num_docs = int(self.meta["num_docs"])
        self.avg_doc_len = float(self.meta["avg_doc_len"])
        if tokenizer is not None:
            self.tokenizer = tokenizers.resolve(tokenizer)
        elif self.meta["tokenizer"] == "custom":
            # built with an unregistered callable; query tokenization needs
            # the caller to supply it again
            self.tokenizer = None
        else:
            self.tokenizer = tokenizers.resolve(self.meta["tokenizer"])
        self._df_cache: dict = {}
        self._postings_df: DataFrame | None = None
        self._doclens_df: DataFrame | None = None

    def cache(self) -> "SearchIndex":
        """Persist the postings + doclens tables in executor memory —
        amortizes the scan across repeated queries (the cluster-scale
        analogue: spark.catalog.cacheTable on the index tables)."""
        self._postings_df = self.spark.read.parquet(
            os.path.join(self.path, "postings")).cache()
        self._doclens_df = self.spark.read.parquet(
            os.path.join(self.path, "doclens")).cache()
        self._postings_df.count()
        self._doclens_df.count()
        return self

    # --- tables -----------------------------------------------------------
    @property
    def postings(self) -> DataFrame:
        if self._postings_df is not None:
            return self._postings_df
        return self.spark.read.parquet(os.path.join(self.path, "postings"))

    @property
    def doclens(self) -> DataFrame:
        if self._doclens_df is not None:
            return self._doclens_df
        return self.spark.read.parquet(os.path.join(self.path, "doclens"))

    @property
    def docstats(self) -> DataFrame:
        """Per-doc (doc_id, block_id, doc_len), derived from the packed
        per-block doclens rows (not materialized — the packed form is the
        source of truth; this explode is only for API/oracle use)."""
        docs_per_block = self.docs_per_block
        schema = StructType([
            StructField("doc_id", LongType()),
            StructField("block_id", LongType()),
            StructField("doc_len", FloatType()),
        ])

        def _explode(it):
            for pdf in it:
                for block_id, ids_raw, lens_raw in zip(
                        pdf["block_id"], pdf["doc_ids"], pdf["doc_lens"]):
                    ids = np.frombuffer(ids_raw, dtype="<i8")
                    yield pd.DataFrame({
                        "doc_id": ids + int(block_id) * docs_per_block,
                        "block_id": int(block_id),
                        "doc_len": np.frombuffer(lens_raw, dtype="<f4"),
                    })

        return self.doclens.mapInPandas(_explode, schema)

    @property
    def term_stats(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "term_stats"))

    # --- scalar stats -----------------------------------------------------
    def docfreq(self, term: str) -> int:
        return int(self.docfreqs([term])[term])

    def docfreqs(self, terms: Iterable[str]) -> dict:
        """Doc freq per term (missing -> 0); driver-side lookup, cached."""
        terms = list(dict.fromkeys(terms))
        missing = [t for t in terms if t not in self._df_cache]
        if missing:
            rows = self.term_stats.filter(F.col("term").isin(missing)) \
                .select("term", "df").collect()
            found = {r["term"]: int(r["df"]) for r in rows}
            for t in missing:
                self._df_cache[t] = found.get(t, 0)
        return {t: self._df_cache[t] for t in terms}

    def doclengths(self) -> DataFrame:
        return self.docstats.select("doc_id", "doc_len")

    @property
    def avg_doc_length(self) -> float:
        return self.avg_doc_len

    # --- core query kernel ------------------------------------------------

    # broadcast the packed doclens when the whole table fits comfortably
    # in executor memory (~16 bytes/doc) — kills the doclens shuffle on
    # every query. Beyond this, queries fall back to the block cogroup.
    DOCLENS_BROADCAST_MAX_DOCS = 32_000_000

    def _doclens_broadcast(self):
        if getattr(self, "_dl_bc", None) is None:
            rows = self.doclens.collect()
            table = {int(r["block_id"]): (r["doc_ids"], r["doc_lens"])
                     for r in rows}
            self._dl_bc = self.spark.sparkContext.broadcast(table)
        return self._dl_bc

    def _hits(self, tokens: List[List[str]], similarity=None,
              min_posn: Optional[int] = None, max_posn: Optional[int] = None,
              slop: int = 0, block_ids: Optional[Sequence[int]] = None) -> DataFrame:
        """(token_idx, doc_id, tf, score) for each query token (term or
        phrase), computed block-locally.

        Physical strategies (cheapest that fits):
        1. single terms + broadcast doclens -> mapInPandas straight over
           the pruned postings scan: ZERO shuffle before top-k.
        2. phrases + broadcast doclens -> one shuffle (groupBy block) of
           the pruned posting rows only.
        3. doclens too large to broadcast -> block cogroup (both sides
           shuffle by block_id; doc-axis partitioned, never by doc).
        """
        if slop != 0:
            from .spans import span_freqs  # noqa: F401  (fail fast on driver)
        sim_fn = sim_mod.resolve(similarity)
        all_terms = sorted({t for tok in tokens for t in tok})
        if not all_terms:
            return self.spark.createDataFrame([], HITS_SCHEMA)
        dfs = self.docfreqs(all_terms)
        num_docs = self.num_docs
        avgdl = self.avg_doc_len
        docs_per_block = self.docs_per_block
        tokens_b = [list(t) for t in tokens]
        dfs_b = dict(dfs)

        def empty_out() -> pd.DataFrame:
            return pd.DataFrame(
                {"token_idx": pd.Series([], dtype="int32"),
                 "doc_id": pd.Series([], dtype="int64"),
                 "tf": pd.Series([], dtype="float32"),
                 "score": pd.Series([], dtype="float32")})

        def score_block(block_id: int, packed: dict, dl_raw) -> pd.DataFrame:
            base = block_id * docs_per_block
            dl_ids = np.frombuffer(dl_raw[0], dtype="<i8")
            dl_lens = np.frombuffer(dl_raw[1], dtype="<f4")
            out_tok, out_doc, out_tf, out_score = [], [], [], []
            empty = np.zeros(0, dtype=np.uint64)
            for idx, tok in enumerate(tokens_b):
                encoded = [packed.get(t, empty) for t in tok]
                if min_posn is not None or max_posn is not None:
                    encoded = [K.slice_posn_window(e, min_posn, max_posn)
                               for e in encoded]
                if len(tok) == 1:
                    ids, tfs = K.termfreqs(encoded[0])
                elif slop == 0:
                    ids, tfs = K.phrase_freqs(encoded)
                else:
                    from .spans import span_freqs
                    ids, tfs = span_freqs(encoded, slop)
                if len(ids) == 0:
                    continue
                keep = tfs > 0
                ids, tfs = ids[keep], tfs[keep]
                if len(ids) == 0:
                    continue
                tfs = tfs.astype(np.float32)
                dls = dl_lens[np.searchsorted(dl_ids, ids)]
                tok_dfs = np.asarray([dfs_b[t] for t in tok], dtype=np.float32)
                # copy: reference-style similarities (bm25.pyx) mutate
                # term_freqs in place; the tf column must stay raw tfs
                scores = sim_fn(tfs.copy(), tok_dfs, dls, avgdl, num_docs)
                out_tok.append(np.full(len(ids), idx, dtype=np.int32))
                out_doc.append(ids + base)
                out_tf.append(tfs)
                out_score.append(np.asarray(scores, dtype=np.float32))
            if not out_tok:
                return empty_out()
            return pd.DataFrame({
                "token_idx": np.concatenate(out_tok),
                "doc_id": np.concatenate(out_doc),
                "tf": np.concatenate(out_tf),
                "score": np.concatenate(out_score),
            })

        def merge_packed(left: pd.DataFrame) -> dict:
            packed: dict = {}
            for row in left.itertuples():
                arr = K.from_bytes(row.postings)
                prev = packed.get(row.term)
                if prev is not None:  # chunked posting rows: merge sorted
                    arr = np.concatenate((prev, arr))
                    arr.sort(kind="stable")
                packed[row.term] = arr
            return packed

        posts = self.postings.filter(F.col("term").isin(all_terms))
        if block_ids is not None:
            posts = posts.filter(F.col("block_id").isin([int(b) for b in block_ids]))
        single_terms_only = all(len(t) == 1 for t in tokens_b)

        if self.num_docs <= self.DOCLENS_BROADCAST_MAX_DOCS:
            dl_bc = self._doclens_broadcast()

            if single_terms_only:
                # zero-shuffle path: every posting row is independent
                def map_kernel(it):
                    table = dl_bc.value
                    for pdf in it:
                        if len(pdf) == 0:
                            continue
                        for block_id, grp in pdf.groupby("block_id"):
                            dl_raw = table.get(int(block_id))
                            if dl_raw is None:
                                continue
                            yield score_block(int(block_id),
                                              merge_packed(grp), dl_raw)

                return posts.select("term", "block_id", "postings") \
                    .mapInPandas(map_kernel, HITS_SCHEMA)

            def grouped_kernel(key, left: pd.DataFrame) -> pd.DataFrame:
                dl_raw = dl_bc.value.get(int(key[0]))
                if dl_raw is None or len(left) == 0:
                    return empty_out()
                return score_block(int(key[0]), merge_packed(left), dl_raw)

            return posts.groupBy("block_id").applyInPandas(
                grouped_kernel, HITS_SCHEMA)

        def cogroup_kernel(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if len(left) == 0 or len(right) == 0:
                return empty_out()
            dl_raw = (right["doc_ids"].iloc[0], right["doc_lens"].iloc[0])
            return score_block(int(key[0]), merge_packed(left), dl_raw)

        return posts.groupBy("block_id").cogroup(
            self.doclens.groupBy("block_id")
        ).applyInPandas(cogroup_kernel, HITS_SCHEMA)

    # --- public API -------------------------------------------------------
    def termfreqs(self, token: TokenArg, min_posn: Optional[int] = None,
                  max_posn: Optional[int] = None, slop: int = 0) -> DataFrame:
        """Sparse per-doc term/phrase frequencies: (doc_id, tf)."""
        toks = _normalize_token(token)
        return self._hits([toks], min_posn=min_posn, max_posn=max_posn,
                          slop=slop).select("doc_id", "tf")

    def score(self, token: TokenArg, similarity=None, slop: int = 0,
              min_posn: Optional[int] = None,
              max_posn: Optional[int] = None) -> DataFrame:
        """Sparse BM25 (or custom similarity) scores: (doc_id, score).

        Phrase scoring: tf = phrase freq, idf sums the constituent terms'
        dfs (reference postings.py:652-680).
        """
        toks = _normalize_token(token)
        return self._hits([toks], similarity=similarity, slop=slop,
                          min_posn=min_posn, max_posn=max_posn) \
            .select("doc_id", "score")

    def score_many(self, tokens: Sequence[TokenArg], similarity=None,
                   slop: int = 0) -> DataFrame:
        """Batch scoring of many tokens in one pass: (token_idx, doc_id,
        tf, score). One postings scan + one kernel pass for the whole
        query — the building block for boolean/edismax queries."""
        toks = [_normalize_token(t) for t in tokens]
        return self._hits(toks, similarity=similarity, slop=slop)

    def top_k(self, token: TokenArg, k: int = 10, similarity=None,
              slop: int = 0) -> DataFrame:
        """Global top-k by score (ties broken by doc_id): distributed
        per-partition top-k then driver merge (TakeOrderedAndProject)."""
        return self.score(token, similarity=similarity, slop=slop) \
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    # relative safety margin on block upper bounds: the kernel computes
    # scores in float32; bounds are float64-of-float32-inputs, so pad by
    # a few ulps to never prune a block holding a true top-k doc
    _WAND_EPS = 1e-5

    def _block_bounds(self, tokens: List[List[str]]) -> dict:
        """Per-block score upper bound for an OR query over ``tokens``.

        Uses the per-(term, block) block-max metadata written at index
        time (``tf_max``, ``dl_min``): BM25 is monotone increasing in tf
        and decreasing in dl, so
            ub(term, block) = idf * tf_max / (tf_max + k1*(1-b+b*dl_min/avgdl))
        bounds every doc's term contribution in the block; the block
        bound is the sum over query tokens (MaxScore/block-max-WAND
        bound). A phrase token's bound uses min(tf_max) over its
        constituent terms (phrase freq <= every constituent tf) with the
        summed-df idf the scorer uses (reference postings.py:652-680).
        """
        all_terms = sorted({t for tok in tokens for t in tok})
        meta = self.postings.filter(F.col("term").isin(all_terms)) \
            .groupBy("term", "block_id").agg(F.max("tf_max").alias("tf_max"),
                                             F.min("dl_min").alias("dl_min")) \
            .collect()
        per_term: dict = {}
        for r in meta:
            per_term.setdefault(r["term"], {})[int(r["block_id"])] = (
                float(r["tf_max"]), float(r["dl_min"] if r["dl_min"] is not None
                                           else r["tf_max"]))
        dfs = self.docfreqs(all_terms)
        sim = sim_mod.bm25_similarity()
        bounds: dict = {}
        for tok in tokens:
            tok_blocks = None
            for t in tok:  # a phrase needs every term in the block
                blks = set(per_term.get(t, {}))
                tok_blocks = blks if tok_blocks is None else tok_blocks & blks
            if not tok_blocks:
                continue
            tok_dfs = np.asarray([dfs[t] for t in tok], dtype=np.float32)
            for b in tok_blocks:
                tf_m = min(per_term[t][b][0] for t in tok)
                dl_m = min(per_term[t][b][1] for t in tok)
                ub = float(sim(np.asarray([tf_m], dtype=np.float32), tok_dfs,
                               np.asarray([dl_m], dtype=np.float32),
                               self.avg_doc_len, self.num_docs)[0])
                bounds[b] = bounds.get(b, 0.0) + ub * (1.0 + self._WAND_EPS)
        return bounds

    def top_k_pruned(self, tokens: Union[TokenArg, Sequence[TokenArg]],
                     k: int = 10, similarity=None) -> DataFrame:
        """Block-max pruned top-k — rank-identical to exhaustive scoring
        (``top_k`` for one token; ``search_or(...).orderBy`` for many)
        but scans only the doc blocks whose bound can reach the top-k.

        Two-phase driver plan (the distributed analogue of block-max
        WAND/MaxScore; the reference scores all docs): score the
        highest-bound blocks first in cluster-sized chunks; once k docs
        are held, theta = kth score and every remaining block with
        bound < theta is skipped. Each chunk is one Spark job over a
        partition-pruned postings scan; only top-k rows return.
        """
        if isinstance(tokens, str):
            tokens_list = [[tokens]]
        else:
            seq = list(tokens)
            if seq and all(isinstance(t, str) for t in seq):
                # a bare list of strings is an OR query over single terms
                tokens_list = [[t] for t in seq]
            else:
                tokens_list = [_normalize_token(t) for t in seq]
        bounds = self._block_bounds(tokens_list)
        if not bounds:
            return self.spark.createDataFrame([], "doc_id long, score float")
        blocks = sorted(((b, ub) for b, ub in bounds.items()),
                        key=lambda x: (-x[1], x[0]))
        chunk_size = max(8, self.spark.sparkContext.defaultParallelism)
        best: List = []  # (score, doc_id), kept sorted desc, len<=k
        theta = None
        scanned = 0
        i = 0
        while i < len(blocks):
            if theta is not None and blocks[i][1] < theta:
                break  # every remaining block's bound is below the kth score
            chunk = []
            while i < len(blocks) and len(chunk) < chunk_size and (
                    theta is None or blocks[i][1] >= theta):
                chunk.append(blocks[i][0])
                i += 1
            hits = self._hits(tokens_list, similarity=similarity,
                              block_ids=chunk)
            rows = hits.groupBy("doc_id").agg(F.sum("score").alias("score")) \
                .orderBy(F.desc("score"), F.asc("doc_id")).limit(k).collect()
            scanned += len(chunk)
            best.extend((r["score"], r["doc_id"]) for r in rows)
            best.sort(key=lambda x: (-x[0], x[1]))
            best = best[:k]
            if len(best) >= k:
                theta = best[-1][0]
        out = self.spark.createDataFrame(
            [(int(d), float(s)) for s, d in best], "doc_id long, score double") \
            .select("doc_id", F.col("score").cast("float"))
        out._wand_blocks_scanned = scanned  # introspection for tests
        out._wand_blocks_total = len(blocks)
        return out

    def top_k_many(self, tokens: Sequence[TokenArg], k: int = 10,
                   similarity=None) -> DataFrame:
        """Top-k per query token in ONE kernel pass (batch scoring):
        (token_idx, doc_id, score, rank). Rank assignment mirrors the
        reference's SetOfResults (utils/sort.py:21-45) as a window
        row_number per token."""
        from pyspark.sql import Window
        hits = self.score_many(tokens, similarity=similarity)
        w = Window.partitionBy("token_idx").orderBy(
            F.desc("score"), F.asc("doc_id"))
        return hits.withColumn("rank", F.row_number().over(w)) \
            .filter(F.col("rank") <= k) \
            .select("token_idx", "doc_id", "score", "rank")

    def positions(self, term: str) -> DataFrame:
        """Decoded positions per doc for one term (debug/API parity)."""
        docs_per_block = self.docs_per_block

        def decode_rows(it):
            for pdf in it:
                for row in pdf.itertuples():
                    packed = K.from_bytes(row.postings)
                    ids, posns = K.decode(packed)
                    starts = np.concatenate(
                        ([0], np.flatnonzero(np.diff(ids)) + 1, [len(ids)]))
                    yield pd.DataFrame({
                        "doc_id": ids[starts[:-1]] + row.block_id * docs_per_block,
                        "posns": [posns[s:e].astype(np.int32)
                                  for s, e in zip(starts[:-1], starts[1:])],
                    })

        return self.postings.filter(F.col("term") == term) \
            .mapInPandas(decode_rows, POSITIONS_SCHEMA)

    # --- boolean combinators (reference user-level AND/OR patterns,
    #     test_search.py:146-204) -----------------------------------------
    def search_or(self, tokens: Sequence[TokenArg], mm: int = 1,
                  similarity=None) -> DataFrame:
        """OR query: sum of per-token scores over docs matching >= mm
        tokens. Returns (doc_id, score, n_matches)."""
        hits = self.score_many(tokens, similarity=similarity)
        return hits.groupBy("doc_id").agg(
            F.sum("score").alias("score"),
            F.countDistinct("token_idx").alias("n_matches"),
        ).filter(F.col("n_matches") >= mm)

    def search_and(self, tokens: Sequence[TokenArg], similarity=None) -> DataFrame:
        return self.search_or(tokens, mm=len(tokens), similarity=similarity)

    def memory_report(self, top_n: int = 10) -> dict:
        """Index size accounting incl. the largest terms (reference
        memory_report, postings.py:570-602): on-disk bytes per table +
        top-N terms by posting bytes."""
        report: dict = {"tables": {}, "top_terms": []}
        for table in ("postings", "doclens", "term_stats"):
            p = os.path.join(self.path, table)
            total = 0
            for root, _, files in os.walk(p):
                total += sum(os.path.getsize(os.path.join(root, f))
                             for f in files if f.endswith(".parquet"))
            report["tables"][table] = total
        rows = self.postings.groupBy("term") \
            .agg(F.sum(F.length("postings")).alias("bytes")) \
            .orderBy(F.desc("bytes")).limit(top_n).collect()
        report["top_terms"] = [(r["term"], int(r["bytes"])) for r in rows]
        report["num_docs"] = self.num_docs
        report["total_bytes"] = sum(report["tables"].values())
        return report

    # --- dense helpers (test parity at small scale only) ------------------
    def termfreqs_dense(self, token: TokenArg, **kw) -> np.ndarray:
        rows = self.termfreqs(token, **kw).collect()
        out = np.zeros(self.num_docs, dtype=np.float32)
        for r in rows:
            out[r["doc_id"]] = r["tf"]
        return out

    def score_dense(self, token: TokenArg, similarity=None, **kw) -> np.ndarray:
        rows = self.score(token, similarity=similarity, **kw).collect()
        out = np.zeros(self.num_docs, dtype=np.float32)
        for r in rows:
            out[r["doc_id"]] = r["score"]
        return out

    def doclengths_dense(self) -> np.ndarray:
        rows = self.doclengths().collect()
        out = np.zeros(self.num_docs, dtype=np.float32)
        for r in rows:
            out[r["doc_id"]] = r["doc_len"]
        return out
