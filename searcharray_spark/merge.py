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


def _lens_for_ids(dl_ids, dl_lens, ids):
    """Doc lengths for sorted posting doc ids, failing LOUDLY if any id
    is missing from the doclens table (an unclamped searchsorted would
    either IndexError or silently return a neighbour's length, feeding
    wrong dl_min/WAND bounds)."""
    import numpy as _np
    pos = _np.searchsorted(dl_ids, ids)
    if len(ids) and (int(pos.max()) >= len(dl_ids)
                     or not _np.array_equal(dl_ids[pos], ids)):
        missing = set(map(int, ids)) - set(map(int, dl_ids))
        raise ValueError(
            f"inconsistent index: posting doc ids missing from doclens "
            f"(sample: {sorted(missing)[:5]})")
    return dl_lens[pos]


def compact_index(spark: SparkSession, index_path: str, out_path: str,
                  as_of: int = None) -> SearchIndex:
    """Materialize tombstones + update segments into a fresh index.

    Deleted docs disappear; updated docs keep their ids with the new
    content; df / tf / block-max metadata and corpus stats (num_docs,
    avg_doc_len) are recomputed exactly. The epoch resets (no
    tombstones/updates in the output).

    ``as_of=E`` exports a historical snapshot instead of the live state
    (Iceberg-style snapshot export): the rewrite sees only tombstones
    and update segments committed by epoch E, via the snapshot handle's
    filtered views.

    Fully distributed — NO O(num_docs) driver materialization: doclens
    compact as a per-block applyInPandas and are written FIRST; the
    postings rewrite kernel then side-input-reads the compacted doclens
    file covering its block (DoclensReader pattern, index.py) instead of
    a whole-corpus broadcast; corpus stats come from one distributed
    pass over the written doclens. Only the tombstone set is broadcast
    (O(deletes between compactions), not O(corpus)).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F811

    from . import kernels as K
    from .index import DoclensReader, scan_doclens_ranges

    idx = SearchIndex(spark, index_path, as_of=as_of)
    tomb = idx._tombstones()
    tomb_bc = spark.sparkContext.broadcast(tomb)

    from .indexing import (PARQUET_ROW_GROUP_BYTES, bounds_granularity,
                           write_postings_table, write_term_stats)

    n_parts = max(4, spark.sparkContext.defaultParallelism)

    # --- 1. compacted doclens (distributed, per block): later segs
    # override; a doc survives unless its newest row predates its newest
    # tombstone
    def compact_doclens(key, pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(key[0])
        ids = None
        rows = sorted(zip(pdf["seg"], pdf["doc_ids"], pdf["doc_lens"]),
                      key=lambda r: int(r[0]))
        for seg, ir, lr in rows:
            seg = int(seg)
            i = np.frombuffer(ir, dtype="<i8")
            ln = np.frombuffer(lr, dtype="<f4")
            if ids is None:
                ids, lens = i, ln
                segs = np.full(len(i), seg, dtype=np.int64)
                continue
            all_ids = np.union1d(ids, i)
            new_lens = np.empty(len(all_ids), dtype=np.float32)
            new_segs = np.full(len(all_ids), -1, dtype=np.int64)
            for src_ids, src_lens, src_seg in ((ids, lens, None), (i, ln, seg)):
                pos = np.searchsorted(src_ids, all_ids)
                pos_c = np.minimum(pos, len(src_ids) - 1)
                m = src_ids[pos_c] == all_ids
                new_lens[m] = src_lens[pos_c[m]]
                new_segs[m] = segs[pos_c[m]] if src_seg is None else src_seg
            ids, lens, segs = all_ids, new_lens, new_segs
        t_entry = tomb_bc.value.get(b)
        if t_entry is not None:
            t_ids, t_segs = t_entry
            pos = np.searchsorted(t_ids, ids)
            pos_c = np.minimum(pos, len(t_ids) - 1)
            hit = t_ids[pos_c] == ids
            dead = hit & (t_segs[pos_c] > segs)
            ids, lens = ids[~dead], lens[~dead]
        if not len(ids):
            return pd.DataFrame({
                "block_id": pd.Series([], dtype="int64"),
                "doc_ids": pd.Series([], dtype=object),
                "doc_lens": pd.Series([], dtype=object)})
        return pd.DataFrame({
            "block_id": [b],
            "doc_ids": [ids.astype("<i8").tobytes()],
            "doc_lens": [lens.astype("<f4").tobytes()]})

    dl_path = os.path.join(out_path, "doclens")
    idx.doclens.groupBy("block_id").applyInPandas(
        compact_doclens, "block_id long, doc_ids binary, doc_lens binary") \
        .repartitionByRange(n_parts, "block_id") \
        .sortWithinPartitions("block_id") \
        .write.mode("overwrite") \
        .option("parquet.block.size", str(PARQUET_ROW_GROUP_BYTES)) \
        .parquet(dl_path)

    # block->file map over the COMPACTED doclens (O(files) footer reads);
    # each rewrite task reads only the file(s) covering its block
    reader = DoclensReader(scan_doclens_ranges([(0, dl_path)]))

    # --- 2. postings rewrite: per (term, block) merge rows, drop
    # tombstoned docs, recompute df/tf_total/tf_max/dl_min
    out_schema = ("term string, block_id long, postings binary, df long, "
                  "tf_total long, tf_max long, dl_min long")

    def rewrite(key, pdf: pd.DataFrame) -> pd.DataFrame:
        term, block_id = key[0], int(key[1])
        t_entry = tomb_bc.value.get(block_id)
        parts = []
        for row in pdf.itertuples():
            arr = K.from_bytes(row.postings)
            if t_entry is not None:
                excl = t_entry[0][t_entry[1] > row.seg]
                if len(excl):
                    arr = K.exclude_keys(arr, excl)
            parts.append(arr)
        arr = K.or_merge(np.concatenate(parts)) if len(parts) > 1 else parts[0]
        if len(arr) == 0:
            return pd.DataFrame({
                "term": pd.Series([], dtype=object),
                "block_id": pd.Series([], dtype="int64"),
                "postings": pd.Series([], dtype=object),
                "df": pd.Series([], dtype="int64"),
                "tf_total": pd.Series([], dtype="int64"),
                "tf_max": pd.Series([], dtype="int64"),
                "dl_min": pd.Series([], dtype="int64"),
            })
        ids, tfs = K.termfreqs(arr)
        dl_raw = reader.get(block_id)
        dl_ids = np.frombuffer(dl_raw[0], dtype="<i8")
        dl_lens = np.frombuffer(dl_raw[1], dtype="<f4")
        dls = _lens_for_ids(dl_ids, dl_lens, ids)
        return pd.DataFrame({
            "term": [term], "block_id": [block_id],
            "postings": [K.to_bytes(arr)], "df": [int(len(ids))],
            "tf_total": [int(tfs.sum())], "tf_max": [int(tfs.max())],
            "dl_min": [int(dls.min())],
        })

    new_posts = idx.postings.groupBy("term", "block_id").applyInPandas(
        rewrite, out_schema)
    srg = write_postings_table(new_posts, os.path.join(out_path, "postings"),
                               n_parts)

    # --- 3. corpus stats + granularity: one distributed pass over the
    # small packed doclens table (O(partitions) rows to the driver)
    def _dl_stats(it):
        n = 0
        tot = 0.0
        mb = -1
        for pdf in it:
            for b, lr in zip(pdf["block_id"], pdf["doc_lens"]):
                ln = np.frombuffer(lr, dtype="<f4")
                n += len(ln)
                tot += float(ln.sum())
                mb = max(mb, int(b))
        yield pd.DataFrame({"n": [n], "tot": [tot], "mb": [mb]})

    parts = spark.read.parquet(dl_path).mapInPandas(
        _dl_stats, "n long, tot double, mb long").collect()
    num_docs = int(sum(r["n"] for r in parts))
    total_tokens = float(sum(r["tot"] for r in parts))
    max_block = max((r["mb"] for r in parts), default=-1)

    n_blocks = (max_block + 1) if max_block >= 0 else 1
    granularity = bounds_granularity(n_blocks)
    write_term_stats(spark.read.parquet(os.path.join(out_path, "postings")),
                     os.path.join(out_path, "term_stats"),
                     max(1, n_parts // 4), granularity)
    meta = dict(idx.meta)
    meta.update({
        "format_version": 4,
        "num_docs": num_docs,
        "total_tokens": total_tokens,
        "avg_doc_len": (total_tokens / num_docs) if num_docs else 0.0,
        "bounds_granularity": granularity,
        "postings_single_row_group": bool(srg),
        "compacted_from": index_path,
    })
    with open(os.path.join(out_path, "meta.json"), "w") as fh:
        json.dump(meta, fh, indent=2)
    return SearchIndex(spark, out_path)


def merge_indexes(spark: SparkSession, index_paths: Sequence[str],
                  out_path: str, allow_overlap: bool = False) -> SearchIndex:
    """Merge indexes with disjoint doc-id ranges into one index.

    All inputs must share tokenizer and docs_per_block. By default doc
    ids must be disjoint (the segment-append case). ``allow_overlap=True``
    merges indexes sharing doc ids (reference B5, PosnBitArray.merge,
    middle_out.py:394-408): a shared doc's positions UNION (the query
    kernel OR-merges posting words sharing a (doc, posn-block) header)
    and its doc length takes the max across inputs. Stats are EXACT in
    both modes (round 4; previously overlap merges double-counted
    df/tf_total until compaction): the overlap path recounts per
    (term, block) from the merged posting arrays — the same or_merge
    the query kernel applies — in one distributed pass, with doc
    lengths side-input-read from the merged doclens.
    """
    metas = []
    for p in index_paths:
        with open(os.path.join(p, "meta.json")) as fh:
            metas.append(json.load(fh))
        # merge unions BASE tables only; silently dropping an input's
        # pending deletes/updates would resurrect dead docs — fail fast
        if (os.path.isdir(os.path.join(p, "tombstones"))
                or os.path.isdir(os.path.join(p, "updates"))):
            raise ValueError(
                f"index {p} has pending tombstones/update segments; "
                f"compact_index it before merging")
    tokenizers_ = {m["tokenizer"] for m in metas}
    dpbs = {m["docs_per_block"] for m in metas}
    if len(tokenizers_) != 1 or len(dpbs) != 1:
        raise ValueError("indexes disagree on tokenizer or docs_per_block")

    from .indexing import (PARQUET_ROW_GROUP_BYTES, bounds_granularity,
                           write_postings_table, write_term_stats)

    os.makedirs(out_path, exist_ok=True)
    n_parts = max(4, spark.sparkContext.defaultParallelism)

    def union_of(table: str):
        df = None
        for p in index_paths:
            part = spark.read.parquet(os.path.join(p, table))
            df = part if df is None else df.unionByName(part)
        return df

    srg = write_postings_table(union_of("postings"),
                               os.path.join(out_path, "postings"), n_parts)
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
            if not allow_overlap:
                raise ValueError(
                    f"overlapping doc ids in block {int(key[0])} during merge "
                    "(pass allow_overlap=True to union shared docs)")
            # shared doc: positions union, doc_len = max across inputs
            starts = np.concatenate(([0], np.flatnonzero(np.diff(ids)) + 1))
            lens = np.maximum.reduceat(lens, starts)
            ids = ids[starts]
        return pd.DataFrame({"block_id": [int(key[0])],
                             "doc_ids": [ids.astype('<i8').tobytes()],
                             "doc_lens": [lens.astype('<f4').tobytes()]})

    union_of("doclens").groupBy("block_id").applyInPandas(
        _coalesce, "block_id long, doc_ids binary, doc_lens binary") \
        .repartitionByRange(n_parts, "block_id") \
        .sortWithinPartitions("block_id") \
        .write.mode("overwrite") \
        .option("parquet.block.size", str(PARQUET_ROW_GROUP_BYTES)) \
        .parquet(os.path.join(out_path, "doclens"))
    # recompute the per-term sketches from the merged postings metadata
    # (input sketches can't just union: granularities and group bounds
    # differ per input; one pass over the small per-(term, block)
    # columns rebuilds them exactly)
    merged_posts = spark.read.parquet(os.path.join(out_path, "postings"))
    max_block = merged_posts.agg(F.max("block_id")).collect()[0][0]
    granularity = bounds_granularity(int(max_block or 0) + 1)
    if allow_overlap:
        # shared docs make per-input df/tf_total rows double-count.
        # Recount EXACTLY per (term, block) from the posting arrays —
        # the same or_merge the query kernel applies — with doc lens
        # side-input-read from the merged doclens (no driver
        # materialization). One distributed pass; overlap merges only.
        from . import kernels as K
        from .index import DoclensReader, scan_doclens_ranges
        reader = DoclensReader(
            scan_doclens_ranges([(0, os.path.join(out_path, "doclens"))]))

        def recount(key, pdf: pd.DataFrame) -> pd.DataFrame:
            term, block_id = key[0], int(key[1])
            parts = [K.from_bytes(b) for b in pdf["postings"]]
            arr = (K.or_merge(np.concatenate(parts))
                   if len(parts) > 1 else parts[0])
            if not len(arr):
                return pd.DataFrame({
                    "term": pd.Series([], dtype=object),
                    "block_id": pd.Series([], dtype="int64"),
                    "df": pd.Series([], dtype="int64"),
                    "tf_total": pd.Series([], dtype="int64"),
                    "tf_max": pd.Series([], dtype="int64"),
                    "dl_min": pd.Series([], dtype="int64")})
            ids, tfs = K.termfreqs(arr)
            dl_raw = reader.get(block_id)
            dl_ids = np.frombuffer(dl_raw[0], dtype="<i8")
            dl_lens = np.frombuffer(dl_raw[1], dtype="<f4")
            dls = _lens_for_ids(dl_ids, dl_lens, ids)
            return pd.DataFrame({
                "term": [term], "block_id": [block_id],
                "df": [int(len(ids))], "tf_total": [int(tfs.sum())],
                "tf_max": [int(tfs.max())], "dl_min": [int(dls.min())]})

        exact = merged_posts.select("term", "block_id", "postings") \
            .groupBy("term", "block_id").applyInPandas(
                recount, "term string, block_id long, df long, "
                         "tf_total long, tf_max long, dl_min long")
        write_term_stats(exact, os.path.join(out_path, "term_stats"),
                         max(1, n_parts // 4), granularity)

        # corpus stats: one distributed pass over the packed doclens
        # (O(partitions) rows to the driver, not O(num_docs))
        def _dl_stats(it):
            n = 0
            tot = 0.0
            for pdf in it:
                for lr in pdf["doc_lens"]:
                    ln = np.frombuffer(lr, dtype="<f4")
                    n += len(ln)
                    tot += float(ln.sum())
            yield pd.DataFrame({"n": [n], "tot": [tot]})

        parts = spark.read.parquet(os.path.join(out_path, "doclens")) \
            .select("doc_lens").mapInPandas(
                _dl_stats, "n long, tot double").collect()
        num_docs = int(sum(r["n"] for r in parts))
        total_tokens = float(sum(r["tot"] for r in parts))
    else:
        write_term_stats(merged_posts, os.path.join(out_path, "term_stats"),
                         max(1, n_parts // 4), granularity)
        num_docs = sum(m["num_docs"] for m in metas)
        total_tokens = sum(m["total_tokens"] for m in metas)
    meta = dict(metas[0])
    meta.update({
        "format_version": 4,
        "num_docs": num_docs,
        "total_tokens": total_tokens,
        "avg_doc_len": (total_tokens / num_docs) if num_docs else 0.0,
        "bounds_granularity": granularity,
        "postings_single_row_group": bool(srg),
        "merged_from": list(index_paths),
    })
    with open(os.path.join(out_path, "meta.json"), "w") as fh:
        json.dump(meta, fh, indent=2)
    return SearchIndex(spark, out_path)
