"""Solr edismax emulation over SearchIndex fields.

Semantics ported from the reference (/root/reference/searcharray/solr.py):
- ``parse_min_should_match`` / ``parse_field_boosts``: verbatim semantics
  (oracle tests: /root/reference/test/test_solr.py:12-80).
- term-centric: per query term, dismax across fields
  (max + tie*(sum-max)); summed over terms; docs matching fewer than mm
  terms zeroed (solr.py:111-143).
- field-centric (fields tokenize the query differently): per field sum
  with per-field mm, then dismax across fields (solr.py:146-175).
- pf/pf2/pf3 re-rank phases: phrase/bigram/trigram scores added on docs
  already matching the main query (solr.py:178-248). (The reference's
  pf2 loop adds the final bigram score twice — a quirk we do not
  replicate; its tests only assert match sets.)
- ps/ps2/ps3 phrase-slop parameters (solr.py:258-260). The reference
  accepts them but never forwards them to score(); we actually apply
  them (documented divergence — strictly more useful).
- explain string (solr.py:251-355 returns (scores, explain)): pass
  ``return_explain=True`` to get (DataFrame, explain) with the
  reference's format ("(f:t^b | ...)~mm" etc.).

Spark-first: everything is sparse DataFrame algebra — one ``score_many``
kernel pass per field, then groupBy/agg combinators. No dense arrays, no
driver-side loops over docs.

``exact=True`` swaps the float32 kernel scorer for a JVM-side
double-precision BM25 expression over exact integer tfs (term df / doc
len / avgdl joined from the index tables) — bit-reproducible against an
ANSI-SQL oracle; used by the driver correctness gate.
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Union

from pyspark.sql import DataFrame, functions as F

from .index import SearchIndex
from .similarity import B as _B, K1 as _K1


def parse_min_should_match(num_clauses: int, spec: str) -> int:
    """Solr mm spec: int, negative int, percent, and n<spec chains."""

    def checked_int(value):
        try:
            return int(value)
        except ValueError:
            raise ValueError("Invalid 'mm' spec. Expecting an integer.")

    result = num_clauses
    spec = spec.strip()

    if "<" in spec:
        spec = re.sub(r"\s*<\s*", "<", spec)
        for s in spec.split():
            parts = s.split("<", 1)
            if len(parts) < 2:
                raise ValueError(
                    f"Invalid 'mm' spec: '{s}'. Expecting values before and after '<'")
            upper_bound = checked_int(parts[0])
            if num_clauses <= upper_bound:
                return result
            result = parse_min_should_match(num_clauses, parts[1])
        return result

    if "%" in spec:
        percent = checked_int(spec[:-1])
        calc = (result * percent) * (1 / 100)
        result = result + int(calc) if calc < 0 else int(calc)
    else:
        calc = checked_int(spec)
        result = result + calc if calc < 0 else calc

    return min(num_clauses, max(result, 0))


def parse_field_boosts(field_lists: List[str]) -> Dict[str, Optional[float]]:
    """Parse ["title^2", "body"] -> {"title": 2.0, "body": None}."""
    if not field_lists:
        return {}
    out: Dict[str, Optional[float]] = {}
    for field in field_lists:
        parts = re.split(r"\^", field)
        out[parts[0]] = None if len(parts) == 1 else float(parts[1])
    return out


def _listify(x):
    return x if isinstance(x, list) else [x]


def _exact_term_hits(idx: SearchIndex, toks: List[str], boost: float) -> DataFrame:
    """(token_idx, doc_id, score) with BM25 computed as a JVM-side DOUBLE
    expression over exact integer tfs — the oracle-reproducible scorer.
    idf/avgdl come from the index tables, so an ANSI-SQL oracle computing
    the same expression from raw tokens matches value-for-value.

    N, avgdl, and per-term df come from the LIVE driver stats
    (idx.num_docs / idx.avg_doc_len carry the exact delete/update patch;
    idx.docfreqs applies the exact lazy df corrections), so the exact
    path agrees with the kernel path at all times. Doc lengths are
    integer token counts, so these sums are exact in doubles and the
    values are bit-identical to an oracle aggregating raw tokens on a
    clean index."""
    spark = idx.spark
    hits = idx.score_many(toks).select("token_idx", "doc_id", "tf")
    dfs = idx.docfreqs(toks)
    toks_df = spark.createDataFrame(
        [(i, t, int(dfs[t])) for i, t in enumerate(toks)],
        "token_idx int, term string, df long")
    hits = hits.join(F.broadcast(toks_df), "token_idx") \
        .join(idx.docstats.select("doc_id", "doc_len"), "doc_id") \
        .withColumn("_n", F.lit(int(idx.num_docs)).cast("long")) \
        .withColumn("_avgdl", F.lit(float(idx.avg_doc_len)))
    idf = F.log(F.lit(1.0) + (F.col("_n") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    tfd = F.col("tf").cast("double")
    dl = F.col("doc_len").cast("double")
    score = idf * tfd / (tfd + F.lit(_K1) * (F.lit(1 - _B) + F.lit(_B) * dl / F.col("_avgdl")))
    return hits.select("token_idx", "doc_id", (score * F.lit(boost)).alias("score"))


def edismax(
    fields: Dict[str, SearchIndex],
    q: str,
    qf: Union[str, List[str]],
    mm: Optional[Union[str, int]] = None,
    pf: Optional[Union[str, List[str]]] = None,
    pf2: Optional[Union[str, List[str]]] = None,
    pf3: Optional[Union[str, List[str]]] = None,
    ps: int = 0,
    ps2: int = 0,
    ps3: int = 0,
    tie: float = 0.0,
    q_op: str = "OR",
    similarity=None,
    exact: bool = False,
    return_explain: bool = False,
):
    """edismax over per-field SearchIndexes sharing a doc_id space.

    Returns a sparse DataFrame (doc_id, score); docs with zero score are
    absent. With ``return_explain=True`` returns (DataFrame, explain str)
    in the reference's explain format. ``ps/ps2/ps3`` apply slop to the
    pf/pf2/pf3 phrase phases. ``exact=True`` scores in double precision
    via JVM SQL expressions (single-term queries only; see
    _exact_term_hits) instead of the float32 reference-identical kernel.
    """
    query_fields = parse_field_boosts(_listify(qf))
    phrase_fields = parse_field_boosts(_listify(pf)) if pf else {}
    bigram_fields = parse_field_boosts(_listify(pf2)) if pf2 else {}
    trigram_fields = parse_field_boosts(_listify(pf3)) if pf3 else {}
    if mm is None:
        mm = "1"
    if isinstance(mm, int):
        mm = f"{mm}"
    if q_op == "AND":
        mm = "100%"

    sim_by_field = similarity if isinstance(similarity, dict) else {
        f: similarity for f in query_fields}

    for f_name in query_fields:
        if f_name not in fields:
            raise ValueError(f"field {f_name!r} has no index")

    # tokenize the query per field with that field's tokenizer; decide
    # term- vs field-centric (same token count across fields?)
    search_terms: Dict[str, List[str]] = {}
    num_search_terms = 0
    term_centric = True
    for f_name in query_fields:
        toks = fields[f_name].tokenizer(q)
        search_terms[f_name] = toks
        if num_search_terms == 0:
            num_search_terms = len(toks)
        elif len(toks) != num_search_terms:
            term_centric = False

    # one kernel pass per field over all its query terms
    per_field_hits = {}
    for f_name, boost in query_fields.items():
        toks = search_terms[f_name]
        if not toks:
            continue
        idx = fields[f_name]
        boost_val = 1.0 if boost is None else boost
        if exact:
            hits = _exact_term_hits(idx, toks, boost_val)
            per_field_hits[f_name] = hits.select(
                F.lit(f_name).alias("field"), "token_idx", "doc_id", "score")
        else:
            hits = idx.score_many(toks, similarity=sim_by_field.get(f_name))
            per_field_hits[f_name] = hits.select(
                F.lit(f_name).alias("field"),
                "token_idx", "doc_id",
                (F.col("score") * F.lit(boost_val)).alias("score"),
            )

    def _boost_exp(boost):
        return f"{boost}" if boost is not None else "1"

    if not per_field_hits:
        spark = next(iter(fields.values())).spark
        out = spark.createDataFrame([], "doc_id long, score float")
        return (out, "") if return_explain else out

    all_hits = None
    for df in per_field_hits.values():
        all_hits = df if all_hits is None else all_hits.unionByName(df)

    if term_centric:
        min_match = parse_min_should_match(num_search_terms, spec=mm)
        # reference explain: "((f1:t^b | f2:t^b) ...)~mm" (solr.py:111-143)
        explain = "(" + " ".join(
            "(" + " | ".join(
                f"{f_name}:{search_terms[f_name][tp]}^{_boost_exp(query_fields[f_name])}"
                for f_name in per_field_hits) + ")"
            for tp in range(num_search_terms)) + f")~{min_match}"
        # per (doc, term): dismax over fields = max + tie*(sum - max)
        term_scores = all_hits.groupBy("doc_id", "token_idx").agg(
            F.max("score").alias("mx"), F.sum("score").alias("sm"))
        term_scores = term_scores.withColumn(
            "term_score", F.col("mx") + (F.col("sm") - F.col("mx")) * F.lit(tie))
        qf_scores = term_scores.groupBy("doc_id").agg(
            F.sum("term_score").alias("score"),
            F.countDistinct(F.when(F.col("term_score") > 0, F.col("token_idx")))
             .alias("n_matched"),
        ).filter(F.col("n_matched") >= min_match).drop("n_matched")
    else:
        # per field: sum term scores, per-field mm, then dismax over fields
        # reference explain: "((f:t1 f:t2)~mm)^b | ..." (solr.py:146-175)
        field_exps = []
        field_frames = []
        for f_name in per_field_hits:
            n_toks = len(search_terms[f_name])
            f_mm = min(parse_min_should_match(n_toks, spec=mm), n_toks)
            field_exps.append(
                "((" + " ".join(f"{f_name}:{t}" for t in search_terms[f_name])
                + f")~{f_mm})^{_boost_exp(query_fields[f_name])}")
            fs = per_field_hits[f_name].groupBy("doc_id").agg(
                F.sum("score").alias("field_score"),
                F.countDistinct(F.when(F.col("score") > 0, F.col("token_idx")))
                 .alias("n_matched"),
            ).filter(F.col("n_matched") >= f_mm).drop("n_matched")
            field_frames.append(fs)
        stacked = None
        for fs in field_frames:
            stacked = fs if stacked is None else stacked.unionByName(fs)
        qf_scores = stacked.groupBy("doc_id").agg(
            F.max("field_score").alias("mx"), F.sum("field_score").alias("sm"))
        qf_scores = qf_scores.select(
            "doc_id",
            (F.col("mx") + (F.col("sm") - F.col("mx")) * F.lit(tie)).alias("score"))
        explain = " | ".join(field_exps)

    qf_scores = qf_scores.filter(F.col("score") > 0)

    # --- phrase re-rank phases on main-query matches only ---
    phase_specs = []
    for fboosts, gram, slop in ((phrase_fields, 0, ps), (bigram_fields, 2, ps2),
                                (trigram_fields, 3, ps3)):
        for f_name, boost in fboosts.items():
            terms = search_terms.get(f_name) or fields[f_name].tokenizer(q)
            search_terms.setdefault(f_name, terms)
            if gram == 0:
                if len(terms) >= 2:
                    phase_specs.append((f_name, boost, [terms], slop))
                    explain += f' ({f_name}:"{" ".join(terms)}")^{_boost_exp(boost)}'
            else:
                if len(terms) >= gram:
                    grams = [list(g) for g in zip(*(terms[i:] for i in range(gram)))]
                    if grams:
                        phase_specs.append((f_name, boost, grams, slop))
                        explain += "".join(
                            f' ({f_name}:"{" ".join(g)}")^{_boost_exp(boost)}'
                            for g in grams)

    if phase_specs:
        candidates = qf_scores.select("doc_id")
        boost_frames = []
        for f_name, boost, token_groups, slop in phase_specs:
            idx = fields[f_name]
            ph = idx.score_many(token_groups, similarity=sim_by_field.get(f_name),
                                slop=slop)
            ph = ph.join(candidates, "doc_id", "left_semi")
            ph = ph.groupBy("doc_id").agg(
                (F.sum("score") * F.lit(1.0 if boost is None else boost))
                .alias("boost_score"))
            boost_frames.append(ph)
        boosts = None
        for bf in boost_frames:
            boosts = bf if boosts is None else boosts.unionByName(bf)
        boosts = boosts.groupBy("doc_id").agg(F.sum("boost_score").alias("boost_score"))
        qf_scores = qf_scores.join(boosts, "doc_id", "left").select(
            "doc_id",
            (F.col("score") + F.coalesce(F.col("boost_score"), F.lit(0.0)))
            .alias("score"))

    return (qf_scores, explain) if return_explain else qf_scores
