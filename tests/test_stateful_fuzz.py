"""Stateful maintenance fuzz: random delete / update / compact / reopen
sequences against a model corpus.

The model is a plain dict {doc_id: text}. After every operation the
engine must agree with the model on: live num_docs, avg_doc_len, per-term
df, termfreqs, and (after the exact-stats round-4 work) BM25 scores equal
to a fresh build of the model corpus — the strongest invariant, since a
fresh build IS the model.
"""
import numpy as np
import pytest

from searcharray_spark import build_index
from searcharray_spark.merge import compact_index

VOCAB = ["foo", "bar", "baz", "qux", "data", "bunny", "wunny", "zap"]


def _rand_text(rng):
    n = int(rng.integers(1, 9))
    return " ".join(rng.choice(VOCAB, n))


def _model_df(model, term):
    return sum(1 for t in model.values() if term in t.split())


def _model_tfs(model, term):
    out = {}
    for d, t in model.items():
        c = t.split().count(term)
        if c:
            out[d] = c
    return out


@pytest.mark.parametrize("seed", [11, 29, 47])
def test_maintenance_sequences_match_model(spark, tmp_path, seed):
    rng = np.random.default_rng(seed)
    n0 = 24
    model = {i: _rand_text(rng) for i in range(n0)}
    df = spark.createDataFrame(list(model.items()), "doc_id long, text string")
    idx = build_index(spark, df, str(tmp_path / "idx"), doc_id_col="doc_id",
                      docs_per_block=8)

    compacts = 0
    for step in range(7):
        op = rng.choice(["delete", "update", "reopen", "compact"],
                        p=[0.35, 0.35, 0.2, 0.1])
        live = sorted(model)
        if op == "delete" and live:
            k = int(rng.integers(1, 4))
            victims = [int(d) for d in rng.choice(live, min(k, len(live)),
                                                  replace=False)]
            idx.delete_docs(victims + victims[:1])  # dup id: idempotence
            for d in victims:
                model.pop(d)
        elif op == "update":
            # mix of replacing a live doc, resurrecting a dead one, and
            # re-updating an already-updated one
            targets = [int(d) for d in rng.choice(n0, int(rng.integers(1, 4)),
                                                  replace=False)]
            rows = [(d, _rand_text(rng)) for d in targets]
            idx.update_docs(spark.createDataFrame(
                rows, "doc_id long, text string"))
            for d, t in rows:
                model[d] = t
        elif op == "reopen":
            from searcharray_spark.index import SearchIndex
            idx = SearchIndex(spark, idx.path)
        else:
            compacts += 1
            idx = compact_index(spark, idx.path,
                                str(tmp_path / f"cmp{compacts}"))

        # --- invariants vs the model ---
        assert idx.num_docs == len(model), (seed, step, op)
        total = float(sum(len(t.split()) for t in model.values()))
        assert idx.avg_doc_len == pytest.approx(
            total / len(model) if model else 0.0), (seed, step, op)
        for term in ["foo", "bar", "zap"]:
            assert idx.docfreq(term) == _model_df(model, term), \
                (seed, step, op, term)
            got = {r["doc_id"]: int(r["tf"])
                   for r in idx.termfreqs(term).collect()}
            assert got == _model_tfs(model, term), (seed, step, op, term)

    # end-state: scores equal a fresh build of the model corpus
    fresh = build_index(
        spark, spark.createDataFrame(list(model.items()),
                                     "doc_id long, text string"),
        str(tmp_path / "fresh"), doc_id_col="doc_id", docs_per_block=8)
    for term in ["foo", "bar", "zap"]:
        live_scores = {r["doc_id"]: r["score"]
                       for r in idx.score(term).collect()}
        fresh_scores = {r["doc_id"]: r["score"]
                        for r in fresh.score(term).collect()}
        assert live_scores == fresh_scores, (seed, term)
