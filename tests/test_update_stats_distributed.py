"""update_docs' distributed live-stats path (_live_stats_for) must
agree exactly with the driver-side _live_lens math it replaced, under
deletes, prior updates, and missing ids."""
import numpy as np
import pytest

import searcharray_spark as sa


@pytest.fixture()
def idx(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"w{i % 11} common text a{i}") for i in range(800)],
        "doc_id long, text string")
    idx = sa.build_index(spark, docs, str(tmp_path / "idx"),
                         doc_id_col="doc_id", docs_per_block=64)
    return idx


def _old_style(idx, ids):
    live, lens = idx._live_lens(np.asarray(ids, dtype=np.int64))
    return int(live.sum()), float(lens[live].sum())


def test_live_stats_matches_live_lens(idx, spark):
    ids = [0, 5, 63, 64, 200, 799, 1234]  # 1234 doesn't exist
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    n_ids, live_n, live_sum = idx._live_stats_for(docs)
    want = _old_style(idx, ids)
    assert n_ids == len(ids)
    assert live_n == want[0]
    assert live_sum == pytest.approx(want[1], abs=1e-6)


def test_live_stats_after_delete_and_update(idx, spark):
    idx.delete_docs([5, 200])
    upd = spark.createDataFrame(
        [(63, "replaced much longer text with many more tokens here")],
        "doc_id long, text string")
    idx.update_docs(upd)
    ids = [0, 5, 63, 200, 799]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    n_ids, live_n, live_sum = idx._live_stats_for(docs)
    want = _old_style(idx, ids)
    assert n_ids == len(ids)
    assert live_n == want[0]          # deleted docs not live
    assert live_sum == pytest.approx(want[1], abs=1e-6)


def test_mass_update_stats_exact(idx, spark):
    """Bulk update through the distributed path keeps corpus stats equal
    to a from-scratch recount."""
    n_upd = 400
    upd = spark.createDataFrame(
        [(i, "xx yy zz") for i in range(0, n_upd)],
        "doc_id long, text string")
    idx.update_docs(upd)
    # expected: untouched docs keep 4 tokens, updated docs have 3
    want_tokens = (800 - n_upd) * 4 + n_upd * 3
    assert idx.num_docs == 800
    assert idx.total_tokens == pytest.approx(want_tokens, abs=1e-6)
    # and the live lengths visible to queries agree
    lens = {r["doc_id"]: r["doc_len"]
            for r in idx.doclengths().collect()}
    assert len(lens) == 800
    assert sum(lens.values()) == pytest.approx(want_tokens, abs=1e-6)
