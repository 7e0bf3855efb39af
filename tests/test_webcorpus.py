"""Deterministic web-corpus generator tests (FIXTURES.md F1):
byte-identical rows regardless of partitioning; html -> text extraction
round-trips byte-identically (the input_hint per-row invariant)."""
from searcharray_spark.webcorpus import extract_text_from_html, generate_corpus


def test_generation_deterministic_across_partitioning(spark):
    a = generate_corpus(spark, 3000, seed=7, chunk_size=500) \
        .orderBy("doc_id").collect()
    b = generate_corpus(spark, 3000, seed=7, chunk_size=500) \
        .repartition(13).orderBy("doc_id").collect()
    assert len(a) == len(b) == 3000
    for ra, rb in zip(a, b):
        assert ra == rb
    # url unique, lang constant
    assert len({r["url"] for r in a}) == 3000
    assert {r["lang"] for r in a} == {"en"}


def test_html_text_extraction_byte_identical(spark):
    df = generate_corpus(spark, 500, seed=11, chunk_size=250)
    out = extract_text_from_html(df).select("doc_id", "text", "extracted_text").collect()
    assert len(out) == 500
    for r in out:
        assert r["extracted_text"] == r["text"], r["doc_id"]


def test_zipf_hot_terms_present(spark):
    df = generate_corpus(spark, 2000, seed=42, chunk_size=500)
    from pyspark.sql import functions as F
    counts = dict(
        df.select(F.explode(F.split("text", " ")).alias("t"))
          .groupBy("t").count().orderBy(F.desc("count")).limit(3)
          .collect())
    # hottest term must be a common word with big skew (hot-term coverage)
    top = max(counts.values())
    assert top > 2000  # far more than one per doc
