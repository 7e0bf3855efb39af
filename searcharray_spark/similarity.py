"""Similarity (scoring) functions.

Same protocol and formulas as the reference (float32 arithmetic for
rank-and-score identity):

- protocol:  /root/reference/searcharray/similarity.py:8-16
- BM25:      /root/reference/searcharray/similarity.py:24-38 +
             /root/reference/searcharray/bm25/bm25.pyx:11-42
             (Lucene >= LUCENE-8563: no (k1+1) numerator; k1=1.2, b=0.75;
             raw float doc lens, NOT Lucene's quantized norms)
- golden values: /root/reference/test/test_similarity.py:16-49
"""
from __future__ import annotations

from typing import Callable, Protocol

import numpy as np


# default BM25 parameters (Lucene defaults; reference similarity.py:24)
K1 = 1.2
B = 0.75


class Similarity(Protocol):
    def __call__(self, term_freqs: np.ndarray, doc_freqs: np.ndarray,
                 doc_lens: np.ndarray, avg_doc_lens: float,
                 num_docs: int) -> np.ndarray: ...


def compute_idf(num_docs: int, dfs) -> np.float32:
    """idf = sum over query terms of ln(1 + (N - df + 0.5)/(df + 0.5))."""
    dfs = np.asarray(dfs, dtype=np.float32)
    return np.float32(np.sum(np.log(1 + (num_docs - dfs + 0.5) / (dfs + 0.5))))


def bm25_similarity(k1: float = 1.2, b: float = 0.75) -> Similarity:
    """Default Lucene-9 BM25: idf * tf / (tf + k1*(1 - b + b*dl/avgdl))."""
    k1_f = np.float32(k1)
    b_f = np.float32(b)
    one_minus_b = np.float32(1.0) - b_f

    def bm25(term_freqs, doc_freqs, doc_lens, avg_doc_lens, num_docs):
        tf = np.asarray(term_freqs, dtype=np.float32)
        if avg_doc_lens == 0:
            return np.zeros_like(tf)
        dl = np.asarray(doc_lens, dtype=np.float32)
        idf = compute_idf(num_docs, doc_freqs)
        avgdl = np.float32(avg_doc_lens)
        return (tf / (tf + (k1_f * (one_minus_b + (b_f * (dl / avgdl)))))) * idf

    # monotone increasing in tf, decreasing in dl: block-max WAND bounds
    # from (tf_max, dl_min) are sound (SearchIndex._block_bounds)
    bm25.monotone_bounds = True
    return bm25


def bm25_impact(k1: float = 1.2, b: float = 0.75) -> Similarity:
    """BM25 tf-part only (no idf) — for impact indexes / BM25F."""
    k1_f = np.float32(k1)
    b_f = np.float32(b)
    one_minus_b = np.float32(1.0) - b_f

    def impact(term_freqs, doc_freqs, doc_lens, avg_doc_lens, num_docs):
        tf = np.asarray(term_freqs, dtype=np.float32)
        if avg_doc_lens == 0:
            return np.zeros_like(tf)
        dl = np.asarray(doc_lens, dtype=np.float32)
        avgdl = np.float32(avg_doc_lens)
        return tf / (tf + (k1_f * (one_minus_b + (b_f * (dl / avgdl)))))

    impact.monotone_bounds = True
    return impact


def bm25_legacy_similarity(k1: float = 1.2, b: float = 0.75) -> Similarity:
    """BM25 prior to LUCENE-8563: (k1+1) numerator."""
    k1_f = np.float32(k1)
    b_f = np.float32(b)
    one_minus_b = np.float32(1.0) - b_f

    def bm25(term_freqs, doc_freqs, doc_lens, avg_doc_lens, num_docs):
        tf = np.asarray(term_freqs, dtype=np.float32)
        if avg_doc_lens == 0:
            return np.zeros_like(tf)
        dl = np.asarray(doc_lens, dtype=np.float32)
        idf = compute_idf(num_docs, doc_freqs)
        avgdl = np.float32(avg_doc_lens)
        tf_part = (tf * (k1_f + 1)) / (tf + (k1_f * (one_minus_b + (b_f * (dl / avgdl)))))
        return idf * tf_part

    bm25.monotone_bounds = True
    return bm25


def classic_similarity() -> Similarity:
    """Classic Lucene TF-IDF."""

    def classic(term_freqs, doc_freqs, doc_lens, avg_doc_lens, num_docs):
        """dfs SUM across query terms (reference similarity.py:80-84),
        idf = ln((N+1)/(sum_dfs+1)) + 1, sqrt tf, 1/sqrt(dl) norm."""
        tf = np.asarray(term_freqs, dtype=np.float32)
        sum_dfs = float(np.sum(np.asarray(doc_freqs, dtype=np.float32)))
        dl = np.asarray(doc_lens, dtype=np.float32)
        idf = np.log((num_docs + 1) / (sum_dfs + 1)) + 1.0
        length_norm = np.float32(1.0) / np.sqrt(dl, where=dl > 0, out=np.ones_like(dl))
        return np.float32(idf) * np.sqrt(tf) * length_norm

    classic.monotone_bounds = True
    return classic


default_bm25: Similarity = bm25_similarity()

SIMILARITY_REGISTRY: dict = {
    "bm25": bm25_similarity,
    "bm25_legacy": bm25_legacy_similarity,
    "bm25_impact": bm25_impact,
    "classic": classic_similarity,
}


def resolve(similarity) -> Similarity:
    if similarity is None:
        return default_bm25
    if callable(similarity):
        return similarity
    factory = SIMILARITY_REGISTRY.get(similarity)
    if factory is None:
        raise ValueError(f"unknown similarity {similarity!r}")
    return factory()
