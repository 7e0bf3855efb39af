"""Tokenizers — the same contract as the reference: ``str -> List[str]``.

Applied identically at index time (inside Arrow-batched pandas UDFs) and at
query time (driver side). Byte-identical outputs to the reference tokenizers:

- ws:        /root/reference/searcharray/postings.py:206-211
- web:       /root/reference/test/tokenizers.py:1-11
- ws_punc:   /root/reference/test/test_msmarco.py:24-27

Tokenizers are registered by name so they serialize into Spark closures as a
small string and re-resolve on executors (spark-submit --py-files friendly).
"""
from __future__ import annotations

import string
from typing import Callable, List

_FOLD_TO_ASCII = {ord(x): ord(y) for x, y in zip("‘’´“”–-", "'''\"\"--")}
_PUNCT_TO_SPACE = {ord(c): " " for c in string.punctuation}
_WEB_TRANS = {**_FOLD_TO_ASCII, **_PUNCT_TO_SPACE}


def ws_tokenizer(text) -> List[str]:
    """Default whitespace tokenizer; None/NaN -> []."""
    if text is None or (isinstance(text, float) and text != text):
        return []
    return text.split()


def ws_lowercase_tokenizer(text) -> List[str]:
    if text is None or (isinstance(text, float) and text != text):
        return []
    return text.lower().split()


def web_tokenizer(text) -> List[str]:
    """ASCII-fold smart quotes/dashes, punctuation -> space, lowercase, split."""
    if text is None or (isinstance(text, float) and text != text):
        return []
    return text.translate(_WEB_TRANS).lower().split()


def ws_punc_tokenizer(text) -> List[str]:
    """Lowercase, whitespace split, strip punctuation per token."""
    if text is None or (isinstance(text, float) and text != text):
        return []
    return [tok.translate(str.maketrans("", "", string.punctuation))
            for tok in text.lower().split()]


REGISTRY: dict = {
    "ws": ws_tokenizer,
    "ws_lower": ws_lowercase_tokenizer,
    "web": web_tokenizer,
    "ws_punc": ws_punc_tokenizer,
}


def resolve(tokenizer) -> Callable[[str], List[str]]:
    """Resolve a tokenizer name or pass through a callable."""
    if callable(tokenizer):
        return tokenizer
    try:
        return REGISTRY[tokenizer]
    except KeyError:
        raise ValueError(f"unknown tokenizer {tokenizer!r}; known: {sorted(REGISTRY)}")


def name_of(tokenizer) -> str:
    for name, fn in REGISTRY.items():
        if fn is tokenizer or tokenizer == name:
            return name
    raise ValueError("custom tokenizers must be registered in REGISTRY to be persisted")
