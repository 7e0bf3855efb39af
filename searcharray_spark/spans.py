"""Sloppy-phrase (proximity span) matching — phase-4 kernel.

Reference semantics: /root/reference/searcharray/phrase/spans.py +
roaringish/spans.pyx — count minimal spans containing all phrase terms
within width <= n_terms + slop. Invariants (test_phrase_matches.py:206-221):
slop-k matches are a superset of slop-(k-1), freqs monotone in slop.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np


def span_freqs(encoded: List[np.ndarray], slop: int) -> Tuple[np.ndarray, np.ndarray]:
    raise NotImplementedError("slop > 0 span matching lands in phase 4")
