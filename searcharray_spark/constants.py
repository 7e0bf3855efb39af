"""Layout constants for the packed posting encoding.

Mirrors the semantics of the reference's "roaringish" layout
(/root/reference/searcharray/roaringish/roaringish.py:30-35): each posting
entry is one uint64 word:

    | 28 bits key (doc id within block) | 18 bits posn-block (posn // 18) |
    | 18 bits payload bitmask (bit b set <=> posn == 18*posn_block + b) |

Words are sorted ascending, so postings are ordered by (doc, posn block).
The ``header`` (key | posn-block, top 46 bits) identifies one 18-position
span of one document.
"""
from __future__ import annotations

import numpy as np

KEY_BITS = np.uint64(28)
PAYLOAD_MSB_BITS = np.uint64(18)
PAYLOAD_LSB_BITS = np.uint64(18)

_1 = np.uint64(1)
_0 = np.uint64(0)

PAYLOAD_LSB_MASK = np.uint64((1 << 18) - 1)
PAYLOAD_MSB_MASK = np.uint64(((1 << 18) - 1) << 18)
KEY_MASK = np.uint64(((1 << 28) - 1) << 36)
HEADER_MASK = np.uint64(KEY_MASK | PAYLOAD_MSB_MASK)

KEY_SHIFT = np.uint64(36)
MSB_SHIFT = np.uint64(18)

# Max storable position: the reference caps the position VALUE at 18 bits
# (max_payload = 2**18 - 1, /root/reference/searcharray/roaringish/
# roaringish.py:86 via phrase/middle_out.py:41).
MAX_POSN = (1 << 18) - 1  # 262143

# Default documents per doc-id block (Spark partition of the doc axis).
# Local doc ids within a block must fit in KEY_BITS (28). Small enough
# that one block's full posting data stays well under parquet scan
# partition size (zero-shuffle phrase path needs whole blocks per scan
# partition) and the per-block build kernel stays memory-bounded.
DEFAULT_DOCS_PER_BLOCK = 1 << 16

ADJ_BIT = np.uint64(1) << np.uint64(17)  # top bit of the LSB payload
