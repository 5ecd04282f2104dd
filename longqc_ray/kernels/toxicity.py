"""Toxicity lexicon classifier.

The graft analogue of LongQC's spike-in control filter: the reference
maps sampled reads against bundled control references and drops any
read whose covered fraction is >= 0.5 (/root/reference/
lq_coverage.py:104-107, minimap2-coverage.c:586-601). Here the
"control reference" is a small lexicon of (synthetic, non-offensive
placeholder) terms; membership => drop. The lexicon is the broadcast
small side of an anti-join, exactly like the control-hit name set.
"""

from __future__ import annotations

import re

# Deliberately synthetic placeholder terms (no real slurs in a test
# corpus); the classifier's contract is whole-word case-insensitive
# membership, mirroring frac>=0.5 membership in the reference.
TOXIC_LEXICON: tuple[str, ...] = (
    "gorrafex",
    "blasturk",
    "snivmork",
    "craventhul",
    "mudgeworth",
    "fexwardle",
    "drubnickle",
    "vilethorp",
)

# re.ASCII pins Python's \b to RE2's byte/ASCII word-boundary
# semantics: without it a lexicon word abutting a non-ASCII word
# character (e.g. "gorrafexé") counts 0 under Python (é is \w, no
# boundary) but 1 under the RE2 column kernel and the DuckDB oracle.
# The column kernel and the oracle share RE2, so the per-row twin
# conforms to THEM.
TOXIC_RE = re.compile(
    r"\b(" + "|".join(TOXIC_LEXICON) + r")\b", re.IGNORECASE | re.ASCII
)


def toxic_hits(text: str) -> int:
    return len(TOXIC_RE.findall(text))


# RE2 spelling of TOXIC_RE for Arrow's count_substring_regex (inline
# (?i) instead of re.IGNORECASE; the pattern body is RE2-compatible —
# plain alternation + \b, same as the DuckDB oracle's regexp spec).
TOXIC_RE2_PATTERN = r"(?i)\b(" + "|".join(TOXIC_LEXICON) + r")\b"


def toxic_hits_column(col):
    """Whole-column toxic-term match count (int64 ndarray) — one RE2
    pass instead of one Python ``findall`` per row; equal to
    ``toxic_hits`` per row (asserted in tests)."""
    import numpy as np
    import pyarrow.compute as pc

    return (
        pc.count_substring_regex(col, TOXIC_RE2_PATTERN)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
