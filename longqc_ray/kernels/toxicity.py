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

def _nocase_ascii(word: str) -> str:
    """ASCII-only case-insensitive spelling: [bB][lL]... classes.

    Engine case-folding flags diverge on Unicode (RE2 ``(?i)`` and
    DuckDB ``lower()`` simple-fold U+212A KELVIN SIGN -> k and
    U+017F LONG S -> s; Python ``re.IGNORECASE|re.ASCII`` does not),
    so the shared pattern spells the fold out and uses NO flag —
    byte-identical matches under Python re, Arrow RE2 and DuckDB RE2.
    """
    return "".join(f"[{c}{c.upper()}]" if c.isalpha() else re.escape(c)
                   for c in word)


# One pattern string for all three engines. \b stays ASCII on every
# engine via re.ASCII on the Python side (RE2's \b is ASCII-only), so
# a lexicon word abutting a non-ASCII word character (e.g.
# "gorrafexé") counts identically everywhere.
TOXIC_PATTERN = (
    r"\b(?:" + "|".join(_nocase_ascii(w) for w in TOXIC_LEXICON) + r")\b"
)
TOXIC_RE = re.compile(TOXIC_PATTERN, re.ASCII)
TOXIC_RE2_PATTERN = TOXIC_PATTERN  # RE2-compatible verbatim


def toxic_hits(text: str) -> int:
    return len(TOXIC_RE.findall(text))


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
