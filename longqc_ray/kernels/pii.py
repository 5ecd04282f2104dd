"""PII scrub patterns + scrubber.

The graft analogue of LongQC's adapter trimming (`cut_adapter`,
/root/reference/lq_adapt.py:80-103): instead of edlib-aligning adapter
sequences against read termini and truncating, we regex-match PII
spans anywhere in the transcript and replace them with placeholder
tokens, emitting per-row scrub stats (span count, chars removed) the
way the reference accumulates max-identity / trimmed-count / cut
positions (longQC.py:286-292, 348-357).

The patterns are deliberately RE2-compatible (no lookaround) so the
same pattern strings run verbatim in DuckDB `regexp_replace` for the
oracle-SQL correctness check.
"""

from __future__ import annotations

import re

# (name, pattern, replacement) applied in this exact order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}", "<PHONE>"),
)

# re.ASCII pins Python's \b/\d to RE2's ASCII semantics: the column
# kernel (Arrow RE2) and the DuckDB oracle agree with each other by
# construction, so the per-row twin conforms to them — without the
# flag a Unicode digit or a non-ASCII word char adjacent to a span
# (e.g. "123-45-6789é") diverges between the engines.
_COMPILED = tuple(
    (name, re.compile(pat, re.ASCII), rep) for name, pat, rep in PII_PATTERNS
)


def scrub_text(text: str) -> tuple[str, int]:
    """Return (scrubbed_text, n_spans_removed)."""
    total = 0
    for _name, rx, rep in _COMPILED:
        text, n = rx.subn(rep, text)
        total += n
    return text, total


def scrub_column(col):
    """Whole-COLUMN scrub: sequential pattern application in Arrow's
    RE2 (`pc.count_substring_regex` on the current text, then
    `pc.replace_substring_regex`) — the patterns are RE2-compatible by
    construction (shared verbatim with the DuckDB oracle), so output
    is bit-identical to the per-row ``scrub_text`` loop (asserted in
    tests) with the whole column scrubbed in C++ instead of one Python
    ``re.subn`` call per (row, pattern). Returns
    (scrubbed_string_array, n_spans int64 ndarray)."""
    import numpy as np
    import pyarrow.compute as pc

    cur = col
    total = np.zeros(len(col), dtype=np.int64)
    for _name, pat, rep in PII_PATTERNS:
        total += pc.count_substring_regex(cur, pat).to_numpy(zero_copy_only=False)
        cur = pc.replace_substring_regex(cur, pattern=pat, replacement=rep)
    return cur, total
