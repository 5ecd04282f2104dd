"""Fuzzy (approximate) span matching — the edit-distance capability of
the reference's adapter trimmer (lq_adapt.py:10-78: edlib infix
alignment, identity >= 0.75) that exact regexes cannot express.

The scale kernel is Myers' 1999 bit-parallel approximate string
matching (public algorithm): semi-global Levenshtein of a <=64-char
pattern against a text, O(n) single-word bit ops per text. Here it is
additionally vectorized ACROSS a batch: all texts advance in lockstep
one character column at a time, every step a handful of uint64 numpy
ops over the whole batch — no per-row Python in the hot loop.

``edit_distance`` / ``best_window_brute`` are the slow reference twins
used by property tests to pin the bit-parallel kernel.
"""

from __future__ import annotations

import numpy as np


def edit_distance(a: str, b: str) -> int:
    """Plain O(nm) Levenshtein (test twin; DuckDB ``levenshtein``
    semantics)."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def best_window_brute(text: str, pattern: str) -> tuple[int, int]:
    """(best_ed, first 1-based end achieving it) by exhaustive DP —
    min over ALL substrings of Levenshtein(pattern, substring).
    Computed column-by-column with the semi-global recurrence
    (D[0][j] = 0), so it is the direct definitional twin of the Myers
    kernel."""
    m, n = len(pattern), len(text)
    col = np.arange(m + 1, dtype=np.int64)
    best, best_end = m, -1
    for j in range(1, n + 1):
        prev = col.copy()
        col[0] = 0
        for i in range(1, m + 1):
            col[i] = min(
                prev[i - 1] + (pattern[i - 1] != text[j - 1]),
                prev[i] + 1,
                col[i - 1] + 1,
            )
        if col[m] < best:
            best, best_end = int(col[m]), j
    return best, best_end


def myers_search_batch(
    texts: list[str], pattern: str
) -> tuple[np.ndarray, np.ndarray]:
    """Batched semi-global approximate search.

    Returns (best_ed, best_end) per text: the minimum Levenshtein
    distance of ``pattern`` to any substring, and the FIRST 1-based
    end position achieving it (-1 when the text is empty). Pattern
    must be 1..64 chars (one machine word — the reference's adapter
    probes are far shorter)."""
    m = len(pattern)
    if not 1 <= m <= 64:
        raise ValueError(f"pattern length {m} outside 1..64")
    peq = np.zeros(256, dtype=np.uint64)
    for i, c in enumerate(pattern.encode("utf-8", "replace")):
        peq[c] |= np.uint64(1) << np.uint64(i)

    enc = [t.encode("utf-8", "replace") for t in texts]
    lens = np.array([len(e) for e in enc], dtype=np.int64)
    n_docs = len(texts)
    width = int(lens.max()) if n_docs else 0
    if width == 0:
        return np.full(n_docs, m, np.int64), np.full(n_docs, -1, np.int64)
    mat = np.frombuffer(
        np.array(enc, dtype=f"S{width}").tobytes(), dtype=np.uint8
    ).reshape(n_docs, width)

    ones = ~np.uint64(0)
    Pv = np.full(n_docs, ones, dtype=np.uint64)
    Mv = np.zeros(n_docs, dtype=np.uint64)
    score = np.full(n_docs, m, dtype=np.int64)
    best = np.full(n_docs, m, dtype=np.int64)
    best_end = np.full(n_docs, -1, dtype=np.int64)
    high = np.uint64(1) << np.uint64(m - 1)
    one = np.uint64(1)
    with np.errstate(over="ignore"):
        for j in range(width):
            Eq = peq[mat[:, j]]
            Xv = Eq | Mv
            Xh = (((Eq & Pv) + Pv) ^ Pv) | Eq
            Ph = Mv | ~(Xh | Pv)
            Mh = Pv & Xh
            score += ((Ph & high) != 0).astype(np.int64)
            score -= ((Mh & high) != 0).astype(np.int64)
            Ph <<= one
            Mh <<= one
            Pv = Mh | ~(Xv | Ph)
            Mv = Ph & Xv
            # padded columns past a text's end must not update its best
            better = (j < lens) & (score < best)
            best_end[better] = j + 1
            best[better] = score[better]
    return best, best_end
