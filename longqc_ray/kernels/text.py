"""Transcript text kernels: repetition mask, n-gram hashing, tokenizing.

The repetition mask re-expresses LongQC's SDUST low-complexity masking
(/root/reference/sdust.c:136-177: 64 bp window over 3-mers, score
sum(c*(c-1)/2)/(L-k) vs threshold) for transcript text. The per-row
summary mirrors the 6-column sdust table (sdust.c:203-218,
README.md:139-145).
"""

from __future__ import annotations

import re

import numpy as np

WORD_RE = re.compile(r"\w+", re.UNICODE)

# BPE-ish subword splitter for token counting: words, numbers,
# punctuation runs (public GPT-2-style pre-tokenizer shape, simplified).
BPE_ISH_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]+")


def repetition_score_window(counts: np.ndarray, window_len: int, k: int) -> float:
    """SDUST-style score: sum c*(c-1)/2 over k-gram counts / (L-k)."""
    denom = max(window_len - k, 1)
    return float(np.sum(counts * (counts - 1) / 2.0)) / denom


def repetition_mask(
    text: str,
    k: int = 3,
    window: int = 64,
    threshold: float = 1.5,
) -> tuple[float, int, int]:
    """Low-complexity mask over character k-grams.

    Slides windows of ``window`` chars with stride ``window // 2``; a
    window whose SDUST-style score exceeds ``threshold`` is masked in
    full; masked regions are the union of masked windows.

    Returns (masked_frac, masked_chars, total_chars) — the per-row
    summary columns of the sdust table (sdust.c:211-217).
    """
    n = len(text)
    if n < k:
        return 0.0, 0, n
    a = np.frombuffer(text.encode("utf-8", "replace"), dtype=np.uint8)
    m = a.size
    if m < k:
        return 0.0, 0, n
    # rolling k-gram ids over bytes (k<=3 fits in int32 space via int64)
    ids = np.zeros(m - k + 1, dtype=np.int64)
    for j in range(k):
        ids = ids * 256 + a[j : m - k + 1 + j]
    stride = max(window // 2, 1)
    masked = np.zeros(m, dtype=bool)
    start = 0
    while True:
        end = min(start + window, m)
        wlen = end - start
        if wlen >= k:
            sl = ids[start : end - k + 1]
            _, counts = np.unique(sl, return_counts=True)
            if repetition_score_window(counts.astype(np.float64), wlen, k) > threshold:
                masked[start:end] = True
        if end >= m:
            break
        start += stride
    masked_chars = int(masked.sum())
    return masked_chars / m, masked_chars, n


def repetition_mask_batch(
    texts: list[str],
    k: int = 3,
    window: int = 64,
    threshold: float = 1.5,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Whole-batch twin of ``repetition_mask`` — identical outputs
    (asserted in tests), ~4× faster on transcript-sized docs.

    Instead of one ``np.unique`` call per (doc, window), ALL windows in
    the batch become rows of one padded id matrix; the SDUST pair count
    sum c·(c−1)/2 equals the number of equal-ordered pairs in each
    sorted row, computed as a run-position sum (one ``np.sort`` +
    a width-bounded vector loop). Pads are globally-unique negatives,
    so they add zero pairs. The pair count is an exact integer, so
    score = pairs / (wlen − k) is bit-identical to the per-doc kernel's
    float sum (every addend is an exactly-representable half-integer).
    The matrix is processed in ≤16k-window chunks so no multi-MB fresh
    intermediate leaves the allocator's reused arenas."""
    n_docs = len(texts)
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)
    masked_frac = np.zeros(n_docs)
    masked_chars = np.zeros(n_docs, dtype=np.int64)
    if n_docs == 0:
        return masked_frac, masked_chars, n_chars
    enc = [t.encode("utf-8", "replace") for t in texts]
    lens = np.array([len(e) for e in enc], dtype=np.int64)
    ok = lens >= k
    if not ok.any():
        return masked_frac, masked_chars, n_chars
    blob = np.frombuffer(b"".join(enc), dtype=np.uint8)
    doc_off = np.concatenate([[0], np.cumsum(lens)])
    m_total = blob.size
    gid = np.zeros(m_total - k + 1, dtype=np.int64)
    for j in range(k):
        gid = gid * 256 + blob[j : m_total - k + 1 + j]

    stride = max(window // 2, 1)
    # windows per doc replicating the per-doc loop: starts on the
    # stride grid; the last start is the first with start+window >= m,
    # so every window of an ok doc has wlen >= stride+1 >= k
    extra = np.maximum(lens - window, 0)
    n_win_doc = np.where(ok, (extra + stride - 1) // stride + 1, 0).astype(np.int64)
    tot = int(n_win_doc.sum())
    doc_idx = np.repeat(np.arange(n_docs), n_win_doc)
    first = np.concatenate([[0], np.cumsum(n_win_doc)[:-1]])
    win_ord = np.arange(tot) - np.repeat(first, n_win_doc)
    ws = win_ord * stride
    we = np.minimum(ws + window, lens[doc_idx])
    wlen = we - ws
    n_ids = wlen - k + 1
    wk = window - k + 1

    pairs = np.empty(tot, dtype=np.int64)
    col = np.arange(wk, dtype=np.int64)[None, :]
    chunk = max(16384 // max(wk, 1) * 64, 1024)  # ~16k rows per chunk
    for c0 in range(0, tot, chunk):
        c1 = min(c0 + chunk, tot)
        g0 = (doc_off[doc_idx[c0:c1]] + ws[c0:c1])[:, None]
        valid = col < n_ids[c0:c1, None]
        pos = np.minimum(g0 + col, m_total - k)
        mat = gid[pos]
        pad = -(np.arange(c0, c1, dtype=np.int64)[:, None] * wk + col + 1)
        mat = np.where(valid, mat, pad)
        s = np.sort(mat, axis=1)
        eq = s[:, 1:] == s[:, :-1]
        run = np.zeros(c1 - c0, dtype=np.int64)
        acc = np.zeros(c1 - c0, dtype=np.int64)
        for j in range(wk - 1):
            run = (run + 1) * eq[:, j]
            acc += run
        pairs[c0:c1] = acc

    score = pairs / np.maximum(wlen - k, 1)
    masked_w = score > threshold
    if masked_w.any():
        di = doc_idx[masked_w]
        s_ = ws[masked_w]
        e_ = we[masked_w]
        big = np.int64(1) << 32
        base = di * big
        accm = np.maximum.accumulate(e_ + base)
        prev = np.concatenate([[np.int64(-1)], accm[:-1]]) - base
        prev = np.maximum(prev, 0)
        contrib = np.maximum(0, e_ - np.maximum(s_, prev))
        masked_chars = np.bincount(di, weights=contrib, minlength=n_docs).astype(np.int64)
        masked_frac = np.where(lens > 0, masked_chars / np.maximum(lens, 1), 0.0)
    return masked_frac, masked_chars, n_chars


def fnv1a_64(data: bytes) -> int:
    """FNV-1a 64-bit hash (public domain algorithm)."""
    h = 0xCBF29CE484222325
    for byte in data:
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def char_ngram_buckets(text: str, ns: tuple[int, ...] = (2, 3), n_buckets: int = 1 << 16) -> np.ndarray:
    """Hashed character n-gram bucket ids for a text (lowercased).

    Used by both langid training and scoring; the bucket function is
    part of the model spec so it lives here once.
    """
    t = text.lower()
    b = t.encode("utf-8", "replace")
    out = []
    for n in ns:
        if len(b) < n:
            continue
        for i in range(len(b) - n + 1):
            out.append(fnv1a_64(b[i : i + n]) % n_buckets)
    return np.asarray(out, dtype=np.int64)


_FNV_BASIS = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)

# Second independent 64-bit fold for 128-bit content fingerprints:
# same xor-then-multiply shape with a DIFFERENT offset basis (the
# standard basis byte-rotated) and a different odd multiplier (the
# public MurmurHash2 constant). Content dedup groups on BOTH folds —
# a silent merge needs a simultaneous collision in two unrelated
# 64-bit hashes (~2^-128 per pair), fine past 10^12 rows. Plain
# FNV-64 stays in use for sampling priorities / partition hashing,
# where a collision only perturbs a sample or a partition choice.
FNV2_BASIS = np.uint64(0x84222325CBF29CE4)
FNV2_PRIME = np.uint64(0xC6A4A7935BD1E995)


def _fnv1a_64_np(windows: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a over rows of a (m, n) uint8 window matrix.

    uint64 arithmetic wraps mod 2^64 in numpy, matching the pure-Python
    ``fnv1a_64`` bit-for-bit (asserted in tests).
    """
    h = np.full(windows.shape[0], _FNV_BASIS, dtype=np.uint64)
    for j in range(windows.shape[1]):
        h ^= windows[:, j].astype(np.uint64)
        with np.errstate(over="ignore"):
            h = h * _FNV_PRIME
    return h


def fnv1a_64_varlen_np(
    mat: np.ndarray,
    lens: np.ndarray,
    basis: np.uint64 = _FNV_BASIS,
    prime: np.uint64 = _FNV_PRIME,
) -> np.ndarray:
    """Vectorized FNV-1a over rows of a zero-PADDED (m, n) uint8 matrix
    where row i's true byte length is ``lens[i]`` — each row's hash is
    snapshotted at its own length, so padding never feeds the hash.

    ``_fnv1a_64_np`` hashes every column including padding, which makes
    a short row's hash depend on the batch's max width (fine for the
    fixed-width n-gram windows it was built for, wrong for variable-
    length keys: the same word/value would hash differently across
    batches). Row hashes equal ``fnv1a_64`` of the unpadded bytes
    bit-for-bit (asserted in tests). ``basis``/``prime`` select the
    fold family (default FNV-1a; FNV2_* for the second fingerprint
    fold)."""
    h = np.full(mat.shape[0], basis, dtype=np.uint64)
    out = np.full(mat.shape[0], basis, dtype=np.uint64)  # len-0 rows
    with np.errstate(over="ignore"):
        for j in range(mat.shape[1]):
            h ^= mat[:, j].astype(np.uint64)
            h = h * prime
            done = lens == j + 1
            if done.any():
                out[done] = h[done]
    return out


def fnv1a_64_strs(
    strs: list[str],
    basis: np.uint64 = _FNV_BASIS,
    prime: np.uint64 = _FNV_PRIME,
) -> np.ndarray:
    """uint64 FNV-1a per string (UTF-8 bytes), batch-vectorized via the
    length-aware padded-matrix kernel. Batch-width invariant: a string
    hashes identically regardless of which batch it appears in."""
    if not strs:
        return np.empty(0, dtype=np.uint64)
    enc = [s.encode("utf-8", "replace") for s in strs]
    lens = np.array([len(e) for e in enc], dtype=np.int64)
    width = max(int(lens.max()), 1)
    mat = np.frombuffer(
        np.array(enc, dtype=f"S{width}").tobytes(), dtype=np.uint8
    ).reshape(len(enc), width)
    return fnv1a_64_varlen_np(mat, lens, basis=basis, prime=prime)


def _arrow_flat_bytes(col) -> tuple[np.ndarray, np.ndarray, int]:
    """(flat_bytes, offsets, n) zero-copy views of an Arrow
    string/binary array's value buffer — offsets rebased to 0."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    # Fail LOUDLY on nullable input: buffer-level hashing reads a null
    # slot as its (empty) value range, so a NULL would silently hash —
    # and dedup-group — identically to '' while the DuckDB twin
    # (encode(NULL) -> NULL) groups NULLs separately. Callers must
    # fill or drop nulls explicitly before hashing.
    if col.null_count:
        raise ValueError(
            f"_arrow_flat_bytes: column has {col.null_count} nulls; "
            "buffer-level hashing would silently alias NULL to '' — "
            "fill_null/drop nulls explicitly first"
        )
    big = pa.types.is_large_string(col.type) or pa.types.is_large_binary(col.type)
    dt = np.int64 if big else np.int32
    offs = np.frombuffer(col.buffers()[1], dtype=dt)[
        col.offset : col.offset + n + 1
    ].astype(np.int64)
    buf = (
        np.frombuffer(col.buffers()[2], dtype=np.uint8)[offs[0] : offs[-1]]
        if col.buffers()[2] is not None
        else np.empty(0, dtype=np.uint8)
    )
    return buf, offs - offs[0], n


# public alias: the zero-copy (flat_bytes, offsets, n) view is the
# repo-wide idiom for slicing binary payload columns (features stage,
# container audit, whole-file ingest) — one implementation, so the
# int32-vs-int64 offset handling can never diverge between sites
arrow_flat_bytes = _arrow_flat_bytes


def fnv1a_64_arrow(
    col,
    basis: np.uint64 = _FNV_BASIS,
    prime: np.uint64 = _FNV_PRIME,
    chunk: int = 65536,
) -> np.ndarray:
    """uint64 FNV-1a per value of an Arrow string/binary array,
    hashed STRAIGHT from the array's flat value buffer (no per-row
    ``str``/``encode`` round-trip — that Python encode step is ~2× the
    cost of the fold itself; measured 7.7× over a per-row zlib.crc32
    loop incl. its to_pylist on 1M keys). Row hashes equal
    ``fnv1a_64_strs`` bit-for-bit (asserted in tests). Processes in
    ≤``chunk``-row gathers so the padded matrix stays a small reused
    temporary (first-touch page-fault discipline)."""
    buf, offs, n = _arrow_flat_bytes(col)
    lens = np.diff(offs)
    out = np.empty(n, dtype=np.uint64)
    # Rows are processed in LENGTH-SORTED order with a CELL budget
    # (rows × chunk-max-width ≤ 2^23): a fixed row chunk alone lets one
    # long outlier value blow the padded matrix up to rows × max_len
    # cells (and the int64 gather-index matrix is 8× that again — a
    # single 1 MB document in a 64k-row chunk would mean ~32 GB
    # transient). Sorting bounds the waste (widths within a chunk are
    # homogeneous) and the budget bounds the peak at ~8 MB uint8 +
    # ~64 MB index per chunk, reused by the allocator. Hashes are
    # per-row, so scattering results back preserves bit-equality.
    order = np.argsort(lens, kind="stable")
    cell_budget = 1 << 23
    i = 0
    while i < n:
        j = min(i + chunk, n)
        w0 = max(int(lens[order[j - 1]]), 1)
        j = min(j, i + max(1, cell_budget // w0))
        idx = order[i:j]
        ls = lens[idx]
        w = max(int(ls.max()) if ls.size else 1, 1)
        if buf.size:
            pos = np.minimum(
                offs[idx][:, None] + np.arange(w, dtype=np.int64)[None, :],
                buf.size - 1,
            )
            mat = buf[pos]
        else:
            mat = np.zeros((j - i, w), dtype=np.uint8)
        out[idx] = fnv1a_64_varlen_np(mat, ls, basis=basis, prime=prime)
        i = j
    return out


def content_fp128(strs: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """128-bit content fingerprint as two independent 64-bit folds
    (FNV-1a and the FNV2 basis/prime variant) over one shared padded
    byte matrix — the encode/pad cost is paid once. Dedup groups on
    the PAIR, so a silent merge of distinct texts needs both unrelated
    64-bit hashes to collide at once (~2^-128 per pair) — safe past
    the 10^12-row target where a single 64-bit fold's birthday bound
    (~2^32) is not."""
    if not strs:
        e = np.empty(0, dtype=np.uint64)
        return e, e.copy()
    enc = [s.encode("utf-8", "replace") for s in strs]
    lens = np.array([len(e) for e in enc], dtype=np.int64)
    width = max(int(lens.max()), 1)
    mat = np.frombuffer(
        np.array(enc, dtype=f"S{width}").tobytes(), dtype=np.uint8
    ).reshape(len(enc), width)
    return (
        fnv1a_64_varlen_np(mat, lens),
        fnv1a_64_varlen_np(mat, lens, basis=FNV2_BASIS, prime=FNV2_PRIME),
    )


def fnv1a_64_ints(ids: np.ndarray) -> np.ndarray:
    """uint64 FNV-1a of each integer's decimal-string bytes, with NO
    per-row Python: the decimal rendering is one vectorized
    ``np.char.mod`` and the hash is the length-aware padded-matrix
    kernel. Equals ``fnv1a_64(str(i).encode())`` bit-for-bit (asserted
    in tests) — and equals the DuckDB hex-fold FNV expression over
    ``CAST(i AS VARCHAR)``, which is what makes hash-priority sampling
    oracle-replicable."""
    ids = np.asarray(ids, dtype=np.int64)
    if ids.size == 0:
        return np.empty(0, dtype=np.uint64)
    s = np.char.mod("%d", ids).astype("S")
    width = s.dtype.itemsize
    mat = np.frombuffer(s.tobytes(), dtype=np.uint8).reshape(ids.size, width)
    lens = np.char.str_len(s).astype(np.int64)
    return fnv1a_64_varlen_np(mat, lens)


def char_ngram_buckets_np(
    text: str, ns: tuple[int, ...] = (2, 3), n_buckets: int = 1 << 16
) -> np.ndarray:
    """Vectorized twin of ``char_ngram_buckets`` (same output, same order)."""
    b = np.frombuffer(text.lower().encode("utf-8", "replace"), dtype=np.uint8)
    out: list[np.ndarray] = []
    for n in ns:
        if b.size < n:
            continue
        win = np.lib.stride_tricks.sliding_window_view(b, n)
        out.append((_fnv1a_64_np(win) % np.uint64(n_buckets)).astype(np.int64))
    if not out:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(out)


def char_ngram_buckets_batch(
    texts: list[str], ns: tuple[int, ...] = (2, 3), n_buckets: int = 1 << 16
) -> tuple[np.ndarray, np.ndarray]:
    """Whole-batch twin of ``char_ngram_buckets_np``: hash ONE
    concatenated byte array per n instead of one python call per text
    (~4× on the scorer's hot path; bit-identical output asserted in
    tests). Windows spanning text boundaries are sliced away, never
    hashed into a text's bucket list.

    Returns (flat_buckets, lens) where ``lens[i]`` is text i's bucket
    count and text i's buckets are ``flat[lens[:i].sum():][:lens[i]]``
    in the same [all 2-grams, all 3-grams] order as the per-text
    function."""
    enc = [t.lower().encode("utf-8", "replace") for t in texts]
    sizes = np.array([len(e) for e in enc], dtype=np.int64)
    b = np.frombuffer(b"".join(enc), dtype=np.uint8)
    starts = np.zeros(len(enc), dtype=np.int64)
    if len(enc) > 1:
        np.cumsum(sizes[:-1], out=starts[1:])
    hashed: dict[int, np.ndarray] = {}
    for n in ns:
        if b.size >= n:
            win = np.lib.stride_tricks.sliding_window_view(b, n)
            hashed[n] = (_fnv1a_64_np(win) % np.uint64(n_buckets)).astype(np.int64)
    lens = np.zeros(len(enc), dtype=np.int64)
    parts: list[np.ndarray] = []
    for i in range(len(enc)):
        for n in ns:
            cnt = sizes[i] - n + 1
            if cnt > 0 and n in hashed:
                parts.append(hashed[n][starts[i] : starts[i] + cnt])
                lens[i] += cnt
    flat = np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
    return flat, lens


def ascii_class_counts(col) -> dict[str, np.ndarray]:
    """Per-row ASCII char-class counts over an Arrow StringArray,
    zero-copy from the column's offsets/data buffers — ONE pass of
    numpy byte masks + segment sums for the whole batch.

    Returns int64 arrays: ``alpha`` ([A-Za-z]), ``digit`` ([0-9]),
    ``space`` (' '), ``tok_chars`` (chars in the token class
    [A-Za-z0-9']), ``n_tok`` (maximal token-class runs — equals
    ``len(re.findall(TOKEN_PATTERN, t))``, asserted in tests).

    Measured 3-7× faster than either the per-row ``re.findall`` loop
    or Arrow's ``pc.count_substring_regex`` per class (RE2 iterates
    matches one at a time for single-char classes: 0.117 s vs 0.035 s
    for all five stats on the sf0.1 corpus). Byte-level is exact for
    these classes even on non-ASCII text: UTF-8 continuation bytes
    (0x80+) never fall in the ASCII ranges."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if col.null_count:  # see _arrow_flat_bytes: NULL must not alias ''
        raise ValueError(
            f"ascii_class_counts: column has {col.null_count} nulls; "
            "fill_null/drop nulls explicitly first"
        )
    out_z = np.zeros(n, dtype=np.int64)
    if n == 0 or col.buffers()[2] is None:
        return {k: out_z.copy() for k in ("alpha", "digit", "space", "tok_chars", "n_tok")}
    # shared extractor: branches on large_string/large_binary int64
    # offsets — a hardcoded int32 read would silently misparse a
    # promoted large_string column (same class of bug as the
    # _payload_arrays large_binary fix)
    buf, offs, n = _arrow_flat_bytes(col)
    am = ((buf >= 65) & (buf <= 90)) | ((buf >= 97) & (buf <= 122))
    dm = (buf >= 48) & (buf <= 57)
    tokm = am | dm | (buf == 39)  # [A-Za-z0-9']
    c = np.zeros(buf.size + 1, dtype=np.int64)

    def seg(mask: np.ndarray) -> np.ndarray:
        np.cumsum(mask, out=c[1:])
        return c[offs[1:]] - c[offs[:-1]]

    # run starts: token char whose predecessor is not one; row starts
    # always begin a new run (the predecessor belongs to another row)
    prev = np.concatenate([[False], tokm[:-1]])
    row_starts = offs[:-1][offs[:-1] < buf.size]
    prev[row_starts] = False
    return {
        "alpha": seg(am),
        "digit": seg(dm),
        "space": seg(buf == 32),
        "tok_chars": seg(tokm),
        "n_tok": seg(tokm & ~prev),
    }


def rolling_fingerprint(text: str, mod: int = (1 << 61) - 1, base: int = 257) -> int:
    """Polynomial rolling-hash document fingerprint over normalized text."""
    h = 0
    for byte in text.lower().encode("utf-8", "replace"):
        h = (h * base + byte) % mod
    return h


def tokenize_words(text: str) -> list[str]:
    return WORD_RE.findall(text)


def count_bpe_ish_tokens(text: str) -> int:
    return len(BPE_ISH_RE.findall(text))
