"""Text-analysis operators over the ``documents`` table.

The large-scale-training-pipeline operator set (driver brief) realised
with the same kernels the flagship clip filter uses:

- token counting (whitespace-free regex + BPE-ish splitter, kernels/text.py)
- quality scoring (char-class fractions, token stats, stopword ratio)
- language ID (hashed char-n-gram NB actor pool, state/langid.py)
- document fingerprinting (md5 + polynomial rolling hash)
- PII scrub (kernels/pii.py — RE2-compatible patterns shared verbatim
  with the DuckDB oracle SQL)
- toxicity lexicon hits (kernels/toxicity.py)
- repetition / low-complexity masking (kernels/text.py, the SDUST
  analogue sdust.c:136-177)

Every op is a vectorized ``map_batches`` over pruned columns; the only
stateful one (langid) is an actor pool with the model broadcast once.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..kernels.text import count_bpe_ish_tokens, rolling_fingerprint
from .util import scale_cap, table

# Shared with the SQL oracle verbatim (RE2-compatible, no lookaround).
TOKEN_PATTERN = r"[A-Za-z0-9']+"
STOPWORD_PATTERN = r"\b(the|a|an|of|and|to|in|is|it|for|on|with|as|at|by)\b"

_TOKEN_RE = re.compile(TOKEN_PATTERN)


# complement of TOKEN_PATTERN's char class — splitting on it yields
# exactly the TOKEN_PATTERN matches (maximal runs) plus empty strings
# at separators, which are dropped
NON_TOKEN_PATTERN = r"[^A-Za-z0-9']+"


def token_stats(sf_dir: str) -> rd.Dataset:
    """Per-doc token counts: regex tokens, distinct tokens, chars.

    Fully vectorized — one Arrow RE2 kernel per stat instead of a
    per-row ``re.findall`` loop (``pc.count_substring_regex`` for the
    match count, ``pc.utf8_length`` for chars); the distinct-token
    count splits on the complement class and runs one C-speed
    ``pd.factorize`` + ``np.unique`` over (doc, token-code) pairs for
    the whole batch. Measured ~3× over the findall loop on sf0.1
    batches (BASELINE.md round-4 notes)."""
    ds = table(sf_dir, "documents", columns=["doc_id", "text"])

    from ..kernels.text import ascii_class_counts

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        n_tok = ascii_class_counts(col)["n_tok"]
        n_chars = pc.utf8_length(col).to_numpy().astype(np.int64)
        lst = pc.split_pattern_regex(col, pattern=NON_TOKEN_PATTERN)
        offs = lst.offsets.to_numpy()
        vals = lst.values.to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
        mask = vals != ""
        n_types = np.zeros(n, dtype=np.int64)
        if mask.any():
            codes, uniq = pd.factorize(vals[mask])
            keys = doc_idx[mask] * np.int64(len(uniq)) + codes
            uk = np.unique(keys)
            n_types = np.bincount(uk // len(uniq), minlength=n).astype(np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_types": pa.array(n_types, pa.int64()),
            "n_chars_text": pa.array(n_chars, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=4096)


def quality_scores(sf_dir: str) -> rd.Dataset:
    """Per-doc quality heuristics: char-class fractions, mean token
    length, stopword ratio — the text analogue of the per-read
    length/Q7/GC stat block (lq_gcfrac.py:25-47, lqutils.c:72-80).

    Every output is a single double division of exact ints, so the
    DuckDB oracle reproduces it bit-for-bit."""
    ds = table(sf_dir, "documents", columns=["doc_id", "text"])

    from ..kernels.text import ascii_class_counts

    def fn(batch: pa.Table) -> pa.Table:
        # one numpy byte-mask pass for all char-class stats (zero-copy
        # over the Arrow buffers; kernels/text.ascii_class_counts) +
        # one RE2 kernel for the stopword alternation. Sum of token
        # lengths == count of chars in the token class (tokens are
        # maximal runs, so every matched char belongs to exactly one
        # token) — so mean_token_len needs no token materialization.
        # Measured 5.4× over the per-row findall loop on sf0.1 batches.
        col = batch.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        cc = ascii_class_counts(col)
        L = np.maximum(pc.utf8_length(col).to_numpy().astype(np.int64), 1)
        # RE2 \b is ASCII-word-boundary: a stopword adjoining a
        # non-ASCII word character counts here where Python's
        # Unicode-aware re would not. The DuckDB oracle is RE2 too, so
        # engine and oracle agree by construction; this ASCII-boundary
        # definition of stopword_frac is the engine's spec (the
        # heuristic targets English stopwords, where the ASCII
        # boundary is the intended one).
        stops = pc.count_substring_regex(
            pc.utf8_lower(col), pattern=STOPWORD_PATTERN
        ).to_numpy().astype(np.int64)
        n_tok = cc["n_tok"]
        tok_den = np.maximum(n_tok, 1)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "alpha_frac": pa.array(cc["alpha"] / L, pa.float64()),
            "digit_frac": pa.array(cc["digit"] / L, pa.float64()),
            "space_frac": pa.array(cc["space"] / L, pa.float64()),
            "stopword_frac": pa.array(stops / tok_den, pa.float64()),
            "mean_token_len": pa.array(
                np.where(n_tok > 0, cc["tok_chars"] / tok_den, 0.0), pa.float64()
            ),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=4096)


class LangIdDocs:
    """Actor-pool language-ID stage over documents (T1/T2 pattern —
    model broadcast once, held per actor, scored vectorized)."""

    def __init__(self, langid_ref=None):
        from ..state.langid import build_langid_model

        self.model = ray.get(langid_ref) if langid_ref is not None else build_langid_model()
        self.lang_arr = np.asarray(self.model.langs, dtype=object)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        idx, conf = self.model.score_texts(texts)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "lang_pred": pa.array(self.lang_arr[idx].tolist(), pa.string()),
            "lang_conf": pa.array(conf, pa.float64()),
        })


def lang_id_docs(sf_dir: str) -> rd.Dataset:
    from ..state.langid import build_langid_model

    ref = ray.put(build_langid_model())
    ds = table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        LangIdDocs,
        fn_constructor_kwargs={"langid_ref": ref},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 4),
        num_cpus=1,
    )


def doc_fingerprints(sf_dir: str) -> rd.Dataset:
    """Document fingerprinting: md5 (oracle-checkable) + 61-bit
    polynomial rolling hash (kernels/text.py)."""
    ds = table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "fp_md5": pa.array(
                [hashlib.md5(t.encode("utf-8", "replace")).hexdigest() for t in texts],
                pa.string(),
            ),
            "fp_rolling": pa.array(
                [rolling_fingerprint(t) for t in texts], pa.int64()
            ),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=4096)


def pii_scrub_docs(sf_dir: str) -> rd.Dataset:
    """PII scrub over documents (M7 adapter-trim analogue,
    lq_adapt.py:80-103): sequential pattern application, per-row span
    count; patterns shared verbatim with the oracle SQL."""
    ds = table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        from ..kernels.pii import scrub_column

        # whole-column RE2 scrub (bit-identical to the per-row re.subn
        # loop — the pattern strings are the shared spec)
        scrubbed, n_pii = scrub_column(batch.column("text"))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "scrubbed_text": scrubbed,
            "n_pii": pa.array(n_pii, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=4096)


def toxicity_docs(sf_dir: str) -> rd.Dataset:
    """Toxicity lexicon hits (T6 spike-in control analogue)."""
    ds = table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        from ..kernels.toxicity import toxic_hits_column

        hits = toxic_hits_column(batch.column("text"))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_toxic": pa.array(hits, pa.int64()),
            "toxic": pa.array(hits > 0),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=4096)


def repetition_docs(sf_dir: str) -> rd.Dataset:
    """SDUST-analogue low-complexity mask stats per document
    (sdust.c:136-177 recast over characters; kernels/text.py)."""
    ds = table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        from ..kernels.text import repetition_mask_batch

        texts = batch.column("text").to_pylist()
        n = len(texts)
        # whole-batch kernel (bit-equal to per-doc repetition_mask)
        mf, mc, nc = repetition_mask_batch(texts)
        nt = np.zeros(n, dtype=np.int64)
        for i, t in enumerate(texts):
            nt[i] = count_bpe_ish_tokens(t)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "masked_frac": pa.array(mf, pa.float64()),
            "masked_chars": pa.array(mc, pa.int64()),
            "n_chars_text": pa.array(nc, pa.int64()),
            "n_bpe_tokens": pa.array(nt, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=4096)


# Fuzzy span matching (lq_adapt.py:10-78 capability: edlib infix
# alignment at identity >= 0.75, which exact regexes cannot express).
# The probe is a boilerplate phrase from the corpus vocabulary; edit
# threshold k = floor(m * (1 - identity)) maps the reference's
# identity bound onto Levenshtein distance.
FUZZY_PATTERN = "customer query line"
FUZZY_IDENTITY = 0.75


def fuzzy_span_docs(
    sf_dir: str, pattern: str = FUZZY_PATTERN, identity: float = FUZZY_IDENTITY
) -> rd.Dataset:
    """Per-doc best fuzzy occurrence of ``pattern``: minimum
    semi-global Levenshtein distance over all substrings (Myers
    bit-parallel kernel, batched across rows — kernels/fuzzy.py),
    capped at k+1 so the emitted columns are window-length-bounded and
    SQL-checkable; match_end is the first 1-based end position
    achieving the best distance (-1 if no match within k)."""
    from ..kernels.fuzzy import myers_search_batch

    m = len(pattern)
    k = int(m * (1.0 - identity))
    ds = table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        best, end = myers_search_batch(texts, pattern)
        found = best <= k
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "best_ed": pa.array(np.minimum(best, k + 1), pa.int64()),
            "match_end": pa.array(np.where(found, end, -1), pa.int64()),
            "found": pa.array(found),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=4096)


# Sequence packing (training-data op the reference lacks): assign each
# doc, in doc_id order, to the pack bin floor(prefix_tokens_before /
# cap) — the distributed-scan (ordered prefix sum) pattern.
PACK_CAP_TOKENS = 2048
PACK_RANGE_SIZE = 1000  # doc_ids per ordered range partition


def pack_docs(
    sf_dir: str, cap_tokens: int = PACK_CAP_TOKENS, range_size: int = PACK_RANGE_SIZE
) -> pd.DataFrame:
    """Distributed ordered prefix sum → sequence packing.

    Two passes over a NARROW (doc_id, n_tokens) projection:
    1. per-RANGE token sums (range = doc_id // range_size, an ordered
       partition key) merge driver-side into per-range prefix OFFSETS
       — the classic two-level scan, so no stage ever sees global
       order;
    2. each range, grouped and sorted internally, adds its offset to
       its local cumulative sum; pack_id = prefix_before // cap.

    Partitioning assumption (documented per SURVEY §2.4 note): the
    order key is the unique monotone doc_id; an arbitrary sort key
    would need a ds.sort first. Ranges scale with data size, offsets
    are O(n_ranges) on the driver. Scan core: ``util.two_level_pack``
    (shared with the audio duration packer)."""
    from .util import two_level_pack

    ds = table(sf_dir, "documents", columns=["doc_id", "text"])

    def tok(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        nt = np.array([len(_TOKEN_RE.findall(x)) for x in texts], dtype=np.int64)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(nt, pa.int64()),
            "rng": pa.array(ids // range_size, pa.int64()),
        })

    narrow = ds.map_batches(tok, batch_format="pyarrow", batch_size=4096)
    # one row per doc — returned as a Dataset (no O(n_docs) driver
    # collect; the checker canonicalizes row order)
    return two_level_pack(narrow, cap_tokens, "doc_id", "n_tokens")


VOCAB_TOP_K = 100


def vocab_top_tokens(sf_dir: str, k: int = VOCAB_TOP_K) -> pd.DataFrame:
    """Corpus vocabulary: top-``k`` tokens by total occurrence count
    (the vocab-building / token-frequency scan of a training-data
    pipeline). Per-batch ``np.unique`` partial counts (map-side
    combine) → a NARROW (token, count) groupby — the only all-to-all,
    O(vocab) not O(corpus) — → distributed ``sort().limit(k)``, so
    only the k winners ever reach the driver (open-web vocabularies
    run to billions of distinct tokens). Deterministic tie-break on
    the token string."""
    from ray.data.aggregate import Sum

    ds = table(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in batch.column("text").to_pylist():
            toks.extend(_TOKEN_RE.findall(t))
        u, c = (np.unique(np.asarray(toks, dtype=object), return_counts=True)
                if toks else (np.empty(0, object), np.empty(0, np.int64)))
        return pa.table({
            "token": pa.array(u.tolist(), pa.string()),
            "cnt": pa.array(c.astype(np.int64), pa.int64()),
        })

    from .util import hash_grouped_sum

    from .util import local_topk

    out = local_topk(
        hash_grouped_sum(
            ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
            ["token"], "cnt", "n",
        ),
        ["n", "token"], [True, False], k,
    ).to_pandas()
    from .util import ensure_columns

    out = ensure_columns(out, {"token": object, "n": np.int64})
    out["n"] = out["n"].astype(np.int64)
    return out.reset_index(drop=True)[["token", "n"]]


# --- corpus-level web-pipeline ops: decontamination + chunk dedup ----

CONTAM_N = 8           # word-shingle width (8-13-gram decontamination shape)
CONTAM_BENCH_MOD = 97  # benchmark membership: doc_id % MOD == 0
CHUNK_WORDS = 10       # "line" unit for this newline-free corpus
CHUNK_MIN_DOCS = 2     # chunk is boilerplate when seen in >= this many docs
# below this many (h, nd) partial rows the chunk-count merge happens on
# the driver; above it, the grouped-sum shuffle (find_dup_keys split).
# 2M rows × 16 B ≈ 32 MB on the driver — past that the driver merge no
# longer beats the ~2 s fixed shuffle cost anyway, and far-larger caps
# would pull GBs through to_pandas on a memory-tight node.
CHUNK_PARTIALS_DRIVER_CAP = 2_000_000


def _doc_shingles(text: str, n: int) -> list[str]:
    ws = text.lower().split()
    return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]


def contamination_docs(
    sf_dir: str, n: int = CONTAM_N, bench_mod: int = CONTAM_BENCH_MOD
) -> rd.Dataset:
    """Benchmark-contamination check: per non-benchmark doc, how many of
    its distinct word ``n``-gram shingles appear anywhere in the
    benchmark slice (docs with ``doc_id % bench_mod == 0``) — the
    train/eval overlap scan an LLM data pipeline runs before training.

    Scale shape: the benchmark side is SMALL by construction (an eval
    set, not the corpus), so its distinct shingle hashes are a
    filtered, bounded collect → ``ray.put`` broadcast; the corpus side
    streams through one ``map_batches`` doing a vectorized
    ``np.searchsorted`` membership per batch. No shuffle at all.
    Shingles compare by 64-bit FNV (collision odds ~m²/2⁶⁴; the SQL
    oracle compares raw strings, so a collision would surface as a
    driver mismatch, not silently)."""
    from ..kernels.text import fnv1a_64_strs

    ds = table(sf_dir, "documents", columns=["doc_id", "text"])

    def bench_hashes(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t.column("text").to_pylist()
        hs: list[np.ndarray] = []
        for i in np.nonzero(ids % bench_mod == 0)[0]:
            sh = _doc_shingles(texts[i], n)
            if sh:
                hs.append(np.unique(fnv1a_64_strs(sh)))
        flat = np.unique(np.concatenate(hs)) if hs else np.empty(0, np.uint64)
        return pa.table({"h": pa.array(flat.view(np.int64), pa.int64())})

    from .util import ensure_columns

    bench = ensure_columns(
        ds.map_batches(bench_hashes, batch_format="pyarrow").to_pandas(),
        {"h": np.int64},
    )
    bench_sorted = np.unique(bench["h"].to_numpy().view(np.uint64))
    bref = ray.put(bench_sorted)

    def score(t: pa.Table) -> pa.Table:
        bs = ray.get(bref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t.column("text").to_pylist()
        keep = np.nonzero(ids % bench_mod != 0)[0]
        n_sh = np.zeros(keep.size, dtype=np.int64)
        n_cont = np.zeros(keep.size, dtype=np.int64)
        # one hash call + one membership scan per BATCH (the padded-
        # matrix kernel's per-call setup dominated the old per-doc
        # loop); per-doc DISTINCT re-derived from the (doc, h) lexsort
        # mask — identical counts to the old np.unique-per-doc path
        all_sh: list[str] = []
        lens = np.zeros(keep.size, dtype=np.int64)
        for j, i in enumerate(keep):
            sh = _doc_shingles(texts[i], n)
            all_sh.extend(sh)
            lens[j] = len(sh)
        if all_sh:
            hs = fnv1a_64_strs(all_sh)
            doc_ix = np.repeat(np.arange(keep.size, dtype=np.int64), lens)
            order = np.lexsort((hs, doc_ix))
            ho, do = hs[order], doc_ix[order]
            first = np.ones(ho.size, dtype=bool)
            first[1:] = (ho[1:] != ho[:-1]) | (do[1:] != do[:-1])
            hu, du = ho[first], do[first]
            n_sh = np.bincount(du, minlength=keep.size).astype(np.int64)
            if bs.size and hu.size:
                pos = np.searchsorted(bs, hu)
                pos[pos == bs.size] = 0
                hit = bs[pos] == hu
                n_cont = np.bincount(
                    du, weights=hit, minlength=keep.size
                ).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "n_shingles": pa.array(n_sh, pa.int64()),
            "n_contaminated": pa.array(n_cont, pa.int64()),
            "contaminated": pa.array(n_cont > 0, pa.bool_()),
        })

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


def _doc_chunks(text: str, chunk: int) -> list[str]:
    ws = text.lower().split()
    return [" ".join(ws[i : i + chunk]) for i in range(0, len(ws), chunk)]


def chunk_dedup_docs(
    sf_dir: str, chunk: int = CHUNK_WORDS, min_docs: int = CHUNK_MIN_DOCS
) -> rd.Dataset:
    """Corpus-level repeated-chunk removal — the line-dedup step of web
    pipelines (drop lines that recur across many pages), expressed over
    ``chunk``-word units because this corpus has no newlines (on real
    data the splitter is ``text.split('\\n')``; everything downstream
    is unit-agnostic).

    Two streaming passes:
    1. per-batch: per-doc DISTINCT chunk hashes → partial doc-counts
       (map-side combine) → ``groupby(h).sum`` — a NARROW key-count
       shuffle (16 bytes/chunk, the dedup_exact shape) → filter
       ``n_docs >= min_docs`` BEFORE collecting, so only the rare
       boilerplate chunks (not the corpus's whole chunk vocabulary)
       reach the driver → ``ray.put`` broadcast;
    2. per-batch rewrite: drop chunks whose hash is in the broadcast
       set (``np.searchsorted``), reassemble the survivors in order.

    Output text is whitespace-normalized lowercase (chunks rejoin with
    single spaces) — the op runs on normalized text by design."""
    from ray.data.aggregate import Sum

    from ..kernels.text import fnv1a_64_strs

    ds = table(sf_dir, "documents", columns=["doc_id", "text"])

    def partials(t: pa.Table) -> pa.Table:
        # ONE fnv1a_64_strs call per BATCH, not per doc: the padded-
        # matrix kernel has a fixed per-call setup cost, and 5k per-doc
        # calls measured 1.07 s where the batched call + pair-distinct
        # runs 0.05 s (identical hashes; per-doc distinct re-derived
        # from the (doc, h) lexsort mask below).
        texts = t.column("text").to_pylist()
        all_chunks: list[str] = []
        lens = np.zeros(len(texts), dtype=np.int64)
        for i, x in enumerate(texts):
            c = _doc_chunks(x, chunk)
            all_chunks.extend(c)
            lens[i] = len(c)
        if not all_chunks:
            return pa.table({
                "h": pa.array([], pa.int64()), "nd": pa.array([], pa.int64()),
            })
        hs = fnv1a_64_strs(all_chunks)
        doc_ix = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
        order = np.lexsort((hs, doc_ix))
        ho, do = hs[order], doc_ix[order]
        first = np.ones(ho.size, dtype=bool)
        first[1:] = (ho[1:] != ho[:-1]) | (do[1:] != do[:-1])
        h, cnt = np.unique(ho[first], return_counts=True)
        return pa.table({
            "h": pa.array(h.view(np.int64), pa.int64()),
            "nd": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    # Merge the map-side partials the same way find_dup_keys does:
    # materialize the NARROW (h, nd) partials once, and below the cap
    # sum them on the driver (a Ray groupby costs ~2 s of fixed
    # sort-shuffle overhead even over 30k partial rows); above the cap
    # — the dense regime where the chunk vocabulary itself is big —
    # fall back to the grouped-sum shuffle. Both branches produce the
    # identical frequent-chunk set.
    parts = ds.map_batches(
        partials, batch_format="pyarrow", batch_size=None
    ).materialize()
    if parts.count() <= CHUNK_PARTIALS_DRIVER_CAP:
        from .util import ensure_columns

        merged = ensure_columns(parts.to_pandas(), {"h": np.int64, "nd": np.int64})
        totals = merged.groupby("h", sort=False)["nd"].sum()
        freq_h = totals.index.to_numpy()[totals.to_numpy() >= min_docs]
    else:
        from .util import hash_grouped_sum

        counts = hash_grouped_sum(parts, ["h"], "nd", "n_docs")

        def frequent(t: pa.Table) -> pa.Table:
            nd = t.column("n_docs").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(nd >= min_docs)).select(["h"])

        freq_h = counts.map_batches(
            frequent, batch_format="pyarrow"
        ).to_pandas()["h"].to_numpy()
    freq_sorted = np.unique(freq_h.view(np.uint64))
    fref = ray.put(freq_sorted)

    def rewrite(t: pa.Table) -> pa.Table:
        fs = ray.get(fref)
        texts = t.column("text").to_pylist()
        n_docs = len(texts)
        chunks_per_doc = [_doc_chunks(x, chunk) for x in texts]
        lens = np.array([len(c) for c in chunks_per_doc], dtype=np.int64)
        n_removed = np.zeros(n_docs, dtype=np.int64)
        all_chunks = [c for cs in chunks_per_doc for c in cs]
        clean: list[str]
        if all_chunks:
            # one hash call + one membership scan per BATCH (see
            # partials); only the string reassembly stays per-doc
            hs = fnv1a_64_strs(all_chunks)
            bad = np.zeros(hs.size, dtype=bool)
            if fs.size:
                pos = np.searchsorted(fs, hs)
                pos[pos == fs.size] = 0
                bad = fs[pos] == hs
            doc_ix = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
            n_removed = np.bincount(
                doc_ix, weights=bad, minlength=n_docs
            ).astype(np.int64)
            clean = []
            k = 0
            for cs in chunks_per_doc:
                if not cs:
                    clean.append("")
                    continue
                b = bad[k : k + len(cs)]
                k += len(cs)
                clean.append(" ".join(c for c, rm in zip(cs, b) if not rm))
        else:
            clean = [""] * n_docs
        return pa.table({
            "doc_id": t.column("doc_id"),
            "clean_text": pa.array(clean, pa.string()),
            "n_chunks": pa.array(lens, pa.int64()),
            "n_removed": pa.array(n_removed, pa.int64()),
        })

    return ds.map_batches(rewrite, batch_format="pyarrow", batch_size=None)


# --- collocations -----------------------------------------------------

BIGRAM_MIN_COUNT = 5
BIGRAM_TOP_K = 20
# unigram vocab rows above which the count table stops being
# broadcastable as a driver dict (O(vocab) driver memory) and the
# lift attach switches to two co-group hash joins — the same measured
# broadcast/shuffle discipline as DUP_BROADCAST_CAP. 2M rows × ~40 B
# ≈ 80 MB of dict is the practical driver comfort bound.
BIGRAM_BROADCAST_CAP = 2_000_000


def bigram_collocations(
    sf_dir: str,
    k: int = BIGRAM_TOP_K,
    min_count: int = BIGRAM_MIN_COUNT,
    broadcast_cap: int = BIGRAM_BROADCAST_CAP,
) -> pd.DataFrame:
    """Collocation mining: top-``k`` adjacent token pairs by LIFT
    (= N·c(ab) / (c(a)·c(b)), the exp of PMI — same ranking, but the
    ratio of EXACT integer counts casts to one double identically in
    numpy and DuckDB, so the oracle matches bit-for-bit; a log would
    reintroduce libm variance for zero analytical gain).

    Scale shape: one tokenize pass emits per-batch partial counts for
    unigrams (w2='') and bigrams in the SAME narrow table; ONE
    (w1,w2) groupby — O(vocab²-observed), not O(corpus) — is the only
    all-to-all. The unigram attach picks broadcast vs shuffle by a
    measured cap: ≤``broadcast_cap`` distinct unigrams collect to a
    driver dict broadcast into the lift stage; above it the counts
    never leave the cluster — two ``util.hash_join`` co-groups attach
    c(w1) then c(w2) (both paths pinned equal in tests). Winners reach
    the driver via distributed sort().limit(k)."""
    from ray.data.aggregate import Sum

    ds = table(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        w1: list[str] = []
        w2: list[str] = []
        for t in batch.column("text").to_pylist():
            ts = _TOKEN_RE.findall(t)
            w1.extend(ts)
            w2.extend([""] * len(ts))          # unigram rows
            w1.extend(ts[:-1])
            w2.extend(ts[1:])                  # bigram rows
        if w1:
            # "\t" never occurs in tokens (word-char pattern); NUL
            # would read as an empty separator in numpy's C strings
            keys = np.char.add(np.char.add(np.asarray(w1), "\t"), np.asarray(w2))
            u, c = np.unique(keys, return_counts=True)
            parts = np.char.partition(u, "\t")
            a, b = parts[:, 0], parts[:, 2]
        else:
            a = b = np.empty(0, dtype=object)
            c = np.empty(0, np.int64)
        return pa.table({
            "w1": pa.array(a.tolist(), pa.string()),
            "w2": pa.array(b.tolist(), pa.string()),
            "cnt": pa.array(c.astype(np.int64), pa.int64()),
        })

    from .util import hash_grouped_sum

    counts = hash_grouped_sum(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["w1", "w2"], "cnt", "n",
    ).materialize()

    def unis(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("w2"), "")).select(["w1", "n"])

    uni_ds = counts.map_batches(unis, batch_format="pyarrow").materialize()
    nb = int(
        counts.map_batches(
            lambda t: pa.table({"n": t.filter(pc.not_equal(t.column("w2"), "")).column("n")}),
            batch_format="pyarrow",
        ).sum("n")
        or 0
    )

    def bigrams(t: pa.Table) -> pa.Table:
        return t.filter(pc.and_(pc.not_equal(t.column("w2"), ""),
                                pc.greater_equal(t.column("n"), min_count)))

    big = counts.map_batches(bigrams, batch_format="pyarrow")

    if uni_ds.count() <= scale_cap("BIGRAM_BROADCAST", broadcast_cap):
        from .util import ensure_columns

        uni = ensure_columns(uni_ds.to_pandas(), {"w1": object, "n": np.int64})
        uc = dict(zip(uni["w1"], uni["n"].astype(np.int64)))
        ucref = ray.put(uc)

        def lift(t: pa.Table) -> pa.Table:
            m = ray.get(ucref)
            a = t.column("w1").to_pandas().map(m).to_numpy(dtype=np.int64)
            b = t.column("w2").to_pandas().map(m).to_numpy(dtype=np.int64)
            n_ab = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
            lv = (nb * n_ab).astype(np.float64) / (a * b).astype(np.float64)
            return pa.table({
                "w1": t.column("w1"), "w2": t.column("w2"),
                "n_ab": pa.array(n_ab, pa.int64()),
                "lift": pa.array(lv, pa.float64()),
            })

        lifted = big.map_batches(lift, batch_format="pyarrow")
    else:
        # vocab outgrew the driver: attach c(w1) and c(w2) via two
        # co-group hash joins — the unigram table never collects
        from .util import hash_join

        def ren(name_w: str, name_c: str):
            def fn(t: pa.Table) -> pa.Table:
                return pa.table({name_w: t.column("w1"), name_c: t.column("n")})
            return fn

        j1 = hash_join(big, uni_ds.map_batches(ren("wa", "ca"), batch_format="pyarrow"),
                       "w1", "wa").drop_columns(["wa"])
        j2 = hash_join(j1, uni_ds.map_batches(ren("wb", "cb"), batch_format="pyarrow"),
                       "w2", "wb").drop_columns(["wb"])

        def lift_joined(t: pa.Table) -> pa.Table:
            n_ab = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
            a = t.column("ca").to_numpy(zero_copy_only=False).astype(np.int64)
            b = t.column("cb").to_numpy(zero_copy_only=False).astype(np.int64)
            lv = (nb * n_ab).astype(np.float64) / (a * b).astype(np.float64)
            return pa.table({
                "w1": t.column("w1"), "w2": t.column("w2"),
                "n_ab": pa.array(n_ab, pa.int64()),
                "lift": pa.array(lv, pa.float64()),
            })

        lifted = j2.map_batches(lift_joined, batch_format="pyarrow")

    from .util import ensure_columns, local_topk

    out = local_topk(
        lifted, ["lift", "w1", "w2"], [True, False, False], k
    ).to_pandas()
    out = ensure_columns(out, {"w1": object, "w2": object,
                               "n_ab": np.int64, "lift": np.float64})
    out["n_ab"] = out["n_ab"].astype(np.int64)
    return out.reset_index(drop=True)[["w1", "w2", "n_ab", "lift"]]


SALIENT_TOP_K = 5


def salient_terms_per_source(sf_dir: str, k: int = SALIENT_TOP_K) -> pd.DataFrame:
    """tf-idf-style salient terms: the top-``k`` tokens PER SOURCE by
    tf × n_docs / df (term frequency in the source × inverse document
    frequency as an EXACT integer ratio cast to one double — the same
    exact-rational ranking trick as ``bigram_collocations``, so the
    DuckDB oracle matches bit-for-bit; a log-idf would reintroduce
    libm variance for the same ordering).

    Scale shape: one tokenize pass emits per-batch (source, token)
    partials carrying BOTH the occurrence count and the per-batch doc
    count; every doc has exactly one source, so the corpus-wide
    document frequency of a token is the sum of its per-source doc
    counts. ONE narrow (source, token) groupby is the only all-to-all
    (O(vocab × sources), not O(corpus)); the df rollup and per-source
    top-k run on that vocab-bounded result (beyond ~1e8 vocab, swap
    the driver rollup for util.hash_join on token). n_docs comes from
    parquet footer metadata — no extra pass."""
    from .relational import _footer_rows

    ds = table(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        sources = batch.column("source").to_pylist()
        texts = batch.column("text").to_pylist()
        toks: list[str] = []
        tok_src: list[str] = []
        tok_doc: list[int] = []
        for i, t in enumerate(texts):
            ts = _TOKEN_RE.findall(t)
            toks.extend(ts)
            tok_src.extend([sources[i]] * len(ts))
            tok_doc.extend([i] * len(ts))
        if not toks:
            return pa.table({
                "source": pa.array([], pa.string()),
                "token": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
            })
        tcodes, tuniq = pd.factorize(np.asarray(toks, dtype=object))
        scodes, suniq = pd.factorize(np.asarray(tok_src, dtype=object))
        dcodes = np.asarray(tok_doc, dtype=np.int64)
        n_tok = len(tuniq)
        # tf per (source, token): bincount over combined codes
        st = scodes.astype(np.int64) * n_tok + tcodes
        st_u, tf = np.unique(st, return_counts=True)
        # df partial per (source, token): distinct (doc, token) pairs
        dt = dcodes * n_tok + tcodes
        dt_u = np.unique(dt)
        # map each distinct (doc, token) back to its (source, token)
        d_of = dt_u // n_tok
        t_of = dt_u % n_tok
        s_of = np.empty(len(texts), dtype=np.int64)
        s_of[:] = -1
        s_of[dcodes] = scodes  # doc -> source code (docs may repeat; same value)
        st_df = s_of[d_of] * n_tok + t_of
        df_u, df_c = np.unique(st_df, return_counts=True)
        # align df counts onto the tf key order
        pos = np.searchsorted(st_u, df_u)
        df = np.zeros(st_u.size, dtype=np.int64)
        df[pos] = df_c
        return pa.table({
            "source": pa.array(suniq[st_u // n_tok].tolist(), pa.string()),
            "token": pa.array(tuniq[st_u % n_tok].tolist(), pa.string()),
            "tf": pa.array(tf.astype(np.int64), pa.int64()),
            "df": pa.array(df, pa.int64()),
        })

    from .util import grouped_sums

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
    agg = grouped_sums(parts, ["source", "token"], ["tf", "df"])
    n_docs = _footer_rows(sf_dir, "documents", "doc_id")
    if n_docs is None:
        n_docs = int(table(sf_dir, "documents", columns=["doc_id"]).count())
    # vocab-bounded rollup: global df per token, then exact-ratio rank
    agg = agg.rename(columns={"tf_total": "tf", "df_total": "df_st"})
    gdf = agg.groupby("token", sort=False)["df_st"].sum()
    agg["df"] = agg["token"].map(gdf).astype(np.int64)
    agg["tf"] = agg["tf"].astype(np.int64)
    agg["tfidf"] = (agg["tf"] * np.int64(n_docs)).astype(np.float64) / agg["df"].to_numpy()
    agg = agg.sort_values(["source", "tfidf", "token"],
                          ascending=[True, False, True], kind="stable")
    out = agg.groupby("source", sort=True).head(k).reset_index(drop=True)
    out["rn"] = (out.groupby("source").cumcount() + 1).astype(np.int64)
    return out[["source", "token", "tf", "df", "tfidf", "rn"]]
