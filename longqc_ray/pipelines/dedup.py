"""Deduplication operators over the ``documents`` table.

The reference has only exact membership dedup (ng_set of read names,
longQC.py:376-389 — SURVEY.md §2.7); a web-scale training-data engine
needs the full ladder, so it is built here as first-class operators:

- exact dedup: content fingerprint → hash-partition → first-per-group
- MinHash + LSH near-dup: shingle → minhash signature → banded LSH
  buckets → candidate pairs → exact-Jaccard verify → union-find
  clusters (the standard public MMDS ch.3 construction)
- SimHash: 64-bit weighted feature hash; near-dup = Hamming ≤ d via
  banded pigeonhole buckets
- n-gram Jaccard: the exact verifier, exposed standalone

Scale notes: signatures are fixed-width (64×u64 / 1×u64) so the
shuffle moves ~KB per row, never the text; LSH buckets are capped
(hot-bucket cap, the deterministic COVT analogue, esterr.c:85-100).
Candidate VERIFY has two engines behind one crossover
(``VERIFY_DRIVER_CAP`` raw pairs): below it, pairs collect and texts
are re-read only for near-threshold docs (pruned is_in); above it,
``_verify_pairs_distributed`` keeps pairs a Dataset end-to-end —
co-grouped signature joins for the estimate prefilter, a semi-join
for shingle sets, in-partition vectorized exact Jaccard (the scale
twin of the reference's streaming overlap pipeline,
lqmap.c:752-856). Components likewise: driver union-find below
``LP_MIN_PAIRS`` verified pairs, distributed min-label propagation +
pointer jumping above. Every engine pair is pinned bit-equal in
tests and oracle-swept with the caps forced to 0
(CHECK_SWEEP_r05_scale.json).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .util import concat_blocks, table

MERSENNE_P = (1 << 61) - 1
N_PERM = 64
LSH_BANDS = 16  # 16 bands × 4 rows
LSH_ROWS = N_PERM // LSH_BANDS
BUCKET_CAP = 64  # hot-bucket candidate cap (COVT analogue)
JACCARD_TAU = 0.8
SIMHASH_BANDS = 4  # 4 × 16-bit bands → catches Hamming ≤ 3
HAMMING_MAX = 3


# ---------------------------------------------------------------- shingles

def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct hashed char k-gram shingles (uint64) of a lowercased text.

    Texts shorter than ``k`` bytes have NO shingles — an EMPTY array,
    matching the SQL twin (``range(1, length-k+2)`` is empty), so two
    distinct short docs verify at Jaccard 0, never 1. (A previous
    sentinel ``{0}`` made every pair of short docs an exact dup.)"""
    b = np.frombuffer(text.lower().encode("utf-8", "replace"), dtype=np.uint8)
    if b.size < k:
        return np.empty(0, dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    h = np.full(win.shape[0], np.uint64(0xCBF29CE484222325), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            h ^= win[:, j]
            h = h * np.uint64(0x100000001B3)
    return np.unique(h)


_rng = np.random.default_rng(2024_08)
_PERM_A = _rng.integers(1, MERSENNE_P, size=N_PERM, dtype=np.uint64) | np.uint64(1)
_PERM_B = _rng.integers(0, MERSENNE_P, size=N_PERM, dtype=np.uint64)


def minhash_signature(shingles: np.ndarray) -> np.ndarray:
    """(N_PERM,) uint64 signature: min over shingles of the
    multiply-shift hash a*x+b mod 2^64 (natural uint64 wraparound —
    the standard fast min-wise family in practice)."""
    sh = shingles[:2048]  # per-row work cap (COVT analogue)
    if sh.size == 0:
        # shingle-less (sub-k) text: constant sentinel signature. Such
        # docs may LSH-bucket together, but the verify stage sees their
        # true EMPTY shingle sets → Jaccard 0 → no pair emitted (every
        # jaccard kernel defines union==0 as 0.0), matching the SQL twin.
        return np.full(N_PERM, np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        vals = _PERM_A[:, None] * sh[None, :] + _PERM_B[:, None]
    return vals.min(axis=1)


def minhash_signature_batch(texts: list[str], k: int = 5) -> np.ndarray:
    """(n, N_PERM) uint64 signatures — vectorized per doc over
    perms × shingles.

    Deliberately per-doc, NOT whole-batch-concatenated: the (64, ~300)
    per-doc matmul stays in L2 cache, while a measured
    whole-batch ``np.minimum.reduceat`` over the concatenated
    (16, 1.5M) intermediates was 4× SLOWER on sf0.1 docs (memory-bound
    — same lesson as the repetition-mask batching attempt)."""
    out = np.empty((len(texts), N_PERM), dtype=np.uint64)
    for i, t in enumerate(texts):
        out[i] = minhash_signature(_shingle_hashes(t, k))
    return out


def _band_hashes(sigs: np.ndarray) -> np.ndarray:
    """(n, LSH_BANDS) int64 band bucket keys from (n, N_PERM) signatures."""
    n = sigs.shape[0]
    bands = np.empty((n, LSH_BANDS), dtype=np.int64)
    for b in range(LSH_BANDS):
        seg = sigs[:, b * LSH_ROWS : (b + 1) * LSH_ROWS]
        h = np.full(n, np.uint64(0xCBF29CE484222325), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(LSH_ROWS):
                for shift in (0, 32):  # fold each u64 sig value in two halves
                    h ^= (seg[:, j] >> np.uint64(shift)) & np.uint64(0xFFFFFFFF)
                    h = h * np.uint64(0x100000001B3)
        bands[:, b] = h.view(np.int64)
    return bands


def exact_jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = _shingle_hashes(a, k), _shingle_hashes(b, k)
    inter = np.intersect1d(sa, sb).size
    union = sa.size + sb.size - inter
    return inter / union if union else 0.0


# ---------------------------------------------------------------- exact

def dedup_exact(sf_dir: str) -> pd.DataFrame:
    """Exact dedup by content hash: a 128-BIT fingerprint (two
    independent 64-bit folds over one shared padded byte matrix,
    kernels/text.content_fp128 — no per-row Python hashing), groupby
    the (fp, fp2) pair keeps (min doc_id, copy count) — the shuffle
    moves 16-byte keys, never the text. A single 64-bit fold's
    birthday bound (~2^32 docs) is below the 10^12-row target and
    adversarially constructible; colliding BOTH unrelated folds at
    once is ~2^-128 per pair. The SQL twin replicates both folds
    byte-for-byte, so any residual collision would collide identically
    on both sides. (FNV-64 singles remain in use only for sampling
    priorities and partition hashing, where collisions are benign.)"""
    from ..kernels.text import FNV2_BASIS, FNV2_PRIME, fnv1a_64_arrow

    ds = table(sf_dir, "documents", columns=["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        col = batch.column("text")
        # int64 VIEW of the uint64 hashes: grouping is bijective under
        # the reinterpretation, and Ray's aggregate would otherwise fall
        # back to pickled-object blocks for uint64 keys above 2^63.
        # Both folds hash straight off the Arrow value buffer (no
        # per-row encode round-trip — kernels/text.fnv1a_64_arrow).
        h1 = fnv1a_64_arrow(col)
        h2 = fnv1a_64_arrow(col, basis=FNV2_BASIS, prime=FNV2_PRIME)
        return pa.table({
            "fp": pa.array(h1.view(np.int64), pa.int64()),
            "fp2": pa.array(h2.view(np.int64), pa.int64()),
            "doc_id": batch.column("doc_id"),
        })

    from .util import hash_grouped_agg

    out = hash_grouped_agg(
        ds.map_batches(fp, batch_format="pyarrow", batch_size=4096),
        keys=["fp", "fp2"], mins=("doc_id",), count_alias="n_copies",
        # empty corpus → zero groups → zero-block dataset; the anchor
        # keeps the columns so the astype/select below never KeyError
        anchor_schema=pa.schema([
            ("fp", pa.int64()), ("fp2", pa.int64()),
            ("doc_id", pa.int64()), ("n_copies", pa.int64()),
        ]),
    ).to_pandas()
    from .util import ensure_columns

    # the anchor keeps Dataset-level schema, but Ray's to_pandas still
    # yields a column-less frame for an all-zero-row dataset
    out = ensure_columns(out, {"fp": np.int64, "fp2": np.int64,
                               "doc_id": np.int64, "n_copies": np.int64})
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["n_copies"] = out["n_copies"].astype(np.int64)
    return out[["doc_id", "n_copies"]]


# ---------------------------------------------------------------- minhash

def _sig_ds(ds: rd.Dataset, id_col: str, text_col: str) -> rd.Dataset:
    """(id, sig) — MinHash signatures computed ONCE and materialized as
    a narrow dataset (~520 B/doc in the object store), so banding and
    the estimate prefilter reuse them instead of re-hashing texts
    (the previous shape recomputed ~every candidate's signature in the
    fetch pass — on a low-vocabulary corpus that is ~the whole corpus
    twice)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        sigs = minhash_signature_batch(texts)
        return pa.table({
            id_col: batch.column(id_col),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.reshape(-1).view(np.int64), pa.int64()), N_PERM
            ),
        })

    # batch_size 256 (not 1024): the signature kernel is ~0.25 ms/doc,
    # so 256-doc tasks keep a 32-way pool busy even on a 5k-doc input
    # (measured 1.19 s → 0.35 s); at cluster scale block counts dwarf
    # the pool either way.
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=256).materialize()


def _sig_matrix(t: pa.Table) -> np.ndarray:
    """(n, N_PERM) uint64 view of a sig fixed-size-list column."""
    col = t.column("sig")
    chunked = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = chunked.flatten().to_numpy(zero_copy_only=False)
    return flat.view(np.uint64).reshape(-1, N_PERM)


def _band_rows(sig_ds: rd.Dataset, id_col: str) -> rd.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        sigs = _sig_matrix(batch)
        bands = _band_hashes(sigs)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        n = sigs.shape[0]
        # explode: one row per (doc, band) — fixed 16× fan-out of 16-byte rows
        return pa.table({
            id_col: pa.array(np.repeat(ids, LSH_BANDS), pa.int64()),
            "band": pa.array(np.tile(np.arange(LSH_BANDS, dtype=np.int64), n), pa.int64()),
            "bucket": pa.array(bands.reshape(-1), pa.int64()),
        })

    return sig_ds.map_batches(fn, batch_format="pyarrow")


N_BUCKET_PARTS = 64


def _add_bucket_part(t: pa.Table, n_parts: int = N_BUCKET_PARTS) -> pa.Table:
    """Partition key = hash(band, bucket) % n_parts — all members of a
    bucket land in one partition; partition count stays bounded so the
    per-partition work is one vectorized pass (not one python call per
    tiny bucket)."""
    band = t.column("band").to_numpy(zero_copy_only=False).astype(np.uint64)
    bucket = t.column("bucket").to_numpy(zero_copy_only=False).view(np.uint64)
    with np.errstate(over="ignore"):
        h = (band * np.uint64(0x9E3779B97F4A7C15) ^ bucket) * np.uint64(0xFF51AFD7ED558CCD)
    return t.append_column("__part", pa.array((h % np.uint64(n_parts)).astype(np.int64), pa.int64()))


def _runs_with_dups(bands: np.ndarray, buckets: np.ndarray, ids: np.ndarray):
    """Yield id-arrays of buckets holding ≥2 distinct ids (vectorized
    run detection over a lexsorted partition; the ≥2 runs are rare so
    the python loop touches only them)."""
    order = np.lexsort((ids, buckets, bands))
    b, k, i = bands[order], buckets[order], ids[order]
    change = np.nonzero((np.diff(b) != 0) | (np.diff(k) != 0))[0] + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [b.size]])
    for s, e in zip(starts, ends):
        if e - s >= 2:
            u = np.unique(i[s:e])
            if u.size >= 2:
                yield u[:BUCKET_CAP]


def _candidate_pair_rows(band_rows: rd.Dataset, id_col: str) -> rd.Dataset:
    """LSH buckets → raw candidate id pairs as a DATASET. Bucket size
    capped. May contain cross-partition duplicates (a pair that shares
    buckets in several bands lands in several ``__part`` groups) —
    dedup is the caller's job (driver ``drop_duplicates`` below the
    verify crossover, ``_distinct_pairs_ds`` above it)."""

    def pairs_of_part(g: pa.Table) -> pa.Table:
        out_a, out_b = [], []
        for u in _runs_with_dups(
            g.column("band").to_numpy(zero_copy_only=False),
            g.column("bucket").to_numpy(zero_copy_only=False),
            g.column(id_col).to_numpy(zero_copy_only=False),
        ):
            ai, bi = np.triu_indices(u.size, k=1)
            out_a.append(u[ai])
            out_b.append(u[bi])
        a = np.concatenate(out_a).astype(np.int64) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b).astype(np.int64) if out_b else np.empty(0, np.int64)
        return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})

    return (
        band_rows.map_batches(_add_bucket_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(pairs_of_part, batch_format="pyarrow")
    )


def _distinct_pairs_ds(raw: rd.Dataset, n_parts: int) -> rd.Dataset:
    """Distributed pair dedupe: hash co-group on the PAIR (both
    endpoints feed the partition hash, so every copy of a pair lands
    in one partition), one Arrow distinct per partition. Shuffle
    payload: (int64, int64) rows only."""

    def add_part(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False).view(np.uint64)
        b = t.column("b").to_numpy(zero_copy_only=False).view(np.uint64)
        with np.errstate(over="ignore"):
            h = (a * np.uint64(0x9E3779B97F4A7C15)) ^ (
                b * np.uint64(0xC2B2AE3D27D4EB4F)
            )
        return t.append_column(
            "__part", pa.array((h % np.uint64(n_parts)).astype(np.int64), pa.int64())
        )

    def distinct(g: pa.Table) -> pa.Table:
        return g.select(["a", "b"]).group_by(["a", "b"]).aggregate([])

    return (
        raw.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(distinct, batch_format="pyarrow")
    )


def _u64_of_bytes(buf: np.ndarray) -> np.ndarray:
    """uint64 view of a uint8 byte array; copies only if the slice is
    not 8-byte aligned (numpy refuses unaligned dtype-widening views)."""
    if buf.size == 0:
        return np.empty(0, np.uint64)
    if buf.ctypes.data % 8 == 0 and buf.flags["C_CONTIGUOUS"]:
        return buf.view(np.uint64)
    return np.frombuffer(buf.tobytes(), dtype=np.uint64)


def _sigb_matrix(col) -> np.ndarray:
    """(n, N_PERM) uint64 view of a packed fixed-size-binary sig column
    (the Acero-join-safe wire format — Acero carries binary payloads
    but not list/fixed_size_list ones)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    w = 8 * N_PERM
    start = arr.offset * w
    raw = np.frombuffer(arr.buffers()[1], np.uint8)[start : start + len(arr) * w]
    return _u64_of_bytes(raw).reshape(-1, N_PERM)


_EMPTY_VERIFIED = pa.table({
    "a": pa.array([], pa.int64()),
    "b": pa.array([], pa.int64()),
    "jaccard": pa.array([], pa.float64()),
})


# Above this many expected pair-endpoint ids the collected endpoint
# array stops being broadcastable (same 40 MB int64 budget as
# FILTER_KEYS_BROADCAST_CAP) and the signature pre-filter switches
# from a map-side ``is_in`` to an endpoint semi-join.
SIG_ENDPOINT_BROADCAST_CAP = 5_000_000


def _verify_pairs_distributed(
    ds: rd.Dataset,
    sig_ds: rd.Dataset,
    pairs: rd.Dataset,
    id_col: str,
    text_col: str,
    tau: float,
    n_parts: int,
    n_pairs: int | None = None,
) -> rd.Dataset:
    """Distributed candidate verify — the scale twin of the driver-side
    estimate+exact pass (the round-4 verdict's last scale-killer; the
    reference's analogous stage is the streaming overlap pipeline,
    lqmap.c:752-856). Pairs stay a Dataset end-to-end:

    1. the corpus signature set is pre-filtered to PAIR ENDPOINTS
       (only endpoint ids can match the inner joins below) — map-side
       ``is_in`` against a broadcast endpoint array when the 2×n_pairs
       bound fits ``SIG_ENDPOINT_BROADCAST_CAP``, else one endpoint
       semi-join — so neither signature join ever shuffles
       corpus-sized payload; both signatures are then attached via two
       endpoint-bounded hash co-group joins (Acero carries them as
       fixed-width ``binary`` — 512 B/row; Acero rejects list
       payloads) and the Jaccard ESTIMATE prefilter drops far pairs
       inside the join partitions;
    2. shingle SETS are computed once per surviving endpoint — a
       semi-join of the corpus against the endpoint id set (narrow
       int64 shuffle; no driver ``value_set`` broadcast), packed as
       variable ``binary``;
    3. both shingle sets join onto the surviving pairs the same way
       and exact Jaccard runs as ONE vectorized lexsort-intersection
       per batch (per-side shingles are unique, so cross-side
       adjacent-equal runs count the intersection exactly —
       bit-identical to the driver path's ``np.intersect1d``,
       pinned in tests).

    Nothing corpus-sized ever collects to the driver, and nothing
    candidate-sized does either except the ≤40 MB endpoint-id array on
    the broadcast branch (the semi-join branch above the cap collects
    nothing); every shuffle moves (int64, int64) pair rows or
    pair+payload rows bounded by endpoint / estimate-survivor counts."""
    from .util import hash_anti_semi_join, hash_join, scale_cap

    def endpoint_rows(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table({
            "need_id": pa.array(np.unique(np.concatenate([a, b])), pa.int64())
        })

    # pairs feeds the endpoint pre-filter AND the joins: materialize
    # once (distinct (int64, int64) rows — bounded)
    pairs = pairs.materialize()

    cap = scale_cap("SIG_ENDPOINT_BROADCAST", SIG_ENDPOINT_BROADCAST_CAP)
    if n_pairs is not None and 2 * n_pairs <= cap:
        need_np = np.unique(
            pairs.map_batches(endpoint_rows, batch_format="pyarrow")
            .to_pandas()["need_id"].to_numpy()
        )
        need_ids = pa.array(need_np, pa.int64())
        sig_need = sig_ds.map_batches(
            lambda t: t.filter(pc.is_in(t.column(id_col), value_set=need_ids)),
            batch_format="pyarrow",
        )
    else:
        sig_need = hash_anti_semi_join(
            sig_ds,
            pairs.map_batches(endpoint_rows, batch_format="pyarrow"),
            id_col, "need_id", semi=True, n_parts=n_parts,
        )
    # two consumers (sig_a / sig_b) — materialize the endpoint-bounded
    # filtered set so the corpus scan runs once
    sig_need = sig_need.materialize()

    def pack_sigs(new_id: str, new_col: str):
        def fn(t: pa.Table) -> pa.Table:
            m = np.ascontiguousarray(_sig_matrix(t))
            arr = pa.Array.from_buffers(
                pa.binary(8 * N_PERM), m.shape[0], [None, pa.py_buffer(m.tobytes())]
            )
            return pa.table({new_id: t.column(id_col), new_col: arr})

        return fn

    sig_a = sig_need.map_batches(pack_sigs("__ida", "__siga"), batch_format="pyarrow")
    sig_b = sig_need.map_batches(pack_sigs("__idb", "__sigb"), batch_format="pyarrow")
    j = hash_join(
        pairs, sig_a, "a", "__ida", n_parts=n_parts,
        post=lambda t: t.drop_columns(["__ida"]),
    )
    j = hash_join(
        j, sig_b, "b", "__idb", n_parts=n_parts,
        post=lambda t: t.drop_columns(["__idb"]),
    )

    def est_filter(t: pa.Table) -> pa.Table:
        ma = _sigb_matrix(t.column("__siga"))
        mb = _sigb_matrix(t.column("__sigb"))
        est = (ma == mb).sum(axis=1) / float(N_PERM)
        return t.select(["a", "b"]).filter(pa.array(est >= tau - 0.2))

    surv = j.map_batches(est_filter, batch_format="pyarrow").materialize()
    if surv.count() == 0:
        return rd.from_arrow(_EMPTY_VERIFIED)

    need = surv.map_batches(endpoint_rows, batch_format="pyarrow")
    docs_cand = hash_anti_semi_join(
        ds, need, id_col, "need_id", semi=True, n_parts=n_parts
    )

    def pack_shingles(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        shs = [_shingle_hashes(x) for x in texts]
        lens = np.array([s.size for s in shs], np.int64)
        flat = np.concatenate(shs) if shs else np.empty(0, np.uint64)
        # large_binary (int64 offsets): a batch of long docs can carry
        # >2 GiB of shingle hashes, where int32 offsets would wrap
        # silently into corrupt Arrow offsets
        offs = np.zeros(len(shs) + 1, dtype=np.int64)
        offs[1:] = np.cumsum(lens * 8)
        arr = pa.Array.from_buffers(
            pa.large_binary(), len(shs),
            [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(flat.tobytes())],
        )
        return pa.table({id_col: t.column(id_col), "__sh": arr})

    # materialized: both per-side joins consume it — without this the
    # semi-join + shingling would execute twice
    sh_ds = docs_cand.map_batches(pack_shingles, batch_format="pyarrow").materialize()
    sh_a = sh_ds.map_batches(
        lambda t: pa.table({"__ida": t.column(id_col), "__sha": t.column("__sh")}),
        batch_format="pyarrow",
    )
    sh_b = sh_ds.map_batches(
        lambda t: pa.table({"__idb": t.column(id_col), "__shb": t.column("__sh")}),
        batch_format="pyarrow",
    )
    v = hash_join(
        surv, sh_a, "a", "__ida", n_parts=n_parts,
        post=lambda t: t.drop_columns(["__ida"]),
    )
    v = hash_join(
        v, sh_b, "b", "__idb", n_parts=n_parts,
        post=lambda t: t.drop_columns(["__idb"]),
    )

    def exact(t: pa.Table) -> pa.Table:
        from ..kernels.text import _arrow_flat_bytes

        n = t.num_rows
        if n == 0:
            return _EMPTY_VERIFIED
        buf_a, offs_a, _ = _arrow_flat_bytes(t.column("__sha"))
        buf_b, offs_b, _ = _arrow_flat_bytes(t.column("__shb"))
        va, vb = _u64_of_bytes(buf_a), _u64_of_bytes(buf_b)
        la, lb = np.diff(offs_a) // 8, np.diff(offs_b) // 8
        pidx = np.concatenate([
            np.repeat(np.arange(n, dtype=np.int64), la),
            np.repeat(np.arange(n, dtype=np.int64), lb),
        ])
        vals = np.concatenate([va, vb])
        order = np.lexsort((vals, pidx))
        p2, v2 = pidx[order], vals[order]
        dup = (p2[1:] == p2[:-1]) & (v2[1:] == v2[:-1])
        inter = np.bincount(p2[1:][dup], minlength=n)
        union = la + lb - inter
        jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        keep = pa.array(jac >= tau)
        return pa.table({
            "a": t.column("a"), "b": t.column("b"),
            "jaccard": pa.array(jac, pa.float64()),
        }).filter(keep)

    return v.map_batches(exact, batch_format="pyarrow")


def _connected_components(pairs: pd.DataFrame) -> dict[int, int]:
    """Union-find over verified pairs → {doc_id: cluster_rep(min id)}.

    Verified near-dup pairs are a vanishing fraction of the corpus, so
    driver-side union-find is the right call even at 10^12 rows as
    long as the dup *graph* fits (it does for dedup workloads); the
    fallback is iterated min-label propagation via groupby joins."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return {x: find(x) for x in list(parent)}


def _connected_components_strs(a: list[str], b: list[str]) -> dict[str, str]:
    """String-keyed twin of ``_connected_components`` (same path-halving
    union-find, min-STRING representative) — for pair graphs whose node
    ids are opaque strings (audio clip_ids). Same driver-side scope:
    the dup graph, not the corpus."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for xa, xb in zip(a, b):
        ra, rb = find(xa), find(xb)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return {x: find(x) for x in list(parent)}


def connected_components_lp(pairs: rd.Dataset, max_iters: int = 64) -> rd.Dataset:
    """Distributed min-label propagation over an edge Dataset (a, b) —
    the scale fallback ``_connected_components`` documents, as a REAL
    operator for when the dup graph itself no longer fits the driver.

    Per round, a node's new label is the min of:
    (1) its own label,
    (2) its neighbors' labels (labels hash-joined onto the
        SYMMETRIZED edge list — one co-located join, labels flow both
        directions),
    (3) its label's label (pointer jumping: labels joined onto
        themselves), which halves chain depth each round, so long
        paths converge in O(log n) rounds, not O(diameter).
    Every shuffle carries (node, label) int64 pairs only; labels only
    decrease, so one tiny Sum aggregate per round detects the
    fixpoint. Returns a Dataset (node, label = component min id);
    equality with driver union-find is pinned in tests. Valid because
    every label is itself a node id present in the labels table (min
    of endpoint ids, inductively preserved by min-merging)."""
    from ray.data.aggregate import Sum

    from .util import hash_join

    def seed(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.minimum(a, b)
        return pa.table({
            "node": pa.array(np.concatenate([a, b]), pa.int64()),
            "label": pa.array(np.concatenate([lo, lo]), pa.int64()),
        })

    def sym(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "src": pa.array(np.concatenate([a, b]), pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), pa.int64()),
        })

    edges = pairs.map_batches(sym, batch_format="pyarrow").materialize()
    # partition count follows the GRAPH size (this operator exists for
    # graphs too big for the driver — a fixed 8 would make each
    # per-partition join task hold |E|/8 rows); count() on the
    # materialized edges is metadata-only
    from .util import scaled_parts

    n_parts = scaled_parts(edges.count())
    def to_arrow(t: pa.Table) -> pa.Table:
        return t  # identity pass pins Arrow block type for union()

    from .util import hash_grouped_agg

    labels = (
        hash_grouped_agg(
            pairs.map_batches(seed, batch_format="pyarrow"),
            keys=["node"], mins=("label",), n_parts=n_parts,
        )
        .map_batches(to_arrow, batch_format="pyarrow")
        .materialize()
    )
    sig = int(labels.aggregate(Sum("label", alias_name="s"))["s"])

    for _ in range(max_iters):
        # (2) neighbor labels: label(src) proposed to dst
        neigh = hash_join(
            edges,
            labels.map_batches(
                lambda t: pa.table({"src_l": t.column("node"), "l": t.column("label")}),
                batch_format="pyarrow",
            ),
            "src", "src_l", n_parts=n_parts,
        ).map_batches(
            lambda t: pa.table({"node": t.column("dst"), "label": t.column("l")}),
            batch_format="pyarrow",
        )
        # (3) pointer jump: label(label(v)) proposed to v
        jump = hash_join(
            labels.map_batches(
                lambda t: pa.table({"v": t.column("node"), "l1": t.column("label")}),
                batch_format="pyarrow",
            ),
            labels.map_batches(
                lambda t: pa.table({"n2": t.column("node"), "l2": t.column("label")}),
                batch_format="pyarrow",
            ),
            "l1", "n2", n_parts=n_parts,
        ).map_batches(
            lambda t: pa.table({"node": t.column("v"), "label": t.column("l2")}),
            batch_format="pyarrow",
        )
        labels = (
            hash_grouped_agg(
                labels.union(neigh).union(jump),
                keys=["node"], mins=("label",), n_parts=n_parts,
            )
            .map_batches(to_arrow, batch_format="pyarrow")
            .materialize()
        )
        new_sig = int(labels.aggregate(Sum("label", alias_name="s"))["s"])
        if new_sig == sig:  # labels only decrease → equal sum = fixpoint
            break
        sig = new_sig
    return labels


VERIFY_DRIVER_CAP = 200_000  # raw candidate pairs


def minhash_near_dups(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    tau: float = JACCARD_TAU,
) -> pd.DataFrame:
    """Full MinHash-LSH near-dup pipeline over any (id, text) dataset.

    Returns verified pairs (a, b, jaccard) with jaccard ≥ tau.
    Signatures are computed once (materialized narrow dataset) and
    reused by banding AND the estimate prefilter.

    Crossover discipline (same shape as ``dup_components``): below
    ``VERIFY_DRIVER_CAP`` raw candidate pairs, the driver verify wins
    — dedupe + estimate + exact on collected pairs, texts re-read only
    for near-threshold docs (pruned ``is_in``). Above it, the pair
    frame and shingle dict no longer belong on the driver:
    ``_verify_pairs_distributed`` keeps pairs a Dataset end-to-end
    (co-grouped estimate + in-partition exact Jaccard). Identical
    output either way (pinned in tests via a forced cap of 0); only
    the tiny VERIFIED pair set — a vanishing fraction of candidates —
    ever reaches the driver on either path."""
    from .util import scale_cap, scaled_parts

    sig_ds = _sig_ds(ds, id_col, text_col)
    raw = _candidate_pair_rows(_band_rows(sig_ds, id_col), id_col).materialize()
    n_raw = raw.count()
    empty = pd.DataFrame({
        "a": np.empty(0, np.int64), "b": np.empty(0, np.int64),
        "jaccard": np.empty(0, np.float64),
    })
    if n_raw == 0:
        return empty
    if n_raw > scale_cap("MINHASH_VERIFY_DRIVER", VERIFY_DRIVER_CAP):
        n_parts = scaled_parts(n_raw, rows_per_part=500_000)
        out = _verify_pairs_distributed(
            ds, sig_ds, _distinct_pairs_ds(raw, n_parts),
            id_col, text_col, tau, n_parts, n_pairs=n_raw,
        ).to_pandas()
        if out.empty:
            return empty
        return out.sort_values(["a", "b"], kind="stable").reset_index(drop=True)

    pairs = raw.to_pandas().drop_duplicates(ignore_index=True)
    pa_np = pairs["a"].to_numpy().astype(np.int64)
    pb_np = pairs["b"].to_numpy().astype(np.int64)
    cand_ids = pa.array(np.unique(np.concatenate([pa_np, pb_np])), pa.int64())

    # vectorized MinHash-estimate prefilter: a low-vocabulary corpus
    # floods LSH buckets with candidates (98k pairs on the 5k-doc
    # bench); estimating jaccard from signature agreement is one
    # gather+mean over all pairs, and only near-threshold survivors
    # pay the exact set intersection. Sigs come from the materialized
    # sig dataset (Arrow refs, no pandas object stacking).
    sig_tbl = concat_blocks(
        ray.get(
            sig_ds.map_batches(
                lambda t: t.filter(pc.is_in(t.column(id_col), value_set=cand_ids)),
                batch_format="pyarrow",
            ).to_arrow_refs()
        )
    )
    ids_arr = sig_tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids_arr, kind="stable")
    sorted_ids = ids_arr[order]
    sigs = _sig_matrix(sig_tbl)[order]
    ai = np.searchsorted(sorted_ids, pa_np)
    bi = np.searchsorted(sorted_ids, pb_np)
    # per-column accumulation, NOT (n_pairs, N_PERM) gathers: the big
    # fresh intermediates (~100 MB at 98k pairs) cost ~2 s of
    # first-touch page faults on this VM; 64 small reused temporaries
    # do the same work in ~50 ms
    match = np.zeros(ai.size, dtype=np.int16)
    for j in range(N_PERM):
        match += sigs[ai, j] == sigs[bi, j]
    est = match / float(N_PERM)
    maybe = est >= tau - 0.2
    idx = np.nonzero(maybe)[0]
    if idx.size == 0:
        return empty

    # shingle sets ONLY for docs in near-threshold pairs (usually a
    # tiny slice of the candidate set), computed distributed
    need_ids = pa.array(np.unique(np.concatenate([pa_np[idx], pb_np[idx]])), pa.int64())

    def fetch_shingles(t: pa.Table) -> pa.Table:
        f = t.filter(pc.is_in(t.column(id_col), value_set=need_ids))
        texts = f.column(text_col).to_pylist()
        return pa.table({
            id_col: f.column(id_col),
            "sh": pa.array(
                [_shingle_hashes(x).view(np.int64) for x in texts],
                pa.list_(pa.int64()),
            ),
        })

    sh_tbl = concat_blocks(
        ray.get(ds.map_batches(fetch_shingles, batch_format="pyarrow").to_arrow_refs())
    )
    sh = {
        int(i): np.asarray(s, dtype=np.int64).view(np.uint64)
        for i, s in zip(sh_tbl.column(id_col).to_pylist(), sh_tbl.column("sh").to_pylist())
    }
    jac = np.zeros(len(pairs))
    for j in idx:
        sa, sb = sh[int(pa_np[j])], sh[int(pb_np[j])]
        inter = np.intersect1d(sa, sb).size
        union = sa.size + sb.size - inter
        jac[j] = inter / union if union else 0.0
    keep = jac >= tau
    return pd.DataFrame({
        "a": pa_np[keep],
        "b": pb_np[keep],
        "jaccard": jac[keep],
    }).reset_index(drop=True)


def dedup_minhash(sf_dir: str, components: str = "driver") -> rd.Dataset:
    """Per-doc near-dup verdict over documents: (doc_id, dup_of, keep).

    keep=False iff the doc belongs to a verified near-dup cluster and
    is not its min-id representative. The verdict is emitted by a
    ``map_batches`` join against the broadcast component map (sorted
    key/value arrays + ``np.searchsorted``): only the tiny dup-cluster
    map ever reaches the driver — the id column never collects.

    ``components`` picks the clustering engine: ``"driver"`` runs
    union-find on the verified-pair frame (right up to ~10^8 pairs);
    ``"distributed"`` runs ``connected_components_lp`` (min-label
    propagation + pointer jumping over a pairs Dataset) for when even
    the dup GRAPH outgrows one machine. Identical output either way
    (pinned in tests); the broadcast of the resulting cluster map is
    bounded by the dup-cluster member count, not the corpus."""
    ds = table(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = minhash_near_dups(ds)
    if components == "distributed" and len(pairs):
        lbl = connected_components_lp(
            rd.from_arrow(pa.table({
                "a": pa.array(pairs["a"].to_numpy(), pa.int64()),
                "b": pa.array(pairs["b"].to_numpy(), pa.int64()),
            }))
        ).to_pandas()
        comp = dict(zip(lbl["node"].astype(np.int64), lbl["label"].astype(np.int64)))
    else:
        comp = _connected_components(pairs[["a", "b"]])
    keys = np.fromiter(comp.keys(), dtype=np.int64, count=len(comp))
    vals = np.fromiter(comp.values(), dtype=np.int64, count=len(comp))
    order = np.argsort(keys, kind="stable")
    comp_ref = ray.put((keys[order], vals[order]))

    def verdict(t: pa.Table) -> pa.Table:
        k_s, v_s = ray.get(comp_ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        dup_of = ids.copy()
        if k_s.size:
            pos = np.clip(np.searchsorted(k_s, ids), 0, k_s.size - 1)
            hit = k_s[pos] == ids
            dup_of[hit] = v_s[pos[hit]]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "dup_of": pa.array(dup_of, pa.int64()),
            "keep": pa.array(dup_of == ids, pa.bool_()),
        })

    return table(sf_dir, "documents", columns=["doc_id"]).map_batches(
        verdict, batch_format="pyarrow"
    )


# ---------------------------------------------------------------- simhash

def simhash64_batch(texts: list[str]) -> np.ndarray:
    """64-bit SimHash over hashed word features (public construction:
    sign-sum of feature-hash bits weighted by term frequency).

    Vectorized across the WHOLE batch: all word occurrences flatten
    into one array, unique words are hashed once via the shared
    ``fnv1a_64_varlen_np`` kernel over a zero-padded byte matrix
    (length-aware, so a word's hash never depends on the batch's max
    word width — batch-boundary invariant), the ±1 bit contributions
    gather by inverse index, and the per-doc sign-sums reduce with one
    ``np.add.reduceat``. Summing ±1 per occurrence equals the
    term-frequency weighting exactly, so no per-doc unique pass is
    needed. No per-row Python beyond split()."""
    from ..kernels.text import fnv1a_64_varlen_np

    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    words_per_doc = [t.lower().split() for t in texts]
    lens = np.array([len(w) for w in words_per_doc], dtype=np.int64)
    flat = [w for ws in words_per_doc for w in ws]
    if not flat:
        return out
    uniq, inv = np.unique(np.asarray(flat, dtype=object), return_inverse=True)
    enc = [w.encode("utf-8", "replace") for w in uniq]
    elens = np.array([len(e) for e in enc], dtype=np.int64)
    width = int(elens.max())
    mat = np.frombuffer(
        np.array(enc, dtype=f"S{width}").tobytes(), dtype=np.uint8
    ).reshape(len(enc), width)
    hs = fnv1a_64_varlen_np(mat, elens)
    bit_idx = np.arange(64, dtype=np.uint64)
    pm = (((hs[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int32) * 2 - 1)
    contrib = pm[inv]
    nz = np.nonzero(lens)[0]
    starts = np.concatenate([[0], np.cumsum(lens)])[:-1][nz]
    acc = np.add.reduceat(contrib, starts, axis=0)
    # distinct powers of two per column, so the sum IS the bitwise OR
    out[nz] = ((acc > 0).astype(np.uint64) << bit_idx[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    return out


def simhash_docs(sf_dir: str) -> rd.Dataset:
    """Per-doc 64-bit simhash (emitted bit-cast to int64)."""
    ds = table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        sh = simhash64_batch(batch.column("text").to_pylist())
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "simhash": pa.array(sh.view(np.int64), pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=2048)


def _simhash_pairs_raw(sf_dir: str, hamming_max: int = HAMMING_MAX) -> rd.Dataset:
    """Verified SimHash near-dup pairs as a DATASET (RAW: a pair found
    by several bands appears once per band) — banded pigeonhole
    buckets (any pair within Hamming ≤ 3 shares at least one of 4
    16-bit bands), exact Hamming verify inside bucket partitions.
    Dedupe crosses over on the pair count: driver ``drop_duplicates``
    below the cap (band copies are ≤ 4×, trivial at small scale),
    ``_simhash_distinct_ds`` above it, so the pair graph never
    materializes driver-side on the scale path."""
    sh = simhash_docs(sf_dir)

    def explode(batch: pa.Table) -> pa.Table:
        h = batch.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n = h.size
        bands = np.empty((n, SIMHASH_BANDS), dtype=np.int64)
        for b in range(SIMHASH_BANDS):
            bands[:, b] = ((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, SIMHASH_BANDS), pa.int64()),
            "simhash": pa.array(np.repeat(h.view(np.int64), SIMHASH_BANDS), pa.int64()),
            "band": pa.array(np.tile(np.arange(SIMHASH_BANDS, dtype=np.int64), n), pa.int64()),
            "bucket": pa.array(bands.reshape(-1), pa.int64()),
        })

    def pairs_of_part(g: pa.Table) -> pa.Table:
        did = g.column("doc_id").to_numpy(zero_copy_only=False)
        id2hash = dict(zip(did, g.column("simhash").to_numpy(zero_copy_only=False)))
        out_a, out_b, out_h = [], [], []
        for u in _runs_with_dups(
            g.column("band").to_numpy(zero_copy_only=False),
            g.column("bucket").to_numpy(zero_copy_only=False),
            did,
        ):
            hs = np.array([id2hash[i] for i in u], dtype=np.int64).view(np.uint64)
            ai, bi = np.triu_indices(u.size, k=1)
            # vectorized popcount (numpy 1.26 has no bitwise_count):
            # unpack each xor'd u64's 8 bytes to bits and row-sum
            xor = hs[ai] ^ hs[bi]
            ham = (
                np.unpackbits(xor.view(np.uint8).reshape(-1, 8), axis=1)
                .sum(axis=1)
                .astype(np.int64)
            )
            ok = ham <= hamming_max
            out_a.append(u[ai[ok]])
            out_b.append(u[bi[ok]])
            out_h.append(ham[ok])
        a = np.concatenate(out_a).astype(np.int64) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b).astype(np.int64) if out_b else np.empty(0, np.int64)
        hm = np.concatenate(out_h).astype(np.int64) if out_h else np.empty(0, np.int64)
        return pa.table({
            "a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64()),
            "hamming": pa.array(hm, pa.int64()),
        })

    return (
        sh.map_batches(explode, batch_format="pyarrow")
        .map_batches(_add_bucket_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(pairs_of_part, batch_format="pyarrow")
    )


def _simhash_distinct_ds(raw: rd.Dataset) -> rd.Dataset:
    """Distributed distinct over raw (band-duplicated) simhash pairs:
    hash co-group on the pair, one Arrow group_by per partition."""

    def add_pair_part(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False).view(np.uint64)
        b = t.column("b").to_numpy(zero_copy_only=False).view(np.uint64)
        with np.errstate(over="ignore"):
            h = (a * np.uint64(0x9E3779B97F4A7C15)) ^ (
                b * np.uint64(0xC2B2AE3D27D4EB4F)
            )
        return t.append_column(
            "__pp", pa.array((h % np.uint64(N_BUCKET_PARTS)).astype(np.int64), pa.int64())
        )

    def distinct(g: pa.Table) -> pa.Table:
        # every copy of a pair carries the SAME hamming (it is a
        # function of the pair), so min() just picks that value
        out = g.group_by(["a", "b"]).aggregate([("hamming", "min")])
        return out.select(["a", "b", "hamming_min"]).rename_columns(
            ["a", "b", "hamming"]
        )

    return (
        raw.map_batches(add_pair_part, batch_format="pyarrow")
        .groupby("__pp")
        .map_groups(distinct, batch_format="pyarrow")
    )


SIMHASH_PAIRS_DRIVER_CAP = 200_000  # raw pairs; crossover to the distributed distinct


def simhash_near_dups(sf_dir: str, hamming_max: int = HAMMING_MAX) -> pd.DataFrame:
    """Near-dup pairs by SimHash. Below the raw-pair cap the band
    dedupe is a driver ``drop_duplicates`` (microseconds at bench
    scale); above it the distributed distinct runs first and only the
    distinct pairs collect."""
    from .util import scale_cap

    raw = _simhash_pairs_raw(sf_dir, hamming_max).materialize()
    if raw.count() >= scale_cap("SIMHASH_PAIRS_DRIVER", SIMHASH_PAIRS_DRIVER_CAP):
        pairs = _simhash_distinct_ds(raw).to_pandas()
    else:
        pairs = raw.to_pandas().drop_duplicates(ignore_index=True)
    if pairs.empty:
        return pd.DataFrame({
            "a": np.empty(0, np.int64), "b": np.empty(0, np.int64),
            "hamming": np.empty(0, np.int64),
        })
    return pairs[["a", "b", "hamming"]]


def ngram_jaccard_pairs(sf_dir: str, tau: float = JACCARD_TAU) -> pd.DataFrame:
    """Standalone exact n-gram-Jaccard verifier exposed as an operator:
    verified near-dup pairs over documents (a, b, jaccard)."""
    ds = table(sf_dir, "documents", columns=["doc_id", "text"])
    return minhash_near_dups(ds, tau=tau)


LP_MIN_PAIRS = 100_000


def dup_components(sf_dir: str, lp_min_pairs: int = LP_MIN_PAIRS) -> rd.Dataset:
    """Connected components of the simhash near-dup graph — the query
    surface for the components engines behind ``dedup_minhash``.
    Output: (node, label) where label is the component's min doc_id;
    the DuckDB oracle recomputes the same closure with a recursive CTE
    over the replicated simhash pairs.

    Engine crossover (the repo-wide broadcast/shuffle discipline):
    below ``lp_min_pairs`` verified pairs the driver union-find wins —
    label propagation pays a FIXED ~4-6 shuffle rounds regardless of
    graph size (measured 26.8 s on a few-hundred-edge graph where
    union-find takes milliseconds). Above it, the pair frame no longer
    belongs on the driver and ``connected_components_lp`` takes over —
    fed the pair DATASET directly (the crossover decision needs only
    ``count()`` on the materialized pairs, so above the cap the graph
    never touches the driver); both engines' outputs are pinned equal
    in tests."""
    from .util import scale_cap

    raw = _simhash_pairs_raw(sf_dir).materialize()
    n_raw = raw.count()
    if n_raw == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "label": pa.array([], pa.int64()),
        }))
    # raw count (≥ distinct count, ≤ 4× it) decides the engine WITHOUT
    # collecting: above the cap, the distributed distinct feeds label
    # propagation directly and the graph never touches the driver
    if n_raw >= scale_cap("LP_MIN_PAIRS", lp_min_pairs):
        return connected_components_lp(
            _simhash_distinct_ds(raw).map_batches(
                lambda t: t.select(["a", "b"]), batch_format="pyarrow"
            )
        )
    pairs = raw.to_pandas().drop_duplicates(ignore_index=True)
    comp = _connected_components(pairs[["a", "b"]])
    nodes = np.fromiter(comp.keys(), dtype=np.int64, count=len(comp))
    labels = np.fromiter(comp.values(), dtype=np.int64, count=len(comp))
    return rd.from_arrow(pa.table({
        "node": pa.array(nodes, pa.int64()),
        "label": pa.array(labels, pa.int64()),
    }))
