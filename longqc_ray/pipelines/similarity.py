"""Similarity search over the ``embeddings`` table (list<float> column).

- ``ann_topk``: brute-force cosine top-k — the exactness baseline.
  Query matrix is broadcast once (``ray.put``); every batch does one
  float64 matmul against it and emits only its LOCAL top-k rows per
  query, so the driver merge sees ≤ k × n_blocks tiny rows. This is
  the shape that scales: compute is one GEMM per block, shuffle is
  nearly nothing, and the corpus streams.
- ``ann_lsh``: the scale path — random-hyperplane LSH buckets; each
  query searches only its bucket (probing mirrored bits). Recall vs
  the brute-force baseline is pinned in tests.
- ``embedding_near_dups``: cosine near-dup pairs (threshold), the
  embedding rung of the dedup ladder.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .util import concat_blocks, table

TOP_K = 5
N_QUERIES = 10
NEAR_DUP_COS = 0.95
LSH_BITS = 8
_LSH_SEED = 7_2024


def _emb_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(ids int64[n], unit-normalized float64[n, d]) from an Arrow batch."""
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    col = batch.column("embedding")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    d = flat.size // max(len(ids), 1)
    m = flat.reshape(len(ids), d)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return ids, m / norms


def _collect_where(sf_dir: str, pred) -> pa.Table:
    """Small-side collect: vectorized filter per batch, then concat.
    An ALL-empty result is legitimate here (an empty embeddings table
    is a routine empty partition, and a predicate may match nothing),
    so it returns a typed empty table from the parquet schema rather
    than routing through ``concat_blocks``' invariant error."""
    import pyarrow.parquet as pq

    from .util import table_files

    ds = table(sf_dir, "embeddings", columns=["vec_id", "embedding"]).map_batches(
        lambda t: t.filter(pred(t.column("vec_id"))), batch_format="pyarrow"
    )
    blocks = [b for b in ray.get(ds.to_arrow_refs()) if b.num_columns]
    if blocks:
        return pa.concat_tables(blocks)
    sch = pq.read_schema(table_files(sf_dir, "embeddings")[0])
    return pa.schema(
        [(c, sch.field(c).type) for c in ("vec_id", "embedding")]
    ).empty_table()


def _query_matrix(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.compute as pc

    tbl = _collect_where(sf_dir, lambda col: pc.less(col, n_queries))
    return _emb_matrix(tbl)


def ann_topk(sf_dir: str, k: int = TOP_K, n_queries: int = N_QUERIES) -> pd.DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank), self excluded,
    ties broken by neighbor_id ascending. The brute-force baseline is
    just ``_exact_rerank`` over the FULL table (same per-batch GEMM +
    local top-k + tiny driver merge the LSH/IVF paths use after their
    candidate pruning — one kernel, not two drifting copies)."""
    q_ids, q_mat = _query_matrix(sf_dir, n_queries)
    return _exact_rerank(
        table(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        q_ids, q_mat, k,
    )


# ---------------------------------------------------------------- LSH path

def _hyperplanes(d: int) -> np.ndarray:
    rng = np.random.default_rng(_LSH_SEED)
    return rng.standard_normal((LSH_BITS, d))


def _embedding_dim(sf_dir: str, default: int = 64) -> int:
    """Dimension of the embeddings table's ``embedding`` column, read
    DRIVER-SIDE from the parquet file: fixed_size_list width straight
    from the schema when typed that way, else one first-row read of
    the first non-empty file. Replaces a ``limit(1)`` probe pipeline
    whose full Ray execution cost ~1 s of fixed overhead per query
    regardless of scale (the schema/footer read is O(1) at any SF)."""
    import pyarrow.parquet as pq

    from .util import table_files

    for f in table_files(sf_dir, "embeddings"):
        typ = pq.read_schema(f).field("embedding").type
        if pa.types.is_fixed_size_list(typ):
            return typ.list_size
        for b in pq.ParquetFile(f).iter_batches(batch_size=1, columns=["embedding"]):
            if b.num_rows:
                return len(b.column(0)[0])
    return default


def _bucket_of(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0.0
    return (bits * (1 << np.arange(LSH_BITS))).sum(axis=1).astype(np.int64)


# --------------------------------------------- bucketed layouts (pruning)
#
# The scale story the stream-filter variants only documented: the
# bucket/cell id becomes a PARTITION KEY. One full pass writes the
# embeddings into a hive-partitioned parquet layout
# (bucket=NN/part-*.parquet via write_parquet(partition_cols=...)),
# and every query afterwards reads ONLY the probed partitions —
# blocks-read proportional to probe count, not corpus size (asserted
# on input_files in tests/test_similarity.py). The build cost is
# amortized across all queries against the same table; layouts are
# cached per (table file identity, params) fingerprint with a
# build-then-atomic-rename so concurrent builders can't interleave.

# Layout root: resolved per call via util.scratch_root (env
# LONGQC_ANN_LAYOUT_ROOT / LONGQC_SCRATCH_ROOT; /tmp default is
# single-node only — on a cluster this MUST be shared storage, since
# every worker's pruned partition read assumes it can see the layout).
_LAYOUT_ROOT_DEFAULT = "/tmp/longqc_ann"
_LAYOUT_MARKER = "_LAYOUT_OK"


def _emb_fingerprint(sf_dir: str, tag: str) -> str:
    """Cache key for the built ANN layouts. For a DIRECTORY table the
    per-file (name, mtime, size) triples are hashed — a part file
    rewritten in place does not bump the parent dir's mtime/size, so a
    dir-level stat would silently serve a layout built from the OLD
    corpus."""
    import hashlib
    import os

    from .util import table_files

    path = os.path.join(sf_dir, "embeddings.parquet")
    parts = []
    for f in table_files(sf_dir, "embeddings"):
        st = os.stat(f)
        parts.append(f"{os.path.relpath(f, path)}:{st.st_mtime_ns}:{st.st_size}")
    key = f"{os.path.abspath(path)}:{';'.join(parts)}:{tag}"
    return hashlib.md5(key.encode()).hexdigest()[:16]


def _ensure_layout(sf_dir: str, tag: str, build) -> str:
    """Idempotent cached layout build: ``build(tmp_dir)`` writes the
    partitioned parquet (+ any sidecar files) into a temp dir; a
    ``_LAYOUT_OK`` marker is written LAST (inside the temp dir, before
    the rename), so completeness is the marker — a directory without
    it (crashed publish on storage without atomic rename) is a corpse
    and gets rebuilt, never trusted. Shared protocol (race / corpse /
    rename-failure semantics): ``util.publish_cached_dir``; root
    resolution and the multi-node shared-storage contract:
    ``util.scratch_root``."""
    import os

    from .util import publish_cached_dir, scratch_root

    root = scratch_root("ANN_LAYOUT", _LAYOUT_ROOT_DEFAULT)
    final = os.path.join(root, _emb_fingerprint(sf_dir, tag))
    return publish_cached_dir(
        final, build, marker_name=_LAYOUT_MARKER, marker_text=f"{tag}\n"
    )


def _lsh_layout(sf_dir: str, d: int) -> str:
    """Hive-partitioned embeddings layout keyed by LSH bucket."""
    planes = _hyperplanes(d)
    planes_ref = ray.put(planes)

    def build(tmp_dir: str) -> None:
        ds = table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

        def add_bucket(batch: pa.Table) -> pa.Table:
            _, m = _emb_matrix(batch)
            bk = _bucket_of(m, ray.get(planes_ref))
            return batch.append_column("bucket", pa.array(bk, pa.int64()))

        ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=4096).write_parquet(
            tmp_dir, partition_cols=["bucket"]
        )

    return _ensure_layout(sf_dir, f"lsh:{LSH_BITS}:{_LSH_SEED}", build)


def _read_partitions(root: str, key: str, values: list[int]) -> rd.Dataset | None:
    """Pruned read: only the hive partitions for ``values`` that exist
    (expanded to their parquet files — Ray's read_parquet takes a file
    list). Returns None when no probed partition exists."""
    import glob
    import os

    files = [
        f
        for v in sorted(values)
        for f in sorted(glob.glob(os.path.join(root, f"{key}={v}", "*.parquet")))
    ]
    if not files:
        return None
    return rd.read_parquet(files, columns=["vec_id", "embedding"])


_EMPTY_TOPK = pd.DataFrame({
    "query_id": np.empty(0, np.int64),
    "neighbor_id": np.empty(0, np.int64),
    "rank": np.empty(0, np.int64),
})


def _probe_buckets(q_buckets: np.ndarray, n_probe_bits: int) -> list[int]:
    probe: set[int] = set()
    for qb in q_buckets:
        probe.add(int(qb))
        for i in range(LSH_BITS):
            probe.add(int(qb) ^ (1 << i))
            if n_probe_bits >= 2:
                for j in range(i + 1, LSH_BITS):
                    probe.add(int(qb) ^ (1 << i) ^ (1 << j))
    return sorted(probe)


def _exact_rerank(
    cand: rd.Dataset, q_ids: np.ndarray, q_mat: np.ndarray, k: int
) -> pd.DataFrame:
    """Exact cosine top-k of each query against a candidate Dataset:
    per-batch GEMM + local top-k, tiny driver merge (≤ k rows per
    query per block)."""
    q_ref = ray.put((q_ids, q_mat))

    def local_topk(batch: pa.Table) -> pa.Table:
        qi, qm = ray.get(q_ref)
        ids, m = _emb_matrix(batch)
        sims = qm @ m.T
        rows = []
        for row in range(qi.size):
            s = sims[row]
            cidx = np.nonzero(ids != qi[row])[0]
            kk = min(k, cidx.size)
            if kk == 0:
                continue
            top = cidx[np.argpartition(-s[cidx], kk - 1)[:kk]]
            rows.append((np.full(kk, qi[row], np.int64), ids[top], s[top]))
        if not rows:
            return pa.table({
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "cos": pa.array([], pa.float64()),
            })
        return pa.table({
            "query_id": pa.array(np.concatenate([r[0] for r in rows]), pa.int64()),
            "neighbor_id": pa.array(np.concatenate([r[1] for r in rows]), pa.int64()),
            "cos": pa.array(np.concatenate([r[2] for r in rows]), pa.float64()),
        })

    parts = cand.map_batches(local_topk, batch_format="pyarrow", batch_size=4096).to_pandas()
    if parts.empty:
        return _EMPTY_TOPK.copy()
    parts = parts.sort_values(
        ["query_id", "cos", "neighbor_id"], ascending=[True, False, True], kind="stable"
    )
    out = parts.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    return out[["query_id", "neighbor_id", "rank"]]


def _embeddings_rows(sf_dir: str) -> int:
    """Footer-only row count of the embeddings table — ONE metadata
    pass serves both the 0-row short-circuit (ANN/cluster queries
    answer with their typed empties instead of building layouts over
    nothing) and the size-scaled IVF training stride."""
    from .util import table_row_count

    return table_row_count(sf_dir, "embeddings")


def ann_lsh(
    sf_dir: str,
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    n_probe_bits: int = 2,
    layout: str = "pruned",
) -> pd.DataFrame:
    """Approximate top-k via random-hyperplane LSH.

    ``layout="pruned"`` (default, the 10^12 shape): the corpus lives in
    a bucket-partitioned parquet layout (built once per table, cached)
    and the query reads ONLY partitions within ``n_probe_bits``
    bit-flips of a query bucket — I/O proportional to probe count.
    ``layout="stream"`` keeps the one-pass filter variant (full scan,
    per-batch bucket filter) for layouts that can't be materialized;
    both return identical rows (asserted in tests)."""
    if _embeddings_rows(sf_dir) == 0:
        return _EMPTY_TOPK.copy()
    q_ids, q_mat = _query_matrix(sf_dir, n_queries)
    d = q_mat.shape[1]
    planes = _hyperplanes(d)
    probe = _probe_buckets(_bucket_of(q_mat, planes), n_probe_bits)

    if layout == "pruned":
        root = _lsh_layout(sf_dir, d)
        cand = _read_partitions(root, "bucket", probe)
        if cand is None:
            return _EMPTY_TOPK.copy()
        return _exact_rerank(cand, q_ids, q_mat, k)

    # streaming fallback: full scan with a per-batch bucket filter
    ctx_ref = ray.put((planes, np.array(probe, dtype=np.int64)))
    ds = table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def keep_probed(batch: pa.Table) -> pa.Table:
        pl, pr = ray.get(ctx_ref)
        _, m = _emb_matrix(batch)
        bk = _bucket_of(m, pl)
        pos = np.clip(np.searchsorted(pr, bk), 0, pr.size - 1)
        return batch.filter(pa.array(pr[pos] == bk))

    cand = ds.map_batches(keep_probed, batch_format="pyarrow", batch_size=4096)
    return _exact_rerank(cand, q_ids, q_mat, k)


# ---------------------------------------------------------------- IVF path

IVF_CENTROIDS = 16
IVF_PROBE = 4
_IVF_TRAIN_STRIDE = 2  # FLOOR: every 2nd vector trains the coarse quantizer
_IVF_TRAIN_MAX = 200_000  # cap on driver-collected training vectors


def _ivf_train_stride(n_rows: int) -> int:
    """Training stride (every stride-th vec_id trains the quantizer),
    scaled so the driver-side training collect stays under
    ``_IVF_TRAIN_MAX`` vectors at any corpus size — a FIXED stride of 2
    would collect half of a 10^9-row table onto the driver. At every
    oracle-checked SF (≤ ~50k embeddings) this resolves to the floor
    value 2 that the static SQL twin embeds, so engine and oracle train
    on the identical sample. ``n_rows`` comes from the footer row count
    (``_embeddings_rows``) — NOT from column min/max statistics, which
    a writer may omit; losing the bound on a stats-less 10^9-row table
    would collect 5e8 vectors onto the driver, the exact failure this
    scaling exists to prevent. Callers compute the count once and pass
    it to every stage that needs the stride."""
    return max(_IVF_TRAIN_STRIDE, -(-n_rows // _IVF_TRAIN_MAX))


def _kmeans_cosine(m: np.ndarray, k: int, iters: int = 10) -> np.ndarray:
    """Deterministic spherical k-means (no RNG — seeds are evenly
    spaced rows of the id-ordered training sample, so any worker
    rebuilds the identical codebook; Date/rand-free by design)."""
    k = min(k, len(m))
    cent = m[np.linspace(0, len(m) - 1, k).astype(np.int64)].copy()
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(k):
            members = m[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def _train_codebook(sf_dir: str, n_centroids: int, stride: int) -> np.ndarray:
    train_tbl = _collect_where(
        sf_dir,
        lambda col: pa.array(col.to_numpy(zero_copy_only=False) % stride == 0),
    )
    _, train_m = _emb_matrix(train_tbl)
    return _kmeans_cosine(train_m, n_centroids)


def _ivf_layout(sf_dir: str, n_centroids: int, stride: int) -> str:
    """Hive-partitioned embeddings layout keyed by IVF cell, with the
    trained codebook stored beside it (codebook.npy) so queries never
    retrain."""
    import os

    def build(tmp_dir: str) -> None:
        cent = _train_codebook(sf_dir, n_centroids, stride)
        cent_ref = ray.put(cent)
        ds = table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

        def add_cell(batch: pa.Table) -> pa.Table:
            _, m = _emb_matrix(batch)
            cell = np.argmax(m @ ray.get(cent_ref).T, axis=1).astype(np.int64)
            return batch.append_column("cell", pa.array(cell, pa.int64()))

        ds.map_batches(add_cell, batch_format="pyarrow", batch_size=4096).write_parquet(
            tmp_dir, partition_cols=["cell"]
        )
        np.save(os.path.join(tmp_dir, "codebook.npy"), cent)

    return _ensure_layout(sf_dir, f"ivf:{n_centroids}:{stride}", build)


def ann_ivf(
    sf_dir: str,
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    n_centroids: int = IVF_CENTROIDS,
    n_probe: int = IVF_PROBE,
    layout: str = "pruned",
) -> pd.DataFrame:
    """IVF approximate top-k — the scale path next to ``ann_lsh``: a
    coarse k-means codebook trained once on a strided sample, each
    query probes its ``n_probe`` nearest cells.

    ``layout="pruned"`` (default): the corpus lives in a
    cell-partitioned parquet layout (built once per table, cached;
    codebook stored beside it) and the query reads ONLY the probed
    cells' partitions — I/O proportional to probe count, the real IVF
    contract. ``layout="stream"``: one-pass variant (full scan, cells
    assigned and filtered per batch). Identical rows either way
    (asserted in tests); recall vs brute force is pinned in
    tests/test_similarity.py."""
    n_rows = _embeddings_rows(sf_dir)  # ONE footer pass: empty check + stride
    if n_rows == 0:
        return _EMPTY_TOPK.copy()
    import os

    stride = _ivf_train_stride(n_rows)
    q_ids, q_mat = _query_matrix(sf_dir, n_queries)

    if layout == "pruned":
        root = _ivf_layout(sf_dir, n_centroids, stride)
        cent = np.load(os.path.join(root, "codebook.npy"))
    else:
        cent = _train_codebook(sf_dir, n_centroids, stride)

    # per-query probe list: n_probe nearest centroids; the union of all
    # queries' probed cells defines the partitions (or rows) searched.
    # Per-query cell masking is NOT re-applied at scoring time — any
    # probed row may serve any query (a candidate superset only helps
    # recall and keeps both layout branches identical).
    q_cent_sims = q_mat @ cent.T  # (n_q, k_cent)
    order = np.argsort(-q_cent_sims, axis=1, kind="stable")[:, :n_probe]
    probed_cells = sorted({int(c) for c in order.ravel()})

    if layout == "pruned":
        cand = _read_partitions(root, "cell", probed_cells)
        if cand is None:
            return _EMPTY_TOPK.copy()
        return _exact_rerank(cand, q_ids, q_mat, k)

    ctx_ref = ray.put((cent, np.array(probed_cells, dtype=np.int64)))
    ds = table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def keep_probed(batch: pa.Table) -> pa.Table:
        cc, cells = ray.get(ctx_ref)
        _, m = _emb_matrix(batch)
        assign = np.argmax(m @ cc.T, axis=1)
        pos = np.clip(np.searchsorted(cells, assign), 0, cells.size - 1)
        return batch.filter(pa.array(cells[pos] == assign))

    cand = ds.map_batches(keep_probed, batch_format="pyarrow", batch_size=4096)
    return _exact_rerank(cand, q_ids, q_mat, k)


# ---------------------------------------------------------------- near-dup

def embedding_near_dups(sf_dir: str, tau: float = NEAR_DUP_COS, stride: int = 20) -> pd.DataFrame:
    """Embedding-cosine near-dup pairs: left side = every ``stride``-th
    vector (broadcast), right side streams; emits (a_id, b_id) with
    cos ≥ tau and b_id > a_id. At full scale the left side becomes an
    LSH-bucketed loop over broadcast slabs."""
    l_tbl = _collect_where(
        sf_dir,
        lambda col: pa.array(col.to_numpy(zero_copy_only=False) % stride == 0),
    )
    l_ids, l_mat = _emb_matrix(l_tbl)
    l_ref = ray.put((l_ids, l_mat))

    ds = table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def pairs(batch: pa.Table) -> pa.Table:
        li, lm = ray.get(l_ref)
        ids, m = _emb_matrix(batch)
        sims = lm @ m.T
        ai, bi = np.nonzero((sims >= tau) & (ids[None, :] > li[:, None]))
        return pa.table({
            "a_id": pa.array(li[ai], pa.int64()),
            "b_id": pa.array(ids[bi], pa.int64()),
        })

    out = ds.map_batches(pairs, batch_format="pyarrow", batch_size=4096).to_pandas()
    if out.empty:
        return pd.DataFrame({"a_id": np.empty(0, np.int64), "b_id": np.empty(0, np.int64)})
    return out.sort_values(["a_id", "b_id"], kind="stable").reset_index(drop=True)


# ---------------------------------------------------------------- clustering

def embedding_clusters(sf_dir: str, n_clusters: int = IVF_CENTROIDS) -> pd.DataFrame:
    """Deterministic spherical k-means clustering over the embedding
    column (the IVF coarse quantizer exposed as a first-class
    operator): codebook trained once on the strided sample, broadcast,
    then every batch does one GEMM to assign its rows. Output:
    (vec_id, cluster, cos_to_centroid). Cluster quality vs planted
    labels is pinned in tests/test_similarity.py."""
    n_rows = _embeddings_rows(sf_dir)  # ONE footer pass: empty check + stride
    if n_rows == 0:
        return pd.DataFrame({
            "vec_id": np.empty(0, np.int64),
            "cluster": np.empty(0, np.int64),
            "cos_to_centroid": np.empty(0, np.float64),
        })
    stride = _ivf_train_stride(n_rows)
    train_tbl = _collect_where(
        sf_dir,
        lambda col: pa.array(col.to_numpy(zero_copy_only=False) % stride == 0),
    )
    _, train_m = _emb_matrix(train_tbl)
    cent_ref = ray.put(_kmeans_cosine(train_m, n_clusters))

    ds = table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def assign(batch: pa.Table) -> pa.Table:
        cc = ray.get(cent_ref)
        ids, m = _emb_matrix(batch)
        sims = m @ cc.T
        cl = np.argmax(sims, axis=1)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(cl.astype(np.int64), pa.int64()),
            "cos_to_centroid": pa.array(sims[np.arange(len(ids)), cl], pa.float64()),
        })

    out = ds.map_batches(assign, batch_format="pyarrow", batch_size=4096).to_pandas()
    return out.sort_values("vec_id", kind="stable").reset_index(drop=True)


# ----------------------------------------------- DuckDB oracle twins
#
# The ANN operators were rows-only until round 3 because their guts
# (seeded hyperplanes, trained k-means codebook) looked
# SQL-inexpressible. They are not: the plane matrix is a pure
# function of (seed, dim) and small enough to EMBED as literals, and
# the deterministic RNG-free Lloyd iterations UNROLL into chained
# MATERIALIZED CTEs (materialized, or DuckDB inlines each round's
# centroid CTE twice and the plan grows 2^iters). Generated here so
# every constant (bits, seed, k, probe counts, train stride) stays in
# exactly one module; bit-equality with the Ray path at sf0.001/0.01/
# 0.1 is pinned in tests/test_round3.py.

_NORM = (
    "list_transform(CAST({c} AS DOUBLE[]), x -> x / "
    "sqrt(list_dot_product(CAST({c} AS DOUBLE[]), CAST({c} AS DOUBLE[]))))"
)


def _rerank_sql(cand_rel: str, k: int, n_queries: int) -> str:
    """Exact-rerank tail shared with the ann_topk oracle: row_number
    over (cos DESC, vec_id) — identical tie-break to _exact_rerank."""
    return f"""
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS rank
  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {n_queries}) q, {cand_rel} c
  WHERE c.vec_id <> q.vec_id)
WHERE rank <= {k}"""


def ann_lsh_oracle_sql(
    k: int = TOP_K, n_queries: int = N_QUERIES, n_probe_bits: int = 2, d: int = 64
) -> str:
    """DuckDB twin of ``ann_lsh``: the seeded hyperplanes are embedded
    as DOUBLE[] literals (repr round-trips float64 exactly); bucket =
    sign-bit sum, probe set = queries' buckets closed under 1- and
    2-bit XOR flips, then the shared exact rerank. The sign of
    list_dot_product(raw, plane) equals numpy's sign(normalized @
    plane) because positive scaling cannot flip a sign."""
    planes = _hyperplanes(d)
    rows = ",\n".join(
        f"({i}, [{', '.join(repr(float(x)) for x in planes[i])}]::DOUBLE[])"
        for i in range(LSH_BITS)
    )
    probe2 = ""
    if n_probe_bits >= 2:
        probe2 = (
            "\n  UNION SELECT xor(xor(qb.bucket, CAST(1<<i.i AS BIGINT)),"
            " CAST(1<<j.i AS BIGINT)) FROM qb, bits i, bits j WHERE j.i > i.i"
        )
    return f"""
WITH planes(i, p) AS (VALUES {rows}),
b AS (
  SELECT e.vec_id,
         CAST(SUM(CASE WHEN list_dot_product(e.embedding, p.p) > 0 THEN 1<<p.i ELSE 0 END) AS BIGINT) AS bucket
  FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id
),
qb AS (SELECT bucket FROM b WHERE vec_id < {n_queries}),
bits(i) AS (VALUES {", ".join(f"({i})" for i in range(LSH_BITS))}),
probe AS (
  SELECT DISTINCT bucket AS pb FROM qb
  UNION SELECT xor(qb.bucket, CAST(1<<i.i AS BIGINT)) FROM qb, bits i{probe2}
),
cand AS (SELECT e.vec_id, e.embedding FROM embeddings e
         JOIN b USING (vec_id) WHERE b.bucket IN (SELECT pb FROM probe))
{_rerank_sql("cand", k, n_queries)}"""


def _kmeans_cells_cte(
    n_centroids: int = IVF_CENTROIDS, iters: int = 10, d: int = 64
) -> str:
    """CTE chain reproducing ``_kmeans_cosine`` over the strided
    training sample bit-for-bit, ending in ``cells`` (every vec_id's
    argmax cell, ties -> lowest cid, matching np.argmax) and ``alln``
    (normalized vectors). Seed rows replicate np.linspace's float
    recipe: fl(i * fl((n-1)/(k-1))) truncated, endpoint pinned."""
    nemb = _NORM.format(c="embedding")
    km1 = n_centroids - 1
    parts = [f"""
t AS MATERIALIZED (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS rn, {nemb} AS nemb
  FROM embeddings WHERE vec_id % {_IVF_TRAIN_STRIDE} = 0),
nn AS (SELECT COUNT(*) AS n FROM t),
seeds AS (
  SELECT CAST(i.range AS BIGINT) AS cid,
         CASE WHEN i.range = {km1} THEN nn.n - 1
              ELSE CAST(trunc(CAST(i.range AS DOUBLE) * (CAST(nn.n - 1 AS DOUBLE) / {km1}.0)) AS BIGINT) END AS rn
  FROM range({n_centroids}) i, nn),
c0 AS (SELECT s.cid, t.nemb AS cent FROM seeds s JOIN t ON t.rn = s.rn)"""]
    for it in range(1, iters + 1):
        p = it - 1
        parts.append(f""",
a{it} AS (SELECT vec_id, cid FROM (
    SELECT t.vec_id, c.cid,
           row_number() OVER (PARTITION BY t.vec_id ORDER BY list_dot_product(t.nemb, c.cent) DESC, c.cid) AS rk
    FROM t, c{p} c) WHERE rk = 1),
x{it} AS (SELECT a.cid, unnest(range({d})) AS idx, unnest(t.nemb) AS v
          FROM a{it} a JOIN t USING (vec_id)),
s{it} AS (SELECT cid, idx, SUM(v) AS sv FROM x{it} GROUP BY cid, idx),
l{it} AS (SELECT cid, list(sv ORDER BY idx) AS l FROM s{it} GROUP BY cid),
c{it} AS MATERIALIZED (SELECT p.cid,
                 CASE WHEN l.l IS NULL THEN p.cent
                      ELSE list_transform(l.l, x -> x / sqrt(list_dot_product(l.l, l.l))) END AS cent
          FROM c{p} p LEFT JOIN l{it} l USING (cid))""")
    parts.append(f""",
alln AS MATERIALIZED (SELECT vec_id, {nemb} AS nemb FROM embeddings),
cells AS (SELECT vec_id, cid FROM (
    SELECT dd.vec_id, c.cid,
           row_number() OVER (PARTITION BY dd.vec_id ORDER BY list_dot_product(dd.nemb, c.cent) DESC, c.cid) AS rk
    FROM alln dd, c{iters} c) WHERE rk = 1)""")
    return "".join(parts)


def ann_ivf_oracle_sql(
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    n_centroids: int = IVF_CENTROIDS,
    n_probe: int = IVF_PROBE,
) -> str:
    """DuckDB twin of ``ann_ivf``: the RNG-free spherical k-means is
    unrolled (one assign + one recenter CTE per Lloyd round), probe =
    each query's top-``n_probe`` cells (ties -> lowest cid, matching
    the stable argsort), candidates = union of probed cells, then the
    shared exact rerank."""
    return f"""
WITH {_kmeans_cells_cte(n_centroids)},
probed AS (SELECT DISTINCT cid FROM (
    SELECT q.vec_id, c.cid,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY list_dot_product(q.nemb, c.cent) DESC, c.cid) AS rk
    FROM (SELECT * FROM alln WHERE vec_id < {n_queries}) q, c10 c) WHERE rk <= {n_probe}),
cand AS (SELECT e.vec_id, e.embedding FROM embeddings e
         JOIN cells USING (vec_id) WHERE cells.cid IN (SELECT cid FROM probed))
{_rerank_sql("cand", k, n_queries)}"""


def embedding_clusters_oracle_sql(n_clusters: int = IVF_CENTROIDS) -> str:
    """DuckDB twin of ``embedding_clusters``'s (vec_id, cluster)
    projection — same unrolled k-means, final assignment over all
    vectors. cos_to_centroid is excluded from the checked projection:
    numpy GEMM and list_dot_product round differently in the last ulp,
    so only the integer assignment is hash-stable across engines."""
    return f"""
WITH {_kmeans_cells_cte(n_clusters)}
SELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM cells"""


LSH_PAIR_BUCKET_CAP = 256


def _cap_bucket_ids(all_ids: "np.ndarray", bucket_cap: int) -> "np.ndarray":
    """Hot-bucket cap (COVT analogue): keep the ``bucket_cap``
    lowest-id members and WARN — production skew dropping candidates
    must surface in worker logs, because the oracle twin has no cap
    and a truncated hot bucket is exactly where engine and SQL could
    diverge (pinned by the planted-hot-bucket test)."""
    if all_ids.size > bucket_cap:
        import logging

        logging.getLogger(__name__).warning(
            "embedding_near_dups_lsh: bucket truncated %d -> %d ids "
            "(lowest-id members kept); raise bucket_cap or salt the key",
            all_ids.size, bucket_cap,
        )
        return all_ids[:bucket_cap]
    return all_ids


def embedding_near_dups_lsh(
    sf_dir: str, tau: float = NEAR_DUP_COS, bucket_cap: int = LSH_PAIR_BUCKET_CAP
) -> pd.DataFrame:
    """LSH-bucketed embedding near-dup pairs — the SCALE path beside
    the exact broadcast-slab ``embedding_near_dups`` (which streams
    the full corpus against a slab and cannot prune at 10^12 rows).

    Construction: every vector is emitted under its 8-bit hyperplane
    bucket AND all 8 one-bit flips (9 narrow (key, vec_id) rows — the
    embeddings themselves never shuffle). Two vectors share an emitted
    key IFF their buckets differ by <= 2 bits (a->x<-b with one flip
    each), so the candidate set is exactly the Hamming<=2 bucket
    neighborhood; candidates then pay one exact-cosine verify over a
    pruned ``is_in`` re-read (the minhash fetch pattern). Hot buckets
    are capped at ``bucket_cap`` ids (COVT analogue, esterr.c:85-100
    discipline; never reached at test SFs, and a WARNING is emitted
    when a bucket truncates — the oracle twin has no cap, so the
    divergence surfaces in logs + the planted-hot-bucket test rather
    than silently). Expected recall vs the exact operator at cos>=0.95 is ~0.96
    (p = 1 - acos(.95)/pi per plane; sum of <=2-flip collision terms);
    the observed floor is pinned in tests. The DuckDB twin states the
    same predicate directly: bit_count(xor(b_a, b_b)) <= 2 AND cos >=
    tau."""
    import pyarrow.compute as pc

    ds = table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    planes_ref = ray.put(_hyperplanes(_embedding_dim(sf_dir)))

    def emit_keys(batch: pa.Table) -> pa.Table:
        ids, m = _emb_matrix(batch)
        bk = _bucket_of(m, ray.get(planes_ref))
        keys = [bk]
        for i in range(LSH_BITS):
            keys.append(bk ^ (1 << i))
        k = np.stack(keys, axis=1).reshape(-1)  # (n, 9) -> flat
        return pa.table({
            "key": pa.array(k, pa.int64()),
            "vec_id": pa.array(np.repeat(ids, LSH_BITS + 1), pa.int64()),
        })

    def pairs_of_bucket(g: pa.Table) -> pa.Table:
        ids = _cap_bucket_ids(
            np.unique(g.column("vec_id").to_numpy(zero_copy_only=False)), bucket_cap
        )
        if ids.size < 2:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        ai, bi = np.triu_indices(ids.size, k=1)
        return pa.table({
            "a": pa.array(ids[ai], pa.int64()),
            "b": pa.array(ids[bi], pa.int64()),
        })

    cand = (
        ds.map_batches(emit_keys, batch_format="pyarrow", batch_size=4096)
        .groupby("key")
        .map_groups(pairs_of_bucket, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    if cand.empty:
        return pd.DataFrame({"a_id": np.empty(0, np.int64), "b_id": np.empty(0, np.int64)})

    # exact-cosine verify over a pruned re-read of candidate ids only
    need = pa.array(np.unique(np.concatenate([cand["a"].to_numpy(), cand["b"].to_numpy()])), pa.int64())
    tbl = concat_blocks(ray.get(
        ds.map_batches(
            lambda t: t.filter(pc.is_in(t.column("vec_id"), value_set=need)),
            batch_format="pyarrow",
        ).to_arrow_refs()
    ))
    ids, m = _emb_matrix(tbl)
    a = cand["a"].to_numpy(dtype=np.int64)
    b = cand["b"].to_numpy(dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ia = order[np.searchsorted(ids, a, sorter=order)]
    ib = order[np.searchsorted(ids, b, sorter=order)]
    # loud invariant guard: a candidate id absent from the pruned
    # re-read would make searchsorted return a WRONG neighbor index
    # silently (the old dict lookup raised KeyError); candidates are
    # drawn from the same table, so inequality here is a real bug
    if not (np.array_equal(ids[ia], a) and np.array_equal(ids[ib], b)):
        raise AssertionError("candidate id missing from pruned embedding re-read")
    # chunked gather+dot: one 300k-pair gather materializes ~2×150 MB
    # of FRESH pages whose first-touch faults dominate (~50 MB/s on
    # this VM — see BASELINE.md controls); 64k-pair chunks reuse the
    # allocator's pages and run ~4× faster at identical results
    keep = np.empty(a.size, dtype=bool)
    step = 65536
    for i in range(0, a.size, step):
        s = slice(i, min(i + step, a.size))
        keep[s] = np.einsum("ij,ij->i", m[ia[s]], m[ib[s]]) >= tau
    out = pd.DataFrame({"a_id": a[keep], "b_id": b[keep]})
    return out.sort_values(["a_id", "b_id"], kind="stable").reset_index(drop=True)


def embedding_near_dups_lsh_oracle_sql(
    tau: float = NEAR_DUP_COS, d: int = 64
) -> str:
    """DuckDB twin of ``embedding_near_dups_lsh``: the shared-emitted-
    key candidate set equals {pairs with bucket Hamming distance <= 2},
    which SQL states directly — buckets from the same embedded plane
    literals, then bit_count(xor) <= 2 AND exact cosine >= tau."""
    planes = _hyperplanes(d)
    rows = ",\n".join(
        f"({i}, [{', '.join(repr(float(x)) for x in planes[i])}]::DOUBLE[])"
        for i in range(LSH_BITS)
    )
    return f"""
WITH planes(i, p) AS (VALUES {rows}),
b AS MATERIALIZED (
  SELECT e.vec_id,
         CAST(SUM(CASE WHEN list_dot_product(e.embedding, p.p) > 0 THEN 1<<p.i ELSE 0 END) AS BIGINT) AS bucket
  FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id
)
SELECT x.vec_id AS a_id, y.vec_id AS b_id
FROM embeddings x
JOIN b bx ON bx.vec_id = x.vec_id
JOIN b by2 ON TRUE
JOIN embeddings y ON y.vec_id = by2.vec_id
WHERE x.vec_id < y.vec_id
  AND bit_count(xor(bx.bucket, by2.bucket)) <= 2
  AND list_cosine_similarity(x.embedding, y.embedding) >= {tau}"""
