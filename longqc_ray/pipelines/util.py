"""Shared helpers for the query layer over the driver's parquet tables.

Patterns encoded here (and reused by every query):
- column-pruned reads (`table()` always passes ``columns=``)
- per-batch partial aggregation before any groupby shuffle
  (pre-aggregate inside ``map_batches`` → tiny final ``groupby``)
- broadcast small-side lookups (``ray.put`` once, read per actor/task)
- integer-domain money math (per-row round to cents, exact int64
  sums) so Ray and the DuckDB oracle agree bit-for-bit — float sums
  over different reduction orders do NOT.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data as rd


# Read-parallelism policy. Ray Data's default (~2 blocks/CPU
# regardless of data size) turns a 1 MiB table into 64 one-row-group
# blocks; every downstream groupby then runs a 64-map × 64-reduce
# shuffle of ~20 KB objects whose SCHEDULING dominates wall time —
# measured on this box: the same 100k-row groupby is 3.99 s at the
# default vs 0.64 s at 32 blocks, with a nonlinear cliff between 48
# and 64 concurrent shuffle blocks at 32 CPUs. Policy: block count
# follows DATA SIZE with a CPU-count ceiling on the small end —
# max(1, min(CPUs, bytes/64KiB), bytes/32MiB). At 100 TB the
# bytes/32MiB term dominates (≈32 MiB blocks, the map-side shape the
# flagship reader already uses); tiny dimension tables collapse to one
# block instead of 64 empty-ish ones.
_MIN_BLOCK_BYTES = 64 << 10
_TARGET_BLOCK_BYTES = 32 << 20


def read_parallelism(total_bytes: int) -> int:
    cpus = 32
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 32))
    except Exception:
        pass
    return max(
        1,
        min(cpus, total_bytes // _MIN_BLOCK_BYTES),
        total_bytes // _TARGET_BLOCK_BYTES,
    )


def pool_size(want: int, reserve: int = 2) -> int:
    """Actor-pool sizing that can never starve the upstream read: at
    most ``want`` actors, but always leaving ``reserve`` CPUs for the
    task-based stages feeding the pool. A fixed pool equal to the CPU
    count deadlocks a small session (the pool holds every CPU, the
    read task that would produce its input never schedules — the same
    pathology as the 4-CPU warmup deadlock, BASELINE.md)."""
    cpus = 32
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 32))
    except Exception:
        pass
    return max(1, min(want, cpus - reserve))


def scale_cap(name: str, default: int) -> int:
    """Crossover-cap resolution for the repo-wide broadcast/driver vs
    shuffle/distributed discipline. Reads, in priority order:
    ``LONGQC_CAP_<NAME>`` (pin one cap), ``LONGQC_FORCE_SCALE_PATHS``
    (truthy → EVERY cap becomes 0, so the scale branches run even at
    bench scale), else ``default``. The force switch exists because
    the big-side branches never trigger at sf0.1 — the committed
    scale-path sweep (CHECK_SWEEP_r05_scale.json) re-checks the
    affected queries against DuckDB with every crossover forced.
    Caps are only ever read DRIVER-side (the crossover decisions are
    driver decisions), so the env var needs no worker propagation."""
    v = os.environ.get(f"LONGQC_CAP_{name}")
    if v is not None:
        return int(v)
    if os.environ.get("LONGQC_FORCE_SCALE_PATHS", "0") not in ("", "0"):
        return 0
    return default


def scratch_root(kind: str, default: str) -> str:
    """Resolve the root directory for a build-once shared artifact
    family (ANN hive layouts, derived-clips cache). Priority:
    ``LONGQC_<KIND>_ROOT`` (pin one family), ``LONGQC_SCRATCH_ROOT``
    (one shared root, family subdirs), else the node-local default.

    MULTI-NODE CONTRACT: these artifacts are written by whichever node
    builds them and then READ BY EVERY WORKER (pruned partition reads,
    clip-cache reads), so on a real cluster the root MUST point at
    storage all nodes see (NFS/Lustre/fuse-mounted object store); the
    ``/tmp`` defaults are only correct single-node. Publishing uses
    build-into-tmp + marker-last + rename: atomic on POSIX shared
    filesystems; an object store without atomic rename needs its own
    publish step (write marker object last, treat marker as the commit
    point — the marker check below already encodes that discipline)."""
    v = os.environ.get(f"LONGQC_{kind}_ROOT")
    if v:
        return v
    shared = os.environ.get("LONGQC_SCRATCH_ROOT")
    if shared:
        return os.path.join(shared, kind.lower())
    return default


def publish_cached_dir(final: str, build, marker_name: str = "_DONE",
                       marker_text: str = "ok\n") -> str:
    """The ONE build-once/publish protocol for every shared cached
    artifact (ANN hive layouts, derived-clips cache, image/video
    payload caches): ``build(tmp_dir)`` writes the artifact into a
    temp sibling of ``final``; the marker is written LAST (inside the
    temp dir, before the rename), so completeness IS the marker — a
    directory without it is a crashed publish, never trusted, and gets
    rebuilt. The rename is atomic on POSIX shared filesystems (see
    ``scratch_root`` for the multi-node contract and the object-store
    caveat).

    Rename-failure semantics: a failed ``os.rename`` is only "lost the
    race to another builder" if the winner's marker is now visible —
    then our temp build is redundant and is removed. Any OTHER rename
    failure (permissions, EXDEV after a mid-run root change) re-raises
    with the temp dir LEFT IN PLACE, so a genuine storage fault fails
    loudly at the publish site instead of as a FileNotFoundError in
    some later reader, and the built data survives for diagnosis."""
    import shutil
    import uuid

    marker = os.path.join(final, marker_name)
    if os.path.exists(marker):
        return final
    os.makedirs(os.path.dirname(final), exist_ok=True)
    # unique per builder ATTEMPT: pid alone collides across nodes on
    # the shared roots this protocol exists for (two drivers with the
    # same pid would interleave writes in one tmp dir), and a stale
    # same-name tmp from a failed earlier attempt must never receive a
    # second build's files alongside the first's
    tmp = f"{final}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    build(tmp)
    with open(os.path.join(tmp, marker_name), "w") as f:
        f.write(marker_text)
    if os.path.isdir(final) and not os.path.exists(marker):
        shutil.rmtree(final, ignore_errors=True)  # crashed publish corpse
    try:
        os.rename(tmp, final)
    except OSError:
        if os.path.exists(marker):  # another builder won the race
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            raise
    return final


def ensure_nonempty_parquet(tmp_dir: str, schema) -> None:
    """``write_parquet`` of zero rows creates NO files (possibly no
    directory); publish one typed-empty file so cache readers see the
    schema instead of a missing/blank directory."""
    import pyarrow.parquet as pq

    os.makedirs(tmp_dir, exist_ok=True)
    if not any(f.endswith(".parquet") for f in os.listdir(tmp_dir)):
        pq.write_table(schema.empty_table(),
                       os.path.join(tmp_dir, "part-empty.parquet"))


def two_level_pack(narrow: rd.Dataset, cap: int, id_name: str, w_name: str) -> rd.Dataset:
    """Distributed ordered prefix sum → sequential packing, shared by
    token packing (``pack_docs``) and duration packing
    (``pack_clips_by_duration``). ``narrow`` carries int64 columns
    ``id_name`` (the unique monotone order key), ``w_name`` (the item
    weight) and ``rng`` (the ordered partition key, ``id //
    range_size``). Two passes, the classic two-level scan:

    1. per-RANGE weight sums merge driver-side into per-range prefix
       OFFSETS (O(n_ranges) on the driver, never O(items));
    2. each range, grouped and sorted internally, adds its offset to
       its local cumulative sum; ``pack_id = prefix_before // cap``.

    Partitioning assumption (SURVEY §2.4 note): the order key is a
    unique monotone int64; an arbitrary sort key needs a ``ds.sort``
    first. Output: one row per item — (id, w, pack_id), a Dataset (no
    driver collect)."""
    import ray

    from ray.data.aggregate import Sum

    narrow = narrow.materialize()
    sums = ensure_columns(
        narrow.groupby("rng").aggregate(Sum(w_name, alias_name="s")).to_pandas(),
        {"rng": np.int64, "s": np.int64},
    )
    sums = sums.sort_values("rng").reset_index(drop=True)
    rng_ids = sums["rng"].to_numpy().astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(sums["s"].to_numpy())[:-1]]).astype(np.int64)
    off_ref = ray.put((rng_ids, offsets))

    def per_range(g: pa.Table) -> pa.Table:
        r_ids, offs = ray.get(off_ref)
        ids = g.column(id_name).to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        w = g.column(w_name).to_numpy(zero_copy_only=False)[order]
        base = int(offs[np.searchsorted(r_ids, int(g.column("rng")[0].as_py()))])
        before = base + np.cumsum(w) - w
        return pa.table({
            id_name: pa.array(ids, pa.int64()),
            w_name: pa.array(w, pa.int64()),
            "pack_id": pa.array((before // cap).astype(np.int64), pa.int64()),
        })

    return narrow.groupby("rng").map_groups(per_range, batch_format="pyarrow")


def _path_bytes(path: str) -> int:
    if os.path.isdir(path):
        import glob

        return sum(
            os.path.getsize(f)
            for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
    return os.path.getsize(path)


def table_files(sf_dir: str, name: str) -> list[str]:
    """Sorted parquet part files of one driver table — the ONE place
    that knows a table is either a single ``<name>.parquet`` file or a
    directory of part files (recursive: hive-partitioned layouts
    nest). Every footer/stat/fingerprint pass goes through this so the
    two shapes can't drift between callers (a flat ``*.parquet`` glob
    here vs a recursive one there silently mis-counts nested
    layouts)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        import glob

        return sorted(
            glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
    return [path]


def table_row_count(sf_dir: str, name: str) -> int:
    """Exact row count of a table from parquet FOOTERS only — always
    available (unlike column min/max statistics, which a writer may
    omit), so size-scaled driver decisions (training strides, empty
    short-circuits, crossover caps) never silently lose their bound
    the way a ``parquet_column_stats``-based count does on a
    stats-less file."""
    import pyarrow.parquet as pq

    return sum(pq.read_metadata(f).num_rows for f in table_files(sf_dir, name))


def table(sf_dir: str, name: str, columns: list[str] | None = None) -> rd.Dataset:
    """Column-pruned parquet read of one driver table.

    Zero-row guard: ``read_parquet`` of an empty file yields ZERO
    blocks, so downstream ``map_batches`` UDFs never run and the
    schema is lost (``ds.schema()`` → None, empty frames with no
    columns — every column access downstream KeyErrors). Empty
    PARTITIONS are routine at scale, so when the footer says 0 rows
    this returns a one-block, zero-row dataset carrying the correct
    (pruned) arrow schema instead. NOTE the limit of this guard
    (verified on the pinned Ray): ``map_batches`` SKIPS 0-row blocks —
    UDFs never see the empty batch — so the schema survives only until
    the first UDF boundary; driver collects after a map must reattach
    their columns via ``ensure_columns`` (or a typed-empty guard)."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    files = table_files(sf_dir, name)
    first_file = files[0] if files else path
    # cheap short-circuit: any non-empty file already yields blocks
    # that carry the schema; only an ALL-empty table loses it.
    all_empty = bool(files) and all(
        pq.read_metadata(f).num_rows == 0 for f in files
    )
    if all_empty:
        schema = pq.read_schema(first_file)
        if columns:
            schema = pa.schema([schema.field(c) for c in columns])
        return rd.from_arrow(schema.empty_table())
    return rd.read_parquet(
        path, columns=columns,
        override_num_blocks=read_parallelism(_path_bytes(path)),
    )


def parquet_column_stats(
    sf_dir: str, name: str, col: str
) -> tuple[float, float, int] | None:
    """(min, max, row_count) of a flat numeric column straight from the
    parquet FOOTER statistics — the scan-level shortcut every engine
    uses for range pruning, here saving order-statistics queries one
    whole min/max/count execution. Metadata-only: one footer read per
    file, no row data touched (at cluster scale, footer reads fan out
    as tasks; this driver-side loop is for the single-directory small
    case). Returns None when any row group lacks exact stats — callers
    must fall back to the aggregate pass. Only trustworthy for numeric
    columns (string footer min/max may be truncated)."""
    import pyarrow.parquet as pq

    files = table_files(sf_dir, name)
    lo: float | None = None
    hi: float | None = None
    n = 0
    for f in files:
        md = pq.read_metadata(f)
        idx = next((i for i in range(len(md.schema)) if md.schema.column(i).name == col), None)
        if idx is None:
            return None
        n += md.num_rows
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return None
            lo = float(st.min) if lo is None else min(lo, float(st.min))
            hi = float(st.max) if hi is None else max(hi, float(st.max))
    if n == 0 or lo is None:
        return None
    return lo, hi, n


def parquet_ts_bounds(sf_dir: str, name: str, col: str) -> tuple[int, int] | None:
    """(min, max) of a timestamp column in epoch-microseconds straight
    from the parquet footer statistics (the timestamp twin of
    ``parquet_column_stats`` — saves queries needing only global time
    bounds one whole Min/Max aggregate execution). None when any row
    group lacks exact stats; callers fall back to the aggregate."""
    import pyarrow.parquet as pq

    files = table_files(sf_dir, name)
    lo = hi = None
    for f in files:
        md = pq.read_metadata(f)
        idx = next((i for i in range(len(md.schema)) if md.schema.column(i).name == col), None)
        if idx is None:
            return None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return None
            # tz-AWARE timestamp stats either raise or (numpy 1.26)
            # silently tz-convert in np.datetime64 — the documented
            # contract is None → caller falls back to the Min/Max
            # aggregate, so detect tzinfo up front and guard the parse
            if getattr(st.min, "tzinfo", None) is not None:
                return None
            try:
                a = np.datetime64(st.min, "us").astype(np.int64)
                b = np.datetime64(st.max, "us").astype(np.int64)
            except ValueError:
                return None
            lo = int(a) if lo is None else min(lo, int(a))
            hi = int(b) if hi is None else max(hi, int(b))
    if lo is None:
        return None
    return lo, hi


WIDE_BLOCK_BYTES = 64 * 2**20  # ~64 MiB blocks for wide binary rows


def read_wide_parquet(files: list[str], columns: list[str] | None = None) -> rd.Dataset:
    """Parquet read tuned for WIDE rows (multi-KB binary payloads).

    Ray's default read planning can hand out one block per file (here
    ~128 MiB+); for payload-heavy tables that serializes long
    single-block copies and starves the downstream stages (measured
    9× on the 60k-clip bench when it first landed). The other extreme
    hurts too: at 16 MiB blocks the driver's per-block scheduling +
    submission cost (~tens of ms each on this host) caps the pipeline
    near 8k rows/s regardless of worker count — measured 7.7k vs
    14.0k clips/s moving 16→64 MiB on the 480k-row scaling workload.
    64 MiB amortizes the per-block cost while still giving
    total/64 MiB ≈ blocks ≫ cores; the rule derives from dataset
    size, not node count, so it holds on a cluster."""
    total = sum(os.path.getsize(f) for f in files)
    n_blocks = max(len(files), int(np.ceil(total / WIDE_BLOCK_BYTES)))
    return rd.read_parquet(files, columns=columns, override_num_blocks=n_blocks)


def scaled_parts(
    n_rows: int | None,
    rows_per_part: int = 250_000,
    lo: int = 8,
    hi: int = 65_536,
) -> int:
    """Partition count for the ``__part`` hash-partition discipline,
    scaled by DATA SIZE rather than fixed: ~250k rows per partition
    keeps each per-partition pandas group small, while a fixed count
    fails in BOTH directions — 64 partitions over a 10^12-row table is
    a 15-billion-row pandas group, and 64 partitions over a 100k-row
    bench table is ~128 near-empty shuffle tasks whose ~20 ms/task
    driver cost dominates the query (measured 3.9 s → 0.8 s on the
    as-of join at sf0.1). ``n_rows`` normally comes free from parquet
    footer metadata; None (unknown) falls back to 64."""
    if n_rows is None:
        return 64
    return int(min(hi, max(lo, n_rows // rows_per_part)))


def cents(x: np.ndarray) -> np.ndarray:
    """Per-row money → exact int64 cents; both engines round the same
    double, so downstream integer sums match exactly in any order.

    Half-away-from-zero (DuckDB ``round`` semantics), NOT numpy's
    banker's rounding — x.5 cents occur for real (price×(1−disc))."""
    v = np.asarray(x, dtype=np.float64) * 100.0
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)


def _part_hash(t: pa.Table, key: str, n_parts: int) -> np.ndarray:
    """Type-agnostic bounded partition id per row: multiplicative hash
    for integer keys (vectorized), FNV-1a over the string/UTF-8 form
    otherwise via the padded-byte-matrix kernel
    (kernels/text.fnv1a_64_strs — the same vectorized path dedup_exact
    uses; replaced a per-row ``zlib.crc32`` loop, measured 6× on 1M
    string keys). Raises a clear error for a missing column instead of
    an opaque numpy one."""
    if key not in t.column_names:
        raise KeyError(f"partition key column {key!r} not in {t.column_names}")
    from ..kernels.text import fnv1a_64_arrow, fnv1a_64_strs

    col = t.column(key)
    if pa.types.is_integer(col.type):
        # null-safe: to_numpy on a nullable int column detours through
        # float64+NaN, silently corrupting keys >= 2^53 and casting
        # NaN undefined. Fill nulls with 0 first (null keys co-partition
        # with 0; join correctness is unaffected — null keys never
        # match inside the per-partition Acero join anyway) so the
        # conversion stays in the integer domain.
        if col.null_count:
            import pyarrow.compute as pc_

            col = pc_.fill_null(col, 0)
        k = col.to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            h = (k.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(n_parts)
        return h.astype(np.int64)
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        h = fnv1a_64_arrow(col)
    else:
        h = fnv1a_64_strs([str(v) for v in col.to_pylist()])
    return (h % np.uint64(n_parts)).astype(np.int64)


def ensure_columns(df, spec: dict[str, object]):
    """Reattach expected columns to a ZERO-ROW driver collect. Ray
    cannot carry a schema through a 0-row ``to_pandas`` boundary
    (``iter_batches`` yields nothing), so any query that collects
    partials or results may receive a column-less frame when its
    input — or a filter — leaves zero rows. ``spec`` maps column name
    → numpy/pandas dtype. Frames that kept their columns pass through
    untouched."""
    if df.shape[1]:
        return df
    import pandas as pd

    return pd.DataFrame({c: pd.Series(dtype=t) for c, t in spec.items()})


def concat_blocks(blocks: list[pa.Table]) -> pa.Table:
    """``pa.concat_tables`` robust to Ray's zero-COLUMN empty blocks
    (the ``table()`` zero-row contract: a block whose rows all filter
    out is serialized column-less, and one such block next to real
    blocks makes ``concat_tables`` raise a schema mismatch). Drops
    column-less blocks; raises a CLEAR error when every block is empty
    — the callers' candidate ids come from the same table they
    re-read, so an all-empty collect is an invariant violation, not a
    valid result."""
    keep = [b for b in blocks if b.num_columns]
    if not keep:
        raise ValueError(
            "filtered collect returned no rows in any block — candidate "
            "ids absent from their source table"
        )
    return pa.concat_tables(keep)


def add_part_column(t: pa.Table, keys: list[str], n_parts: int) -> pa.Table:
    """Append ``__part`` = xor-combined per-key partition id — the one
    shared spelling for final_sum / hash_grouped_sum / hash_grouped_agg
    (a partition-scheme fix must land in exactly one place)."""
    h = _part_hash(t, keys[0], n_parts)
    for k in keys[1:]:
        h = h ^ _part_hash(t, k, n_parts)
    return t.append_column("__part", pa.array(h % n_parts, pa.int64()))


def _schema_and_ds(ds: rd.Dataset) -> tuple[pa.Schema, rd.Dataset]:
    """(schema, dataset) robust to ZERO-ROW pipelines: Ray's
    ``schema()`` infers via ``limit(1)``, so a dataset whose blocks all
    have 0 rows (a map over an empty partition — schema-carrying
    blocks DO exist) comes back None. The fallback MATERIALIZES the
    dataset (0 rows — bounded) and reads block schemas from the
    materialized refs, returning the materialized handle so the caller
    consumes it WITHOUT re-running the lineage: a zero-row result can
    still sit atop a corpus-wide scan+filter, which would otherwise
    execute once for the probe, once here, and once downstream."""
    import ray

    sch = ds.schema()
    if sch is not None:
        return sch.base_schema, ds
    ds = ds.materialize()
    for b in ray.get(ds.to_arrow_refs()):
        if b.num_columns:
            return b.schema, ds
    raise ValueError("dataset has no schema (zero blocks and no columns)")


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_key: str,
    right_key: str,
    n_parts: int = 64,
    post=None,
    l_schema: pa.Schema | None = None,
    r_schema: pa.Schema | None = None,
) -> rd.Dataset:
    """Large×large inner hash join via co-grouping (Ray Data 2.49 has
    no native join): tag each side, union, hash-partition on the key
    into a BOUNDED number of partitions, and an ARROW (Acero) join
    inside each partition. Only the join keys + projected payload
    columns shuffle; n_parts scales with the cluster (same discipline
    as dedup_first). Broadcast joins (pipelines/relational.py
    nation_revenue) remain the right tool when one side is small.

    The per-partition merge is pure Arrow end-to-end: blocks stay
    Arrow for downstream operators (a pandas merge here made every
    downstream groupby pay a block-format conversion — measured 9.7 s
    → 1.5 s on a 200k-row join+aggregate), int columns never take the
    null-padded float64 detour (values ≥ 2^53 survive exactly), and
    the right key column is re-attached after the join so the output
    schema matches the historical pandas-merge contract (both key
    columns present)."""
    import pyarrow as pa_  # local alias; pa already imported module-level

    # ``l_schema``/``r_schema``: a side whose rows were all filtered
    # away upstream is UNRECOVERABLE from Ray (empty UDF-output blocks
    # are serialized column-less), so a caller that projects before
    # joining passes the projection schema it just built; with both
    # schemas known the join keeps its output schema on empty input
    # (the _anchor_schema block below)
    if l_schema is None:
        l_schema, left = _schema_and_ds(left)
    if r_schema is None:
        r_schema, right = _schema_and_ds(right)
    l_cols = list(l_schema.names)
    r_cols = list(r_schema.names)
    # key existence first, so a typo'd key reports as a key error,
    # not as a column overlap
    if left_key not in l_cols:
        raise KeyError(f"partition key column {left_key!r} not in {l_cols}")
    if right_key not in r_cols:
        raise KeyError(f"partition key column {right_key!r} not in {r_cols}")
    # a shared name is only legal when it IS the join key on BOTH
    # sides: subtracting {left_key, right_key} would also excuse e.g.
    # a right-side payload column named like the LEFT key, which then
    # dies later inside the per-partition Acero join with an opaque
    # duplicate-field error instead of this upfront ValueError
    allowed = {left_key} if left_key == right_key else set()
    overlap = (set(l_cols) & set(r_cols)) - allowed
    if overlap:
        raise ValueError(f"overlapping non-key columns: {overlap}")
    # union needs one schema: superset with nulls for the other side
    other_fields = {
        "l": [(n, r_schema.field(n).type) for n in r_cols if n not in l_cols],
        "r": [(n, l_schema.field(n).type) for n in l_cols if n not in r_cols],
    }

    def tag(side: str, key: str):
        def fn(t: pa.Table) -> pa.Table:
            h = _part_hash(t, key, n_parts)
            cols = {c: t.column(c) for c in t.column_names}
            for name, typ in other_fields[side]:
                cols[name] = pa_.nulls(t.num_rows, typ)
            cols["__part"] = pa.array(h, pa.int64())
            cols["__side"] = pa.array([side] * t.num_rows, pa.string())
            ordered = sorted(cols)  # deterministic column order across sides
            return pa.table({c: cols[c] for c in ordered})

        return fn

    both = left.map_batches(tag("l", left_key), batch_format="pyarrow").union(
        right.map_batches(tag("r", right_key), batch_format="pyarrow")
    )

    # pandas-merge contract: distinct key names BOTH appear in the
    # output; a shared name appears once
    keep_right_key = right_key != left_key
    out_cols = l_cols + [c for c in r_cols if c != right_key]
    if keep_right_key:
        out_cols = out_cols + [right_key]

    def merge_part(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        side = g.column("__side")
        l = g.filter(pc_.equal(side, "l")).select(l_cols)
        r = g.filter(pc_.equal(side, "r")).select(r_cols)
        out = l.join(r, keys=left_key, right_keys=right_key, join_type="inner")
        if keep_right_key:
            out = out.append_column(right_key, out.column(left_key).cast(
                r_schema.field(right_key).type
            ))
        out = out.select(out_cols)
        # ``post`` runs INSIDE the join partition: a partition holds
        # every row of its join keys, so a group-by on the JOIN key
        # (or a partial pre-agg on any other key) here saves the
        # downstream pipeline one whole all-to-all
        return post(out) if post is not None else out

    out_ds = both.groupby("__part").map_groups(merge_part, batch_format="pyarrow")
    return _anchor_schema(out_ds, _tagged_empty(l_schema, r_schema), merge_part)


def _tagged_empty(l_schema: pa.Schema, r_schema: pa.Schema) -> pa.Table:
    """Zero-row table with the tagged-union superset schema (sorted
    columns + __part/__side), for driving a merge fn once on the
    driver to learn its OUTPUT schema."""
    fields: dict[str, pa.DataType] = {}
    for sch in (l_schema, r_schema):
        for f in sch:
            fields.setdefault(f.name, f.type)
    fields["__part"] = pa.int64()
    fields["__side"] = pa.string()
    return pa.schema([(n, fields[n]) for n in sorted(fields)]).empty_table()


def _anchor_schema(out: rd.Dataset, sup_empty: pa.Table, merge_fn) -> rd.Dataset:
    """Union a zero-row SCHEMA ANCHOR block onto a co-group output.

    Ray drops zero-row blocks, so a join whose input is empty (or
    whose every partition joins to nothing) yields a ZERO-block
    dataset — ``schema()`` → None and every downstream column access
    KeyErrors. Empty partitions are routine at 100 TB (the same
    contract ``table()`` enforces at the read), so the join family
    anchors its output with one empty block of the exact output
    schema, learned by running the per-partition merge fn once on an
    empty superset table driver-side (no dataset execution — the
    input schemas were already fetched). If the merge fn cannot run
    on an empty table (exotic ``post``), the anchor is skipped and
    behavior is unchanged."""
    try:
        anchor = merge_fn(sup_empty)
    except Exception:
        return out
    if anchor.num_rows != 0:  # a post that fabricates rows: no anchor
        return out
    return out.union(rd.from_arrow(anchor))


def local_topk(
    ds: rd.Dataset, cols: list[str], descending: list[bool], k: int
) -> pa.Table:
    """Distributed top-k under a TOTAL order: per-block local top-k
    (map-side), then one driver merge of ≤ k × n_blocks tiny rows —
    replaces ``sort().limit(k)``, whose sample+range-partition
    all-to-all costs ~1 s of fixed machinery per query regardless of
    data size. ``cols`` must be a total order (include a key column)
    or ties at the k boundary become nondeterministic."""
    import ray

    import pyarrow.compute as pc

    order = [(c, "descending" if d else "ascending") for c, d in zip(cols, descending)]

    def local(t: pa.Table) -> pa.Table:
        if t.num_rows > k:
            t = t.take(pc.sort_indices(t, sort_keys=order).slice(0, k))
        return t

    surv = ds.map_batches(local, batch_format="pyarrow").materialize()
    if surv.num_blocks() > 64:
        # tree fold: at cluster scale the survivor set is k × n_blocks
        # rows (unbounded driver merge at millions of blocks) — one
        # cheap repartition of the tiny survivors bounds the driver
        # collect at k × 16 rows regardless of input size
        surv = (
            surv.repartition(16)
            .map_batches(local, batch_format="pyarrow")
            .materialize()
        )
    blocks = ray.get(surv.to_arrow_refs())
    # Ray materializes empty partitions as ZERO-COLUMN tables, which
    # poison concat_tables (see table() zero-row contract)
    blocks = [b for b in blocks if b.num_columns]
    if not blocks:
        sch = ds.schema()
        return sch.base_schema.empty_table() if sch else pa.table({})
    parts = pa.concat_tables(blocks)
    return parts.take(pc.sort_indices(parts, sort_keys=order).slice(0, k))


def _asof_on_values(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Ordering values of an as-of ``on`` column as numpy: timestamps
    view as int64 microseconds, integer columns stay int64 via a
    fill_null(0) (the nulls are the OTHER side's rows, never read —
    without the fill, a nullable int column round-trips through
    float64 and values ≥ 2^53 would mis-order silently), floats pass
    through."""
    if pa.types.is_integer(col.type):
        import pyarrow.compute as pc_

        return pc_.fill_null(col, 0).cast(pa.int64()).to_numpy(zero_copy_only=False)
    v = col.to_numpy(zero_copy_only=False)
    if np.issubdtype(v.dtype, np.datetime64):
        return v.astype("datetime64[us]").view(np.int64)
    return v


def asof_merge_tagged(
    both: rd.Dataset,
    l_cols: list[str],
    r_cols: list[str],
    by: str,
    left_on: str,
    right_on: str,
    anchor_empty: pa.Table | None = None,
) -> rd.Dataset:
    """Partitioned backward as-of merge over a pre-tagged union.

    ``anchor_empty`` (a zero-row superset table, see ``_tagged_empty``)
    opts in to the empty-input schema anchor — callers that already
    hold both side schemas (``asof_join``) pass it so a zero-row input
    keeps its output schema instead of collapsing to a schema-less
    zero-block dataset.

    ``both`` must carry ``__part`` (bounded hash of ``by``) and
    ``__side`` ('l'/'r') columns plus the null-padded superset of both
    sides' columns. Exposed so single-source callers (both sides are
    filters of ONE table, e.g. purchase_click_asof) can build the
    tagged union in one scan instead of reading the input twice.

    The per-partition merge is a pure int64 numpy kernel (replaced
    ``pd.merge_asof``, whose unmatched-row NaNs forced int columns
    through float64 — the old 2^53 guard is gone because nothing
    leaves the integer domain): ONE lexsort by (key, time, side with
    rights-before-lefts at equal time), then a per-group running max
    over right-row positions (group resets via the gid·BIG offset
    trick) gives every left row its latest right row with
    right_on ≤ left_on. Ties among equal right times resolve to the
    LAST in input order — bit-identical to the stable-sorted
    ``merge_asof`` it replaced (oracle-checked); types survive
    untouched via Arrow ``take``. Blocks stay Arrow for downstream
    operators."""
    import pandas as pd

    out_r = [c for c in r_cols if c != by]
    out_cols = l_cols + out_r

    def merge_part(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        is_l = pc_.equal(g.column("__side"), "l").to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(
            np.asarray(g.column(by).to_pylist(), dtype=object)
        )
        codes = codes.astype(np.int64)
        t = np.where(is_l, _asof_on_values(g.column(left_on)),
                     _asof_on_values(g.column(right_on)))
        n = g.num_rows
        order = np.lexsort((is_l.astype(np.int8), t, codes))
        c2 = codes[order]
        isl2 = is_l[order]
        big = np.int64(n + 2)
        pos = np.arange(n, dtype=np.int64)
        val = c2 * big + np.where(~isl2, pos + 1, 0)
        run = np.maximum.accumulate(val)
        last_r = run - c2 * big - 1  # sorted-pos of latest right; -1 = none
        lmask = isl2 & (last_r >= 0)
        left_idx = order[np.nonzero(lmask)[0]]
        right_idx = order[last_r[lmask]]
        li = pa.array(left_idx, pa.int64())
        ri = pa.array(right_idx, pa.int64())
        data = {c: g.column(c).take(li) for c in l_cols}
        data.update({c: g.column(c).take(ri) for c in out_r})
        return pa.table({c: data[c] for c in out_cols})

    out_ds = both.groupby("__part").map_groups(merge_part, batch_format="pyarrow")
    if anchor_empty is not None:
        return _anchor_schema(out_ds, anchor_empty, merge_part)
    return out_ds


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    by: str,
    left_on: str,
    right_on: str,
    n_parts: int = 64,
) -> rd.Dataset:
    """Backward as-of inner join: each left row matches the right row
    of the same ``by`` key with the greatest ``right_on`` <= ``left_on``.

    Ray Data has no native as-of join; the reference has none either
    (SURVEY.md §2.4) but a training-data pipeline needs one (align
    each record with the latest preceding state change). Built as a
    composition: tag both sides → union → hash-partition on ``by``
    into a BOUNDED partition count → per-partition sorted
    ``pd.merge_asof``. Partitioning assumption: all rows of one ``by``
    key land in one partition (hash co-location), so the per-partition
    merge is exact; only projected columns shuffle, and ``n_parts``
    scales with the cluster exactly like ``hash_join``.
    """
    l_schema, left = _schema_and_ds(left)
    r_schema, right = _schema_and_ds(right)
    l_cols = list(l_schema.names)
    r_cols = list(r_schema.names)
    overlap = (set(l_cols) & set(r_cols)) - {by}
    if overlap:
        raise ValueError(f"overlapping non-key columns: {overlap}")
    other_fields = {
        "l": [(n, r_schema.field(n).type) for n in r_cols if n != by],
        "r": [(n, l_schema.field(n).type) for n in l_cols if n != by],
    }
    def tag(side: str):
        def fn(t: pa.Table) -> pa.Table:
            h = _part_hash(t, by, n_parts)
            cols = {c: t.column(c) for c in t.column_names}
            for name, typ in other_fields[side]:
                cols[name] = pa.nulls(t.num_rows, typ)
            cols["__part"] = pa.array(h, pa.int64())
            cols["__side"] = pa.array([side] * t.num_rows, pa.string())
            ordered = sorted(cols)
            return pa.table({c: cols[c] for c in ordered})

        return fn

    both = left.map_batches(tag("l"), batch_format="pyarrow").union(
        right.map_batches(tag("r"), batch_format="pyarrow")
    )
    return asof_merge_tagged(
        both, l_cols, r_cols, by, left_on, right_on,
        anchor_empty=_tagged_empty(l_schema, r_schema),
    )


def preagg_sum(keys: list[str], sum_cols: list[str]):
    """Per-batch combiner: group within the batch, emit partial sums +
    row counts. The downstream groupby then shuffles ~n_groups rows per
    block instead of every row (SURVEY.md §4 partial+final pattern)."""

    def fn(batch: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in sum_cols] + [([], "count_all")]
        out = batch.group_by(keys).aggregate(aggs)
        data = {k: out.column(k) for k in keys}
        for c in sum_cols:
            data[f"{c}_partial"] = out.column(f"{c}_sum")
        data["n_partial"] = out.column("count_all")
        return pa.table(data)

    return fn


def final_sum(
    ds: rd.Dataset, keys: list[str], sum_cols: list[str], n_parts: int = 16
) -> "pd.DataFrame":  # noqa: F821
    """Final aggregate over the tiny partials; returns pandas (small).

    The shuffle is a HASH co-group on a bounded ``__part`` id (xor of
    per-key hashes) with one Arrow ``group_by`` per partition — NOT
    Ray's ``groupby().aggregate()``, whose sample+sort+reduce machinery
    measures ~4× slower on the same partials (0.86 s vs 0.22 s on 200k
    rows / 32 CPUs). Hash partitioning also never needs the sort's key
    sampling pass, and ``n_parts`` scales with the cluster exactly like
    hash_join.

    Empty-input contract: Ray drops zero-row blocks, so on an empty
    upstream the result arrives with NO columns; the expected columns
    are reattached (keys as object, totals as int64) so every
    grouped_sums caller sees its schema even for 0 groups — empty
    partitions are routine at scale and must not KeyError."""
    import pandas as pd

    part_cols = [f"{c}_partial" for c in sum_cols] + ["n_partial"]
    total_cols = [f"{c}_total" for c in sum_cols] + ["n_total"]

    def add_part(t: pa.Table) -> pa.Table:
        return add_part_column(t, list(keys), n_parts)

    def agg_part(g: pa.Table) -> pa.Table:
        out = g.group_by(keys).aggregate([(c, "sum") for c in part_cols])
        # select by NAME before the positional rename: pyarrow versions
        # differ on whether group_by emits keys before or after the
        # aggregate columns, so a positional rename alone could silently
        # swap key and total columns under a pyarrow upgrade
        out = out.select(keys + [f"{c}_sum" for c in part_cols])
        return out.rename_columns(keys + total_cols)

    out = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(agg_part, batch_format="pyarrow")
        .to_pandas()
    )
    if out.empty and not list(out.columns):
        cols: dict = {k: pd.Series(dtype=object) for k in keys}
        for c in total_cols:
            cols[c] = pd.Series(dtype=np.int64)
        return pd.DataFrame(cols)
    return out


def grouped_sums(
    ds: rd.Dataset, keys: list[str], sum_cols: list[str], batch_size: int = 8192
) -> "pd.DataFrame":  # noqa: F821
    """map_batches partial groupby → final groupby (the only shuffle)."""
    parts = ds.map_batches(
        preagg_sum(keys, sum_cols), batch_format="pyarrow", batch_size=batch_size
    )
    return final_sum(parts, keys, sum_cols)


def hash_anti_semi_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_key: str,
    right_key: str,
    semi: bool = False,
    n_parts: int = 64,
) -> rd.Dataset:
    """Large×large ANTI (or SEMI) join via co-grouping — the scale
    path for J1/J2 when the right side is too big to broadcast
    (relational.control_anti_join / sample_semi_join stay the right
    tool for small key sets).

    The right side contributes nothing but key EXISTENCE, so it is
    projected to its key column and deduplicated per batch BEFORE the
    shuffle — the all-to-all moves left rows + distinct right keys
    only. Per partition: one vectorized ``is_in`` membership test,
    entirely in Arrow — the pandas route would widen the null-padded
    int columns to float64 (corrupting left ints ≥ 2^53 and breaking
    legitimately-nullable int columns on the way back)."""
    l_schema, left = _schema_and_ds(left)
    l_cols = list(l_schema.names)

    def tag_left(t: pa.Table) -> pa.Table:
        h = _part_hash(t, left_key, n_parts)
        cols = {c: t.column(c) for c in t.column_names}
        cols["__part"] = pa.array(h, pa.int64())
        cols["__side"] = pa.array(["l"] * t.num_rows, pa.string())
        return pa.table({c: cols[c] for c in sorted(cols)})

    def tag_right(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = pc.unique(t.column(right_key))
        kt = pa.table({left_key: u.cast(l_schema.field(left_key).type)})
        h = _part_hash(kt, left_key, n_parts)
        cols = {left_key: kt.column(left_key)}
        for c in l_cols:
            if c != left_key:
                cols[c] = pa.nulls(len(u), l_schema.field(c).type)
        cols["__part"] = pa.array(h, pa.int64())
        cols["__side"] = pa.array(["r"] * len(u), pa.string())
        return pa.table({c: cols[c] for c in sorted(cols)})

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def per_part(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = g.column("__side")
        r_keys = pc.unique(g.filter(pc.equal(side, "r")).column(left_key))
        l_rows = g.filter(pc.equal(side, "l"))
        member = pc.is_in(l_rows.column(left_key), value_set=r_keys)
        out = l_rows.filter(member if semi else pc.invert(member))
        return out.select(l_cols)

    out_ds = both.groupby("__part").map_groups(per_part, batch_format="pyarrow")
    return _anchor_schema(out_ds, _tagged_empty(l_schema, l_schema), per_part)


def hash_grouped_sum(
    ds: rd.Dataset,
    keys: list[str],
    val_col: str,
    alias: str,
    n_parts: int = 16,
) -> rd.Dataset:
    """Distributed grouped SUM via bounded hash co-group + one Arrow
    ``group_by`` per partition — the same 4×-measured win over Ray's
    sample+sort+reduce aggregate that ``final_sum`` uses, returned as
    a DATASET so callers can keep sorting/limiting distributedly.
    Callers are expected to have pre-combined map-side (per-batch
    partials), so the shuffle moves ~distinct-keys-per-block rows."""

    def add_part(t: pa.Table) -> pa.Table:
        return add_part_column(t, list(keys), n_parts)

    def agg_part(g: pa.Table) -> pa.Table:
        out = g.group_by(keys).aggregate([(val_col, "sum")])
        # name-based select before the positional rename (see final_sum)
        out = out.select(keys + [f"{val_col}_sum"])
        return out.rename_columns(keys + [alias])

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(agg_part, batch_format="pyarrow")
    )


def hash_grouped_agg(
    ds: rd.Dataset,
    keys: list[str],
    mins: tuple[str, ...] = (),
    sums: tuple[str, ...] = (),
    count_alias: str | None = None,
    n_parts: int = 16,
    anchor_schema: pa.Schema | None = None,
) -> rd.Dataset:
    """Grouped MIN / SUM / COUNT via the bounded hash co-group — the
    multi-aggregate sibling of ``hash_grouped_sum`` for the dedup
    family's (min representative id, copy count) shape. Map-side
    per-batch partials combine here (min and sum are self-combining;
    the row count becomes a summed partial), so the shuffle moves
    ~distinct-keys-per-block narrow rows, and the final pass is one
    Arrow ``group_by`` per partition instead of Ray's
    sample+sort+reduce aggregate (4× measured, see final_sum).

    ``mins``/``sums`` take column names (output keeps the name) or a
    {column: output_alias} dict — required when one column is both
    min'd and summed.

    ``anchor_schema``: zero groups yield a zero-BLOCK dataset (Ray
    drops empty blocks — the ``table()`` contract), so ``to_pandas``
    on an empty corpus loses the columns; callers that know their
    output schema pass it here and get one typed empty anchor block
    unioned on, exactly like the join family's ``_anchor_schema``."""
    mins = dict(mins) if isinstance(mins, dict) else {c: c for c in mins}
    sums = dict(sums) if isinstance(sums, dict) else {c: c for c in sums}
    out_names = (
        list(keys) + list(mins.values()) + list(sums.values())
        + ([count_alias] if count_alias else [])
    )
    if len(set(out_names)) != len(out_names):
        raise ValueError(f"duplicate output names: {out_names} — pass aliases")

    def partial(t: pa.Table) -> pa.Table:
        aggs = [(c, "min") for c in mins] + [(c, "sum") for c in sums]
        if count_alias:
            aggs.append(([], "count_all"))
        out = t.group_by(keys).aggregate(aggs)
        sel = (
            list(keys)
            + [f"{c}_min" for c in mins]
            + [f"{c}_sum" for c in sums]
            + (["count_all"] if count_alias else [])
        )
        return out.select(sel).rename_columns(out_names)

    def add_part(t: pa.Table) -> pa.Table:
        return add_part_column(t, list(keys), n_parts)

    def agg_part(g: pa.Table) -> pa.Table:
        aggs = [(a, "min") for a in mins.values()] + [
            (a, "sum")
            for a in list(sums.values()) + ([count_alias] if count_alias else [])
        ]
        out = g.group_by(keys).aggregate(aggs)
        sel = (
            list(keys)
            + [f"{a}_min" for a in mins.values()]
            + [f"{a}_sum" for a in sums.values()]
            + ([f"{count_alias}_sum"] if count_alias else [])
        )
        return out.select(sel).rename_columns(out_names)

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(agg_part, batch_format="pyarrow")
    )
    if anchor_schema is not None:
        out = out.union(rd.from_arrow(anchor_schema.empty_table()))
    return out
