"""Relational operator suite over the driver's TPC-H-ish tables.

Each function is one `queries()` entry in ``__ray_entry__.py`` with a
matching DuckDB oracle SQL; together they cover the reference's
operator inventory (SURVEY.md §2) on real tables:

- global aggregates (A1), NXX weighted quantile (A2, lq_utils.py:33-53)
- predicate-fraction aggregates (A6/A7, lq_coverage.py:211-224)
- binned grouped stats (A13/A14, lq_mask.py:43-66)
- broadcast anti/semi joins (J1/J2, lq_coverage.py:104-107)
- ordered within-group merge (J3/M12, lq_sequel.py:76-137)
- desc sort + limit (O4/O7), cohort split + union (O3, longQC.py:409-415)
- deterministic bottom-k sampling (O1 analogue, chunk-independent)
- windowed event aggregation (streaming-window analogue, §2.9)

Exactness contract with the SQL oracle: counts/sums stay in the
integer domain (money → per-row cents), means are ratios of exact
integers — so the driver's value-hash matches bit-for-bit.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.stats import nxx
from .util import cents, grouped_sums, scale_cap, table


# ---------------------------------------------------------------- A1/A2

def doc_corpus_stats(sf_dir: str) -> pa.Table:
    """Global throughput stats (A1: sum/max/mean/count, longQC.py:468-471)."""
    ds = table(sf_dir, "documents", columns=["n_chars"])
    from ray.data.aggregate import Count, Max, Sum

    # one fused aggregate — count folded in so the read executes ONCE
    agg = ds.aggregate(Sum("n_chars", alias_name="total_chars"),
                       Max("n_chars", alias_name="max_chars"),
                       Count(alias_name="n_docs"))
    if agg is None or agg.get("n_docs") in (None, 0):  # empty partition set
        return pa.table({
            "n_docs": pa.array([0], pa.int64()),
            "total_chars": pa.array([0], pa.int64()),
            "max_chars": pa.array([0], pa.int64()),
            "mean_chars": pa.array([float("nan")], pa.float64()),
        })
    n = int(agg["n_docs"])
    total = int(agg["total_chars"])
    return pa.table({
        "n_docs": pa.array([n], pa.int64()),
        "total_chars": pa.array([total], pa.int64()),
        "max_chars": pa.array([int(agg["max_chars"])], pa.int64()),
        "mean_chars": pa.array([total / n], pa.float64()),
    })


def doc_n50(sf_dir: str) -> pa.Table:
    """N50 weighted quantile over document lengths (A2, lq_utils.py:33-53)
    via the 2-pass histogram refinement — no global sort. The column
    range/count come free from the parquet footers (scan-level stats),
    skipping the min/max/count execution when available."""
    from .util import parquet_column_stats

    ds = table(sf_dir, "documents", columns=["n_chars"])
    v = nxx(ds, "n_chars", frac=0.5,
            prior_stats=parquet_column_stats(sf_dir, "documents", "n_chars"))
    if v != v:  # 0-row corpus → NULL, matching the SQL aggregate
        return pa.table({"n50": pa.nulls(1, pa.int64())})
    return pa.table({"n50": pa.array([int(v)], pa.int64())})


# ---------------------------------------------------------------- A6/A7

def doc_quality_flags(sf_dir: str) -> pa.Table:
    """Predicate-fraction aggregates (A6/A7: unmapped/high-div fractions,
    lq_coverage.py:211-224) — per-batch int partials, exact ratios."""
    ds = table(sf_dir, "documents", columns=["n_chars", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        nc = batch.column("n_chars").to_numpy(zero_copy_only=False)
        lang = np.asarray(batch.column("lang").to_pylist(), dtype=object)
        return pa.table({
            "n": pa.array([batch.num_rows], pa.int64()),
            "n_short": pa.array([int((nc < 200).sum())], pa.int64()),
            "n_long": pa.array([int((nc >= 400).sum())], pa.int64()),
            "n_nonen": pa.array([int((lang != "en").sum())], pa.int64()),
        })

    from .util import ensure_columns

    parts = ensure_columns(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536).to_pandas(),
        {"n": np.int64, "n_short": np.int64, "n_long": np.int64, "n_nonen": np.int64},
    )
    n = int(parts["n"].sum())
    if n == 0:
        # NULL fractions, matching the SQL twin (sum()/count(*) over
        # zero rows is NULL in DuckDB) — the convention doc_n50 and
        # value_quantiles use for their 0-row answers
        return pa.table({
            "n_docs": pa.array([0], pa.int64()),
            "frac_short": pa.nulls(1, pa.float64()),
            "frac_long": pa.nulls(1, pa.float64()),
            "frac_nonen": pa.nulls(1, pa.float64()),
        })
    return pa.table({
        "n_docs": pa.array([n], pa.int64()),
        "frac_short": pa.array([parts["n_short"].sum() / n], pa.float64()),
        "frac_long": pa.array([parts["n_long"].sum() / n], pa.float64()),
        "frac_nonen": pa.array([parts["n_nonen"].sum() / n], pa.float64()),
    })


# ---------------------------------------------------------------- A13/A14

def length_bin_profile(sf_dir: str) -> pd.DataFrame:
    """Binned boxplot-style stats (A13: bin by floor(len/interval),
    per-bin count/mean/median, lq_mask.py:43-66). The median is the
    DISCRETE grouped quantile via functions/stats.grouped_quantile_disc
    — a fixed (n_bins × hist_bins) count-matrix aggregate + one bounded
    refinement collect, so no bin is ever loaded whole into one pandas
    group (the previous map_groups median was O(bin size) driver-side
    memory per group — a scale killer for hot bins at 10^12 rows).
    Count/mean ride the same fused per-group aggregate."""
    from ..functions.stats import grouped_quantile_disc

    ds = table(sf_dir, "documents", columns=["n_chars"])

    def add_bin(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.floor(pc.divide(pc.cast(t.column("n_chars"), pa.float64()), 100.0)), pa.int64())
        return t.append_column("bin", b)

    rows = ds.map_batches(add_bin, batch_format="pyarrow", batch_size=65536)
    med, gstats = grouped_quantile_disc(rows, "bin", "n_chars", [0.5], with_stats=True)
    bins = sorted(med)
    return pd.DataFrame({
        "bin": np.asarray(bins, dtype=np.int64),
        "n": np.asarray([gstats[b][0] for b in bins], dtype=np.int64),
        "mean_chars": [float(gstats[b][1]) / gstats[b][0] for b in bins],
        "med_chars": [float(med[b][0]) for b in bins],
    })


def source_lang_profile(sf_dir: str) -> pd.DataFrame:
    """Grouped sums with map-side combiners (the A13 shuffle pattern):
    per (source, lang): doc count, total chars, exact mean."""
    ds = table(sf_dir, "documents", columns=["source", "lang", "n_chars"])
    out = grouped_sums(ds, ["source", "lang"], ["n_chars"])
    out = out.rename(columns={"n_chars_total": "total_chars", "n_total": "n_docs"})
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["total_chars"] = out["total_chars"].astype(np.int64)
    out["mean_chars"] = out["total_chars"] / out["n_docs"]
    return out[["source", "lang", "n_docs", "total_chars", "mean_chars"]]


# ---------------------------------------------------------------- J1/J2

# Above this many expected filter keys the collected side stops being
# broadcastable (the key sets here are fixed FRACTIONS of the corpus —
# doc_id % 101, user_id % 7 — so they GROW with the input; 5e6 int64
# keys ≈ 40 MB per worker is the same budget as NATION_BROADCAST_CAP)
# and the shuffled anti/semi join (util.hash_anti_semi_join, proven by
# parts_never_bulk_ordered) takes over. The estimate comes from the
# parquet footer row count — metadata only, no extra execution. Both
# branches produce identical rows (asserted in tests).
FILTER_KEYS_BROADCAST_CAP = 5_000_000


def _footer_rows(sf_dir: str, name: str, col: str) -> int | None:
    from .util import parquet_column_stats

    st = parquet_column_stats(sf_dir, name, col)
    return None if st is None else st[2]


def _typed_empty_guard(
    sf_dir: str, name: str, columns: list[str],
    extra: list[tuple[str, pa.DataType]] = (),
) -> pa.Table | None:
    """Typed-empty early return for 0-row single-file inputs. Ray
    cannot carry a schema through a zero-ROW dataset boundary —
    ``iter_batches`` yields no batches, so ``to_pandas`` loses every
    column no matter how carefully the pipeline anchors its blocks —
    so Dataset-returning JOIN queries answer a 0-row table with a
    typed empty Arrow table instead (matching the oracle's typed empty
    result), exactly like the aggregate family's guards. ``columns``
    keep their parquet types; ``extra`` appends computed columns."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path) or pq.read_metadata(path).num_rows != 0:
        return None
    sch = pq.read_schema(path)
    fields = [(c, sch.field(c).type) for c in columns] + list(extra)
    return pa.schema(fields).empty_table()


def _table_parts(sf_dir: str, name: str, col: str, rows_per_part: int = 250_000) -> int:
    """Data-scaled ``__part`` count for one driver table (util.scaled_parts
    over the footer row count — metadata only). Light vectorized
    per-partition kernels (window family) take the 250k default; heavy
    per-partition work (pandas merges in hash joins) passes ~25k so a
    node's cores stay busy (measured 5.7 s → 3.2 s on the sf0.1
    lineitem⋈orders join at 32 CPUs)."""
    from .util import scaled_parts

    return scaled_parts(_footer_rows(sf_dir, name, col), rows_per_part=rows_per_part)


def control_anti_join(sf_dir: str) -> rd.Dataset:
    """Anti-join on control keys (J1: control-read removal,
    lq_coverage.py:104-107). Small regime: the control-key predicate is
    pushed INTO a map_batches filter so only the ~1/101 matching keys
    ever reach the driver, then ``ray.put`` once and read inside every
    filter task. Above FILTER_KEYS_BROADCAST_CAP expected keys the
    broadcast would grow with the corpus, so the shuffled anti join
    takes over — no driver collect at all."""
    def controls(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": pa.array(ids[ids % 101 == 0], pa.int64())})

    empty = _typed_empty_guard(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    if empty is not None:
        return empty
    key_ds = table(sf_dir, "documents", columns=["doc_id"]).map_batches(
        controls, batch_format="pyarrow"
    )
    ds = table(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    n_rows = _footer_rows(sf_dir, "documents", "doc_id")
    if n_rows is None or n_rows // 101 > scale_cap("FILTER_KEYS_BROADCAST", FILTER_KEYS_BROADCAST_CAP):
        from .util import hash_anti_semi_join

        return hash_anti_semi_join(ds, key_ds, "doc_id", "doc_id",
                                   n_parts=_table_parts(sf_dir, "documents", "doc_id"))

    ids = key_ds.to_pandas()["doc_id"].to_numpy()
    keys_ref = ray.put(pa.array(np.sort(ids), pa.int64()))

    def drop_control(batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(batch.column("doc_id"), value_set=ray.get(keys_ref)))
        return batch.filter(mask)

    return ds.map_batches(drop_control, batch_format="pyarrow")


def sample_semi_join(sf_dir: str) -> rd.Dataset:
    """Semi-join on sampled users (J2: sampled-name membership,
    lq_utils.py:393-395): keep only events of sampled users. Small
    regime: per-batch-unique sampled keys collect to the driver and
    broadcast once. Above FILTER_KEYS_BROADCAST_CAP expected keys
    (the sampled set is ~1/7 of all users — it grows with the corpus)
    the shuffled semi join takes over."""
    def project(batch: pa.Table) -> pa.Table:
        vcents = cents(batch.column("value").to_numpy(zero_copy_only=False))
        return pa.table({
            "event_id": batch.column("event_id"),
            "user_id": batch.column("user_id"),
            "value_cents": pa.array(vcents, pa.int64()),
        })

    def sampled(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table({"user_id": pa.array(np.unique(u[u % 7 == 0]), pa.int64())})

    import pyarrow as pa_
    empty = _typed_empty_guard(
        sf_dir, "events", ["event_id", "user_id"], extra=[("value_cents", pa_.int64())]
    )
    if empty is not None:
        return empty
    key_ds = table(sf_dir, "events", columns=["user_id"]).map_batches(
        sampled, batch_format="pyarrow"
    )
    ds = table(sf_dir, "events", columns=["event_id", "user_id", "value"])

    n_rows = _footer_rows(sf_dir, "events", "user_id")
    if n_rows is None or n_rows // 7 > scale_cap("FILTER_KEYS_BROADCAST", FILTER_KEYS_BROADCAST_CAP):
        from .util import hash_anti_semi_join

        left = ds.map_batches(project, batch_format="pyarrow")
        return hash_anti_semi_join(left, key_ds, "user_id", "user_id", semi=True,
                                   n_parts=_table_parts(sf_dir, "events", "user_id"))

    ids = key_ds.to_pandas()["user_id"].to_numpy()
    ref = ray.put(pa.array(np.unique(ids), pa.int64()))

    def keep_sampled(batch: pa.Table) -> pa.Table:
        vs = ray.get(ref)
        out = batch.filter(pc.is_in(batch.column("user_id"), value_set=vs))
        return project(out)

    return ds.map_batches(keep_sampled, batch_format="pyarrow")


# ---------------------------------------------------------------- J3/M12

_SESSION_GAP_US = 3_600_000_000  # 1 h in exact microseconds


def _grouped_parts(
    ds: rd.Dataset, key: str, part_fn, n_parts: int = 64,
    batch_format: str = "pandas",
) -> rd.Dataset:
    """Bounded hash-partition per-key pattern (same ``__part``
    discipline as util.hash_join / dedup_shuffle): all rows of one key
    land in one of ``n_parts`` partitions, and ``part_fn`` processes a
    WHOLE partition vectorized — per-group Python cost is O(n_parts),
    not O(n_keys), so 10^8 keys cost the same per-row work as 10^2.

    Returns the per-partition results as a DATASET — callers must not
    collect it unless the result is provably small (the window-family
    queries emit O(input) rows; a driver ``to_pandas`` there is an OOM
    at 10^12 rows, so they pass the Dataset straight through)."""

    def add_part(t: pa.Table) -> pa.Table:
        # shared helper, NOT an inline hash: _part_hash carries the
        # null-safety (nullable int → float64+NaN detour) and string-key
        # support a partition scheme needs exactly once, in one place
        from .util import _part_hash

        h = _part_hash(t, key, n_parts)
        return t.append_column("__part", pa.array(h, pa.int64()))

    def run(g):
        if batch_format == "pandas":
            return part_fn(g.drop(columns="__part"))
        return part_fn(g.drop_columns(["__part"]))

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(run, batch_format=batch_format)
    )


def _user_sorted(g: pd.DataFrame, extra: list[str] | None = None):
    """Partition rows sorted by (user_id, ts [, extra]); returns
    (uid, ts_us, group-start indices) — the shared setup for every
    vectorized per-user kernel below."""
    g = g.sort_values(["user_id", "ts"] + (extra or []), kind="stable")
    uid = g["user_id"].to_numpy().astype(np.int64)
    ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    new_user = np.concatenate([[True], uid[1:] != uid[:-1]])
    starts = np.nonzero(new_user)[0]
    return g, uid, ts, new_user, starts


def user_sessions(sf_dir: str) -> rd.Dataset:
    """Ordered within-group merge (M12 construct_polread,
    lq_sequel.py:76-137): per user, sort events by time, split into
    sessions at >1h gaps.

    MAP-SIDE COMBINER (same associativity as
    ``user_activity_intervals``): each batch emits its per-user
    partial SESSIONS with attached (n_events, value_cents) sums; the
    shuffle carries session rows, never raw events. Every output
    column is derivable from the merged sessions: n_sessions = session
    count, n_events / total_value = sums, first/last = first start /
    last end."""
    ds = table(sf_dir, "events", columns=["user_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        vc = cents(t.column("value").to_numpy(zero_copy_only=False))
        order = np.lexsort((ts, uid))
        uid, ts, vc = uid[order], ts[order], vc[order]
        new_user = np.concatenate([[True], uid[1:] != uid[:-1]])
        gap = np.concatenate([[0], np.diff(ts)])
        iv_start = np.nonzero(new_user | (gap > _SESSION_GAP_US))[0]
        iv_end = np.append(iv_start[1:], uid.size) - 1
        return pa.table({
            "user_id": pa.array(uid[iv_start], pa.int64()),
            "start_us": pa.array(ts[iv_start], pa.int64()),
            "end_us": pa.array(ts[iv_end], pa.int64()),
            "n": pa.array(np.diff(np.append(iv_start, uid.size)), pa.int64()),
            "vc": pa.array(np.add.reduceat(vc, iv_start), pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "start_us", "end_us"], kind="stable")
        uid = g["user_id"].to_numpy()
        s = g["start_us"].to_numpy()
        e = g["end_us"].to_numpy()
        nn = g["n"].to_numpy()
        vv = g["vc"].to_numpy()
        sess: list[tuple] = []  # (user, start, end, n, vc) merged sessions
        cu = None
        cs = ce = cn = cv = 0
        for i in range(uid.size):
            if uid[i] != cu or s[i] - ce > _SESSION_GAP_US:
                if cu is not None:
                    sess.append((cu, cs, ce, cn, cv))
                cu, cs, ce, cn, cv = uid[i], s[i], e[i], nn[i], vv[i]
            else:
                ce = max(ce, e[i]); cn += nn[i]; cv += vv[i]
        if cu is not None:
            sess.append((cu, cs, ce, cn, cv))
        if not sess:
            return pd.DataFrame({
                "user_id": np.empty(0, np.int64), "n_events": np.empty(0, np.int64),
                "n_sessions": np.empty(0, np.int64), "first_ts_s": np.empty(0, np.int64),
                "last_ts_s": np.empty(0, np.int64), "total_value_cents": np.empty(0, np.int64),
            })
        arr = np.asarray(sess, dtype=np.int64)
        u = arr[:, 0]
        new_user = np.concatenate([[True], u[1:] != u[:-1]])
        first = np.nonzero(new_user)[0]
        ends = np.append(first[1:], u.size) - 1
        return pd.DataFrame({
            "user_id": u[first],
            "n_events": np.add.reduceat(arr[:, 3], first),
            "n_sessions": np.diff(np.append(first, u.size)).astype(np.int64),
            "first_ts_s": arr[first, 1] // 1_000_000,
            "last_ts_s": arr[ends, 2] // 1_000_000,
            "total_value_cents": np.add.reduceat(arr[:, 4], first),
        })

    return _grouped_parts(parts, "user_id", per_part, n_parts=_table_parts(sf_dir, "events", "user_id"))


# ---------------------------------------------------------------- O3/O4/O7

def top_docs(sf_dir: str) -> pd.DataFrame:
    """Descending sort + limit (O4 N50 sort / O7 top-k): top 100 docs
    by length, deterministic tie-break on doc_id."""
    from .util import local_topk

    ds = table(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return local_topk(ds, ["n_chars", "doc_id"], [True, False], 100).to_pandas()


def cohort_union(sf_dir: str) -> rd.Dataset:
    """Cohort split + union (O3 shape — the reference's short/normal
    cohort split, longQC.py:409-415, re-targeted to this corpus): the
    graft splits documents at 250 chars into 'short'/'long' cohorts as
    two filtered sub-pipelines re-joined. The SQL twin pins the same
    250/'long' values — do not 'fix' them toward the reference's
    500/'normal' without changing both sides."""
    ds = table(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def tag(which: str):
        def fn(batch: pa.Table) -> pa.Table:
            nc = batch.column("n_chars")
            mask = pc.less(nc, 250) if which == "short" else pc.greater_equal(nc, 250)
            out = batch.filter(mask)
            return pa.table({
                "doc_id": out.column("doc_id"),
                "cohort": pa.array([which] * out.num_rows, pa.string()),
            })
        return fn

    short = ds.map_batches(tag("short"), batch_format="pyarrow")
    normal = ds.map_batches(tag("long"), batch_format="pyarrow")
    return short.union(normal)


def deterministic_sample(sf_dir: str) -> pd.DataFrame:
    """Chunk-independent deterministic sampler (the engine's O1
    replacement — SURVEY.md §7.3 item 1): bottom-500 doc_ids by
    FNV-1a(decimal doc_id) priority — one vectorized hash kernel per
    batch (kernels/text.fnv1a_64_ints), zero per-row Python; per-batch
    partial bottom-k, tiny driver merge, no shuffle. The SQL twin
    replicates the hash with the hex-fold FNV fold."""
    from ..kernels.text import fnv1a_64_ints

    n = 500
    ds = table(sf_dir, "documents", columns=["doc_id"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        prio = fnv1a_64_ints(ids)
        order = np.lexsort((ids, prio))[:n]
        return pa.table({
            "doc_id": pa.array(ids[order], pa.int64()),
            "prio": pa.array(prio[order], pa.uint64()),
        })

    from .util import ensure_columns

    parts = ensure_columns(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536).to_pandas(),
        {"doc_id": np.int64, "prio": np.uint64},
    )
    parts = parts.sort_values(["prio", "doc_id"], kind="stable").head(n)
    return parts[["doc_id"]].reset_index(drop=True)


# ---------------------------------------------------------------- TPC-H-ish

def pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-shaped grouped aggregate over lineitem with map-side
    combiners; money in exact cents (per-row round, int64 sums)."""
    ds = table(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        return pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "l_linestatus": batch.column("l_linestatus"),
            "qty_c": pa.array(cents(qty), pa.int64()),
            "price_c": pa.array(cents(price), pa.int64()),
            "disc_price_c": pa.array(cents(price * (1.0 - disc)), pa.int64()),
        })

    rows = ds.map_batches(to_cents, batch_format="pyarrow", batch_size=65536)
    out = grouped_sums(rows, ["l_returnflag", "l_linestatus"], ["qty_c", "price_c", "disc_price_c"])
    out = out.rename(columns={
        "qty_c_total": "sum_qty_cents",
        "price_c_total": "sum_base_cents",
        "disc_price_c_total": "sum_disc_cents",
        "n_total": "count_order",
    })
    for c in ("sum_qty_cents", "sum_base_cents", "sum_disc_cents", "count_order"):
        out[c] = out[c].astype(np.int64)
    out["avg_qty"] = out["sum_qty_cents"] / out["count_order"] / 100.0
    return out[["l_returnflag", "l_linestatus", "sum_qty_cents", "sum_base_cents",
                "sum_disc_cents", "avg_qty", "count_order"]]


# Above this many customer rows the dim stops being broadcastable
# (TPC-H sf100 ≈ 15M customers ≈ 240 MB of keys+codes per worker) and
# the large×large co-group hash join takes over. Either path produces
# identical grouped sums.
NATION_BROADCAST_CAP = 5_000_000


def nation_revenue(sf_dir: str) -> pd.DataFrame:
    """Broadcast join (J5-style small-side lookup instead of a shuffle
    join): customer→nation map built once on the driver, ``ray.put``
    once, applied per batch over orders; then combiner groupby.

    The per-batch lookup is fully vectorized: sorted custkey array +
    ``np.searchsorted`` → nation CODE per row (int8, 25 nations); the
    grouped sums run on the code and the name is attached to the tiny
    25-row result at the end — no per-row Python, no string payload in
    the shuffle. Above NATION_BROADCAST_CAP customer rows the function
    falls back to ``util.hash_join`` (documented crossover)."""
    nation = table(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    cust_ds = table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    orders = table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    # crossover decision from footer metadata (no row data read); only
    # when footers lack counts does the decision cost an execution
    n_cust = _footer_rows(sf_dir, "customer", "c_custkey")
    if n_cust is None:
        n_cust = cust_ds.count()

    if n_cust > NATION_BROADCAST_CAP:
        from .util import hash_join

        def project_orders(batch: pa.Table) -> pa.Table:
            return pa.table({
                "o_custkey": batch.column("o_custkey"),
                "price_c": pa.array(
                    cents(batch.column("o_totalprice").to_numpy(zero_copy_only=False)),
                    pa.int64(),
                ),
            })

        joined = hash_join(
            orders.map_batches(project_orders, batch_format="pyarrow", batch_size=65536),
            cust_ds,
            "o_custkey",
            "c_custkey",
            n_parts=_table_parts(sf_dir, "orders", "o_custkey", rows_per_part=25_000),
        )
        out = grouped_sums(joined, ["c_nationkey"], ["price_c"])
        key_col = "c_nationkey"
    else:
        cust = cust_ds.to_pandas()
        if cust.empty:  # empty partition set: typed empty result
            return pd.DataFrame({
                "n_name": pd.Series(dtype=object),
                "n_orders": pd.Series(dtype=np.int64),
                "revenue_cents": pd.Series(dtype=np.int64),
            })
        order_idx = np.argsort(cust["c_custkey"].to_numpy(), kind="stable")
        ck_sorted = cust["c_custkey"].to_numpy()[order_idx]
        nk_sorted = cust["c_nationkey"].to_numpy()[order_idx].astype(np.int16)
        side_ref = ray.put((ck_sorted, nk_sorted))

        def add_nation(batch: pa.Table) -> pa.Table:
            ck_s, nk_s = ray.get(side_ref)
            ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(ck_s, ck)
            # FK integrity must be CHECKED, not assumed: a missing key
            # would otherwise read a neighboring customer's nation
            # (silently wrong revenue attribution) or index past the end
            pos = np.minimum(pos, ck_s.size - 1)
            if not np.array_equal(ck_s[pos], ck):
                raise ValueError("o_custkey missing from customer (FK violation)")
            price_c = cents(batch.column("o_totalprice").to_numpy(zero_copy_only=False))
            return pa.table({
                "nk": pa.array(nk_s[pos].astype(np.int64), pa.int64()),
                "price_c": pa.array(price_c, pa.int64()),
            })

        rows = orders.map_batches(add_nation, batch_format="pyarrow", batch_size=65536)
        out = grouped_sums(rows, ["nk"], ["price_c"])
        key_col = "nk"

    out = out.rename(columns={"price_c_total": "revenue_cents", "n_total": "n_orders"})
    nk2name = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))
    out["n_name"] = out[key_col].map(nk2name)
    out["n_orders"] = out["n_orders"].astype(np.int64)
    out["revenue_cents"] = out["revenue_cents"].astype(np.int64)
    return out[["n_name", "n_orders", "revenue_cents"]].reset_index(drop=True)


def order_revenue_join(sf_dir: str) -> pd.DataFrame:
    """Large×large co-group hash join (lineitem ⋈ orders on orderkey,
    both sides too big to broadcast) → per-priority revenue. Both
    sides project to (key + 1 payload column) BEFORE the shuffle."""
    li = table(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def project_li(batch: pa.Table) -> pa.Table:
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        return pa.table({
            "l_orderkey": batch.column("l_orderkey"),
            "disc_price_c": pa.array(cents(price * (1.0 - disc)), pa.int64()),
        })

    li2 = li.map_batches(project_li, batch_format="pyarrow", batch_size=65536)
    orders = table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    from .util import hash_join

    joined = hash_join(li2, orders, "l_orderkey", "o_orderkey",
                       n_parts=_table_parts(sf_dir, "lineitem", "l_orderkey", rows_per_part=25_000),
                       # projection schema (empty partitions: Ray can't
                       # infer a row-less map output — see hash_join)
                       l_schema=pa.schema([
                           ("l_orderkey", li.schema().base_schema.field("l_orderkey").type),
                           ("disc_price_c", pa.int64()),
                       ]))
    # distinct order count per priority: two-stage (priority, orderkey)
    # grouped sums, then per-priority rollup (same shape as occupancy)
    per_order = grouped_sums(joined, ["o_orderpriority", "l_orderkey"], ["disc_price_c"])
    per_order = per_order.rename(columns={"disc_price_c_total": "rev"})
    out = (
        per_order.groupby("o_orderpriority", as_index=False)
        .agg(n_orders=("l_orderkey", "size"), revenue_cents=("rev", "sum"))
    )
    out["n_orders"] = out["n_orders"].astype(np.int64)
    out["revenue_cents"] = out["revenue_cents"].astype(np.int64)
    return out[["o_orderpriority", "n_orders", "revenue_cents"]]


def user_gap_profile(sf_dir: str) -> rd.Dataset:
    """Terminal/internal gap analysis (M11 __region_analysis analogue,
    lq_coverage.py:623-655: 5'-gap, 3'-gap, internal gap lengths per
    read → here per user against the global event window). The global
    bounds are one tiny aggregate broadcast into the per-group pass."""
    ds = table(sf_dir, "events", columns=["user_id", "ts"])
    from .util import parquet_ts_bounds

    fb = parquet_ts_bounds(sf_dir, "events", "ts")
    if fb is not None:
        # footer short-circuit: global time bounds come from row-group
        # statistics (metadata-only), saving one whole Min/Max
        # aggregate execution
        g0, g1 = fb
    else:
        from ray.data.aggregate import Max, Min

        bounds = ds.aggregate(Min("ts", alias_name="g0"), Max("ts", alias_name="g1"))
        g0 = int(np.datetime64(bounds["g0"], "us").astype(np.int64))
        g1 = int(np.datetime64(bounds["g1"], "us").astype(np.int64))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g, uid, ts, new_user, starts = _user_sorted(g)
        gap = np.concatenate([[0], np.diff(ts)])
        internal = np.where((~new_user) & (gap > _SESSION_GAP_US), gap, 0)
        ends = np.append(starts[1:], uid.size) - 1
        return pd.DataFrame({
            "user_id": uid[starts],
            "head_gap_us": ts[starts] - g0,
            "tail_gap_us": g1 - ts[ends],
            "internal_gap_us": np.add.reduceat(internal, starts),
        })

    return _grouped_parts(ds, "user_id", per_part, n_parts=_table_parts(sf_dir, "events", "user_id"))


def user_activity_intervals(sf_dir: str) -> rd.Dataset:
    """Ordered within-group interval MERGE (M12/T4 construct_polread +
    compute_reliable_region analogue, lq_sequel.py:76-137 /
    lqutils.c:83-155): per user, events within 1 h merge into activity
    intervals. One row per (user, interval ordinal) — the flat shape
    is the scale-correct one (per-user interval lists are unbounded at
    10^12 rows) and hash-comparable against the SQL twin."""
    ds = table(sf_dir, "events", columns=["user_id", "ts"])

    # MAP-SIDE COMBINER: threshold-interval merge is associative
    # (closing "within 1h" on subsets, then re-closing the merged
    # partials, equals closing the union), so each batch emits its
    # per-user PARTIAL intervals and the shuffle carries interval rows
    # (~n_intervals + one per batch-boundary), never the raw events.
    def partial(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        new_user = np.concatenate([[True], uid[1:] != uid[:-1]])
        gap = np.concatenate([[0], np.diff(ts)])
        iv_start = np.nonzero(new_user | (gap > _SESSION_GAP_US))[0]
        iv_end = np.append(iv_start[1:], uid.size) - 1
        return pa.table({
            "user_id": pa.array(uid[iv_start], pa.int64()),
            "start_us": pa.array(ts[iv_start], pa.int64()),
            "end_us": pa.array(ts[iv_end], pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "start_us", "end_us"], kind="stable")
        uid = g["user_id"].to_numpy()
        s = g["start_us"].to_numpy()
        e = g["end_us"].to_numpy()
        # sequential union-with-threshold over the (few) interval rows:
        # O(intervals), not O(events)
        out_u, out_s, out_e = [], [], []
        cur_u = None
        cur_s = cur_e = 0
        for i in range(uid.size):
            if uid[i] != cur_u or s[i] - cur_e > _SESSION_GAP_US:
                if cur_u is not None:
                    out_u.append(cur_u); out_s.append(cur_s); out_e.append(cur_e)
                cur_u, cur_s, cur_e = uid[i], s[i], e[i]
            else:
                cur_e = max(cur_e, e[i])
        if cur_u is not None:
            out_u.append(cur_u); out_s.append(cur_s); out_e.append(cur_e)
        u = np.asarray(out_u, dtype=np.int64)
        new_user = np.concatenate([[True], u[1:] != u[:-1]]) if u.size else np.empty(0, bool)
        first = np.nonzero(new_user)[0]
        n_per_user = np.diff(np.append(first, u.size))
        idx = np.arange(u.size)
        own_first = first[np.searchsorted(first, idx, side="right") - 1] if u.size else idx
        return pd.DataFrame({
            "user_id": u,
            "iv": (idx - own_first + 1).astype(np.int64),
            "start_s": np.asarray(out_s, dtype=np.int64) // 1_000_000,
            "end_s": np.asarray(out_e, dtype=np.int64) // 1_000_000,
            "n_intervals": np.repeat(n_per_user, n_per_user).astype(np.int64),
        })

    return _grouped_parts(parts, "user_id", per_part, n_parts=_table_parts(sf_dir, "events", "user_id"))


def user_occupancy(sf_dir: str) -> pd.DataFrame:
    """Active-entity occupancy time series (A15 pore-occupancy
    analogue, lq_nanopore.py:294-325): per minute window, the count of
    DISTINCT active users + event count. Distinct is two-stage: dedup
    (window, user) pairs via a grouped count, then sum per window —
    both shuffles carry only pair keys. Both stages go through the
    hash co-group (``hash_grouped_sum``/``final_sum``), not Ray's
    sample+sort+reduce aggregate — the two-key sort on ~10^5 pair rows
    measured 8-12 s vs <1 s for the co-group on this box."""
    from .util import hash_grouped_sum

    ds = table(sf_dir, "events", columns=["user_id", "ts"])

    def pair_partials(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        t = pa.table({
            "window_start_s": pa.array((ts // 60_000_000) * 60, pa.int64()),
            "user_id": batch.column("user_id"),
        })
        out = t.group_by(["window_start_s", "user_id"]).aggregate([([], "count_all")])
        out = out.select(["window_start_s", "user_id", "count_all"])
        return out.rename_columns(["window_start_s", "user_id", "n_pair"])

    pairs = ds.map_batches(pair_partials, batch_format="pyarrow", batch_size=65536)
    per_pair = hash_grouped_sum(
        pairs, ["window_start_s", "user_id"], "n_pair", "n_events_pair"
    )
    out = grouped_sums(per_pair, ["window_start_s"], ["n_events_pair"])
    out = out.rename(columns={"n_events_pair_total": "n_events", "n_total": "active_users"})
    out["n_events"] = out["n_events"].astype(np.int64)
    out["active_users"] = out["active_users"].astype(np.int64)
    return out[["window_start_s", "active_users", "n_events"]]


# ---------------------------------------------------------------- as-of / range joins

def purchase_click_asof(sf_dir: str) -> rd.Dataset:
    """As-of join (custom operator, SURVEY.md §2.4 note — the
    reference has none, a training-data pipeline needs one): each
    purchase event matched to the latest click of the SAME user at or
    before it. Hash-partitioned on user_id + per-partition sorted
    merge (util.asof_merge_tagged); inner semantics like DuckDB ASOF
    JOIN. Both sides are filters of the SAME table, so the tagged
    union is built in ONE scan (one read, one map pass) rather than
    two reads through the generic two-dataset ``asof_join``."""
    from .util import _part_hash, asof_merge_tagged

    empty = _typed_empty_guard(
        sf_dir, "events", ["event_id", "user_id"],
        extra=[("click_event_id", pa.int64()), ("lag_us", pa.int64())],
    )
    if empty is not None:
        return empty
    ds = table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    n_parts = _table_parts(sf_dir, "events", "user_id")

    def tag_both(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        keep = pc.or_(pc.equal(et, "purchase"), pc.equal(et, "click"))
        b = batch.filter(keep)
        h = _part_hash(b, "user_id", n_parts)
        is_l = pc.equal(b.column("event_type"), "purchase").to_numpy(zero_copy_only=False)
        eid = b.column("event_id")
        ts = b.column("ts")
        null_id = pa.nulls(b.num_rows, eid.type)
        null_ts = pa.nulls(b.num_rows, ts.type)
        mask = pa.array(is_l)
        return pa.table({
            "event_id": pc.if_else(mask, eid, null_id),
            "click_event_id": pc.if_else(mask, null_id, eid),
            "user_id": b.column("user_id"),
            "ts": pc.if_else(mask, ts, null_ts),
            "click_ts": pc.if_else(mask, null_ts, ts),
            "__part": pa.array(h, pa.int64()),
            "__side": pc.if_else(mask, pa.scalar("l"), pa.scalar("r")),
        })

    both = ds.map_batches(tag_both, batch_format="pyarrow")
    # empty-input schema anchor: the tagged superset schema derives
    # from the (footer-known) events schema, so a 0-row partition set
    # keeps the output schema instead of collapsing to zero blocks
    sch = ds.schema().base_schema
    _types = {
        "event_id": sch.field("event_id").type,
        "click_event_id": sch.field("event_id").type,
        "user_id": sch.field("user_id").type,
        "ts": sch.field("ts").type,
        "click_ts": sch.field("ts").type,
        "__part": pa.int64(),
        "__side": pa.string(),
    }
    j = asof_merge_tagged(
        both,
        l_cols=["event_id", "user_id", "ts"],
        r_cols=["click_event_id", "user_id", "click_ts"],
        by="user_id", left_on="ts", right_on="click_ts",
        anchor_empty=pa.schema(
            [(n, _types[n]) for n in sorted(_types)]
        ).empty_table(),
    )

    # lag computed per batch; the result stays a Dataset (one row per
    # matched purchase — O(input), never collected on the driver)
    def add_lag(t: pa.Table) -> pa.Table:
        lag = (
            t.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
            - t.column("click_ts").to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        )
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "click_event_id": t.column("click_event_id"),
            "lag_us": pa.array(lag, pa.int64()),
        })

    return j.map_batches(add_lag, batch_format="pyarrow")


_RJ_STRIDE_US = 10 * 3_600_000_000  # window stride 10 h
_RJ_LEN_US = 15 * 3_600_000_000     # window length 15 h (overlapping)
_RJ_N_WIN = 60


def event_window_range_join(sf_dir: str) -> pd.DataFrame:
    """Range join (custom operator): events × OVERLAPPING time windows
    (stride 10 h, length 15 h ⇒ every event hits ≤2 windows). The
    interval side is tiny and derived from one Min aggregate, so the
    join is bin-replication inside ``map_batches``: each event emits a
    row per containing window — no all-to-all; the only shuffle is the
    final combiner groupby over (win_id) partials."""
    from .util import parquet_ts_bounds

    ds = table(sf_dir, "events", columns=["ts", "value"])
    fb = parquet_ts_bounds(sf_dir, "events", "ts")
    if fb is not None:
        g0 = fb[0]  # footer short-circuit, as in user_gap_profile
    else:
        from ray.data.aggregate import Min

        g0 = int(
            np.datetime64(ds.aggregate(Min("ts", alias_name="g0"))["g0"], "us")
            .astype(np.int64)
        )

    def assign(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        val_c = cents(batch.column("value").to_numpy(zero_copy_only=False))
        rel = ts - g0
        wins, vals = [], []
        i0 = rel // _RJ_STRIDE_US
        for cand in (i0, i0 - 1):
            ok = (
                (cand >= 0) & (cand < _RJ_N_WIN)
                & (rel >= cand * _RJ_STRIDE_US)
                & (rel < cand * _RJ_STRIDE_US + _RJ_LEN_US)
            )
            wins.append(cand[ok])
            vals.append(val_c[ok])
        return pa.table({
            "win_id": pa.array(np.concatenate(wins), pa.int64()),
            "value_c": pa.array(np.concatenate(vals), pa.int64()),
        })

    rows = ds.map_batches(assign, batch_format="pyarrow", batch_size=65536)
    out = grouped_sums(rows, ["win_id"], ["value_c"])
    out = out.rename(columns={"value_c_total": "value_cents", "n_total": "n_events"})
    out["n_events"] = out["n_events"].astype(np.int64)
    out["value_cents"] = out["value_cents"].astype(np.int64)
    return out[["win_id", "n_events", "value_cents"]]


def user_rolling_value(sf_dir: str) -> rd.Dataset:
    """Per-key ordered rolling-window aggregate (custom operator): for
    every event, the sum of the user's last 5 event values (ROWS
    BETWEEN 4 PRECEDING AND CURRENT ROW). Sort happens INSIDE
    map_groups (SURVEY.md §7.3 item 6); cents domain keeps the rolling
    sums bit-exact vs the SQL window oracle."""
    ds = table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g, uid, ts, new_user, starts = _user_sorted(g, extra=["event_id"])
        c = cents(g["value"].to_numpy())
        cs = np.cumsum(c)
        idx = np.arange(uid.size)
        # start-of-own-user index per row, then a 5-row window clamped
        # at the user boundary: roll[i] = cs[i] - cs[j-1], j = max(start, i-4)
        own_start = starts[np.searchsorted(starts, idx, side="right") - 1]
        j = np.maximum(own_start, idx - 4)
        roll = cs - np.where(j > 0, cs[j - 1], 0)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(dtype=np.int64),
            "user_id": uid,
            "rn": (idx - own_start + 1).astype(np.int64),
            "roll_value_cents": roll.astype(np.int64),
        })

    return _grouped_parts(ds, "user_id", per_part, n_parts=_table_parts(sf_dir, "events", "user_id"))


_QUANTILE_QS = [0.25, 0.5, 0.75, 0.9, 0.99]


def value_quantiles(sf_dir: str) -> pa.Table:
    """Exact discrete quantiles of lineitem extended price (cents)
    without a global sort — the 2-pass histogram refinement
    (functions/stats.py quantile_disc; A2 scale path)."""
    from ..functions.stats import quantile_disc

    ds = table(sf_dir, "lineitem", columns=["l_extendedprice"])
    rows = ds.map_batches(
        lambda t: pa.table({
            "price_c": pa.array(cents(t.column("l_extendedprice").to_numpy(zero_copy_only=False)), pa.int64())
        }),
        batch_format="pyarrow",
        batch_size=65536,
    )
    vals = quantile_disc(rows, "price_c", _QUANTILE_QS)
    if any(v != v for v in vals):  # 0-row input → NULL quantiles
        return pa.table({
            "q": pa.array(_QUANTILE_QS, pa.float64()),
            "price_cents": pa.nulls(len(_QUANTILE_QS), pa.int64()),
        })
    return pa.table({
        "q": pa.array(_QUANTILE_QS, pa.float64()),
        "price_cents": pa.array([int(v) for v in vals], pa.int64()),
    })


# ---------------------------------------------------------------- windows

def windowed_event_stats(sf_dir: str) -> pd.DataFrame:
    """Tumbling-window aggregate (the time-window analogue of the
    reference's within-row windows, SURVEY.md §2.9): per (event_type,
    hour): count + exact value cents."""
    ds = table(sf_dir, "events", columns=["event_type", "ts", "value"])

    def add_window(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        hour_s = (ts // 3_600_000_000) * 3600
        return pa.table({
            "event_type": batch.column("event_type"),
            "window_start_s": pa.array(hour_s, pa.int64()),
            "value_c": pa.array(cents(batch.column("value").to_numpy(zero_copy_only=False)), pa.int64()),
        })

    rows = ds.map_batches(add_window, batch_format="pyarrow", batch_size=65536)
    out = grouped_sums(rows, ["event_type", "window_start_s"], ["value_c"])
    out = out.rename(columns={"value_c_total": "value_cents", "n_total": "n_events"})
    out["n_events"] = out["n_events"].astype(np.int64)
    out["value_cents"] = out["value_cents"].astype(np.int64)
    return out[["event_type", "window_start_s", "n_events", "value_cents"]]


STRATA_K = 20


def stratified_sample_docs(sf_dir: str, k: int = STRATA_K) -> pd.DataFrame:
    """Stratified deterministic sampling (training-data op): the k
    lowest-FNV-priority docs PER LANGUAGE (vectorized
    kernels/text.fnv1a_64_ints — no per-row Python hashing). Per-batch
    per-stratum bottom-k partials (each batch contributes ≤ k rows per
    stratum), tiny driver merge — no shuffle; the same min-wise-hash
    discipline as ``deterministic_sample``/``functions.sampling``
    extended to group strata."""
    from ..kernels.text import fnv1a_64_ints

    ds = table(sf_dir, "documents", columns=["doc_id", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        langs = np.asarray(batch.column("lang").to_pylist(), dtype=object)
        prio = fnv1a_64_ints(ids)
        keep_idx = []
        for lg in np.unique(langs):  # bounded: one iteration per stratum
            li = np.nonzero(langs == lg)[0]
            order = li[np.lexsort((ids[li], prio[li]))[:k]]
            keep_idx.append(order)
        sel = np.concatenate(keep_idx) if keep_idx else np.empty(0, np.int64)
        return pa.table({
            "lang": pa.array(langs[sel].tolist(), pa.string()),
            "doc_id": pa.array(ids[sel], pa.int64()),
            "prio": pa.array(prio[sel], pa.uint64()),
        })

    from .util import ensure_columns

    parts = ensure_columns(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536).to_pandas(),
        {"doc_id": np.int64, "lang": object, "prio": np.uint64},
    )
    parts = parts.sort_values(["lang", "prio", "doc_id"], kind="stable")
    out = parts.groupby("lang", sort=True).head(k).reset_index(drop=True)
    out["rn"] = (out.groupby("lang").cumcount() + 1).astype(np.int64)
    return out[["lang", "doc_id", "rn"]]


def approx_distinct_users(sf_dir: str) -> pa.Table:
    """A17 scale path: HyperLogLog approximate distinct user count
    (functions/sketch.py) — constant-size mergeable register partials
    instead of the exact pair shuffle. The estimate is fully
    deterministic (exact integer bit-length ranks), so the DuckDB
    oracle replicates the whole sketch in SQL; accuracy vs the exact
    count is additionally pinned ≤2.5% in pytest."""
    from ..functions.sketch import approx_distinct

    ds = table(sf_dir, "events", columns=["user_id"])
    est = approx_distinct(ds, "user_id")
    return pa.table({
        "approx_users": pa.array([int(round(est))], pa.int64()),
    })


# ------------------------------------------------- window-function family
#
# The reference's within-read window passes (lq_mask.py sliding score
# windows, lq_sequel.py ordered per-key walks) generalize to the SQL
# window-function family a training-data pipeline leans on: ranked
# top-k per key, lag/delta per key, and staged funnels. All three use
# the bounded ``__part`` hash-partition discipline (per-group Python
# cost O(n_parts), never O(n_keys)).

TOPK_PER_USER = 3


def _rank_in_user(uid: np.ndarray, order: np.ndarray) -> np.ndarray:
    """0-based rank of each row inside its user run after applying
    ``order`` (uid[order] must be group-contiguous)."""
    u_s = uid[order]
    idx = np.arange(u_s.size)
    new = np.concatenate([[True], u_s[1:] != u_s[:-1]])
    starts = np.nonzero(new)[0]
    own = starts[np.searchsorted(starts, idx, side="right") - 1]
    return idx - own


def top_events_per_user(sf_dir: str, k: int = TOPK_PER_USER) -> rd.Dataset:
    """Distributed top-k per group (O7 per-key variant): each user's k
    highest-value events with dense rank, tie-broken by event_id.

    Scale shape: a map-side PRUNE keeps at most k rows per user per
    batch (the global per-user top-k is a subset of the union of
    per-batch per-user top-k), so the shuffle moves ≤ k·users rows,
    then the bounded-partition final pass ranks whole partitions
    vectorized. No global sort."""
    ds = table(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def topk(t: pa.Table, emit_rank: bool) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        vc = (t.column("value_cents").to_numpy(zero_copy_only=False).astype(np.int64)
              if "value_cents" in t.column_names
              else cents(t.column("value").to_numpy(zero_copy_only=False)))
        order = np.lexsort((eid, -vc, uid))
        rank = _rank_in_user(uid, order)
        keep = order[rank < k]
        cols = {
            "user_id": pa.array(uid[keep], pa.int64()),
            "event_id": pa.array(eid[keep], pa.int64()),
            "value_cents": pa.array(vc[keep], pa.int64()),
        }
        if emit_rank:
            cols["rn"] = pa.array(rank[rank < k] + 1, pa.int64())
        return pa.table(cols)

    pruned = ds.map_batches(
        lambda t: topk(t, emit_rank=False), batch_format="pyarrow", batch_size=8192
    )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        t = pa.Table.from_pandas(g, preserve_index=False)
        return topk(t, emit_rank=True).to_pandas()

    # returned as a Dataset — no driver-side collect/sort; row order is
    # free (the checker canonicalizes), rank is carried in `rn`
    return _grouped_parts(pruned, "user_id", per_part, n_parts=_table_parts(sf_dir, "events", "user_id"))


def user_value_lag(sf_dir: str) -> rd.Dataset:
    """Per-key lag window (LAG(value) OVER (PARTITION BY user ORDER BY
    ts)): previous event value and delta per event, 0 at the key start.
    Same vectorized-partition discipline as user_rolling_value; cents
    domain keeps deltas bit-exact vs the SQL window oracle."""
    ds = table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g, uid, ts, new_user, starts = _user_sorted(g, extra=["event_id"])
        c = cents(g["value"].to_numpy())
        prev = np.empty_like(c)
        prev[0] = 0
        prev[1:] = c[:-1]
        prev[new_user] = 0
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(dtype=np.int64),
            "user_id": uid,
            "prev_value_cents": prev,
            "delta_cents": c - prev,
        })

    return _grouped_parts(ds, "user_id", per_part, n_parts=_table_parts(sf_dir, "events", "user_id"))


FUNNEL_STAGES = ("view", "click", "purchase")


def funnel_conversion(sf_dir: str) -> pa.Table:
    """Staged funnel: users whose FIRST view precedes a later click
    precedes a later purchase (strict ts ordering stage to stage).

    Because each user's rows co-locate in one ``__part`` partition,
    every stage resolves inside the partition with vectorized pandas
    group-mins — the only cross-node traffic is the bounded partition
    shuffle plus one tiny (stage, count) partial per partition."""
    ds = table(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        reached = None  # Series: user_id -> first ts that reached the stage
        counts = []
        for stage in FUNNEL_STAGES:
            e = g[g["event_type"] == stage]
            if reached is not None:
                prev = reached.reindex(e["user_id"]).to_numpy()
                e = e[e["ts"].to_numpy() > prev]  # NaT compares False
            reached = e.groupby("user_id")["ts"].min()
            counts.append(len(reached))
        return pd.DataFrame({"stage": list(FUNNEL_STAGES), "n_users": counts})

    # collect is safe here: the partials are n_parts × n_stages rows
    from .util import ensure_columns

    parts = ensure_columns(
        _grouped_parts(ds, "user_id", per_part,
                       n_parts=_table_parts(sf_dir, "events", "user_id")).to_pandas(),
        {"stage": object, "n_users": np.int64},
    )
    totals = parts.groupby("stage", sort=False)["n_users"].sum()
    return pa.table({
        "stage": pa.array(list(FUNNEL_STAGES), pa.string()),
        "n_users": pa.array([int(totals.get(s, 0)) for s in FUNNEL_STAGES], pa.int64()),
    })


# ------------------------------------------------- exact moment aggregates

def corr_quantity_price(sf_dir: str) -> pd.DataFrame:
    """Distributed Pearson correlation per group via EXACT integer
    moments (the A5 mean/sd pattern pushed one moment further): each
    batch emits per-flag int64 sums (n, Σx, Σy, Σx², Σy², Σxy) in the
    cents domain — at batch_size 16384 the int64 partials are safe up
    to |value| ≤ sqrt(2^63/16384) ≈ 2.37e7 cents (~$237k; TPC-H max
    price ≈ $105k, ~2.2× headroom) and a per-batch guard switches to
    arbitrary-precision Python ints beyond that rather than let int64
    wrap silently — and the driver merges the tiny partials in
    arbitrary-precision Python ints, so the final float is computed
    ONCE from exact integers and matches the DuckDB HUGEINT oracle
    bit-for-bit. No shuffle at all: a few partial rows per batch."""
    import math

    ds = table(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def moments(t: pa.Table) -> pa.Table:
        flags = t.column("l_returnflag").to_pandas()
        x = cents(t.column("l_quantity").to_numpy(zero_copy_only=False))
        y = cents(t.column("l_extendedprice").to_numpy(zero_copy_only=False))
        # int64 product-sum safety bound for this batch's row count
        lim = int(np.sqrt(2**63 // max(len(y), 1)))
        safe = (np.abs(x).max(initial=0) <= lim) and (np.abs(y).max(initial=0) <= lim)

        def dot(a: np.ndarray, b: np.ndarray) -> int:
            if safe:
                return int((a * b).sum())
            v = int(np.sum(a.astype(object) * b.astype(object)))  # exact, no wrap
            if abs(v) >= 2**63:
                raise ValueError(
                    "corr_quantity_price: exact per-batch moment exceeds the "
                    "int64 partial range — lower batch_size for this value scale"
                )
            return v

        codes, uniq = pd.factorize(flags, sort=True)
        cols: dict[str, list] = {c: [] for c in
                                 ["l_returnflag", "n", "sx", "sy", "sxx", "syy", "sxy"]}
        for i, f in enumerate(uniq):
            m = codes == i
            xi, yi = x[m], y[m]
            cols["l_returnflag"].append(str(f))
            cols["n"].append(int(xi.size))
            cols["sx"].append(int(xi.sum()))
            cols["sy"].append(int(yi.sum()))
            cols["sxx"].append(dot(xi, xi))
            cols["syy"].append(dot(yi, yi))
            cols["sxy"].append(dot(xi, yi))
        return pa.table({
            "l_returnflag": pa.array(cols["l_returnflag"], pa.string()),
            **{c: pa.array(cols[c], pa.int64()) for c in
               ["n", "sx", "sy", "sxx", "syy", "sxy"]},
        })

    from .util import ensure_columns

    parts = ensure_columns(
        ds.map_batches(moments, batch_format="pyarrow", batch_size=16384).to_pandas(),
        {"l_returnflag": object, "n": np.int64, "sx": np.int64, "sy": np.int64,
         "sxx": np.int64, "syy": np.int64, "sxy": np.int64},
    )
    # Python-int merge: totals (Σy² ≈ 6e19 at sf0.1) exceed int64.
    merged = parts.astype({c: object for c in ["n", "sx", "sy", "sxx", "syy", "sxy"]})
    tot = merged.groupby("l_returnflag", sort=True).sum()
    rows = []
    for f, r in tot.iterrows():
        n, sx, sy, sxx, syy, sxy = (int(r[c]) for c in ["n", "sx", "sy", "sxx", "syy", "sxy"])
        num = float(n * sxy - sx * sy)
        den = math.sqrt(float(n * sxx - sx * sx)) * math.sqrt(float(n * syy - sy * sy))
        rows.append({"l_returnflag": f, "n": n, "corr_qp": num / den})
    return pd.DataFrame(rows)


# ------------------------------------------------- semi-structured extract

def event_props_extract(sf_dir: str) -> pd.DataFrame:
    """Semi-structured payload extraction (the sts.xml/JSON scalar
    parse S7 generalized to per-row JSON): pull the numeric ``k`` field
    out of the JSON ``props`` string with ONE vectorized Arrow regex
    kernel per batch — no Python-level json.loads per row — then the
    partial+final grouped-sum pattern over (event_type)."""
    ds = table(sf_dir, "events", columns=["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t.column("props"), pattern=r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table({
            "event_type": t.column("event_type"),
            "k": k,
            "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        })

    parts = ds.map_batches(extract, batch_format="pyarrow", batch_size=8192)
    out = grouped_sums(parts, ["event_type"], ["k", "one"])
    res = pd.DataFrame({
        "event_type": out["event_type"],
        "sum_k": out["k_total"].astype(np.int64),
        "n_events": out["one_total"].astype(np.int64),
    })
    return res.sort_values("event_type", kind="stable").reset_index(drop=True)


_GROUPED_QS = [0.5, 0.95]


def event_value_quantiles_by_type(sf_dir: str) -> pd.DataFrame:
    """Grouped exact discrete quantiles (A2×A13: the distributed
    order-statistics path per group): p50/p95 of event value cents per
    event_type, via ONE grouped-histogram aggregate (fixed
    n_groups×n_bins count-matrix accumulator, per-group edges) and ONE
    combined refinement collect — no global or per-group sort."""
    from ..functions.stats import grouped_quantile_disc

    ds = table(sf_dir, "events", columns=["event_type", "value"])
    rows = ds.map_batches(
        lambda t: pa.table({
            "event_type": t.column("event_type"),
            "value_cents": pa.array(
                cents(t.column("value").to_numpy(zero_copy_only=False)), pa.int64()
            ),
        }),
        batch_format="pyarrow",
        batch_size=65536,
    )
    res = grouped_quantile_disc(rows, "event_type", "value_cents", _GROUPED_QS)
    recs = [
        {"event_type": k, "q": q, "value_cents": int(v)}
        for k in sorted(res) for q, v in zip(_GROUPED_QS, res[k])
    ]
    if not recs:  # empty input: typed zero-row frame, schema preserved
        return pd.DataFrame({
            "event_type": pd.Series(dtype=object),
            "q": pd.Series(dtype=np.float64),
            "value_cents": pd.Series(dtype=np.int64),
        })
    return pd.DataFrame(recs)


def approx_users_by_type(sf_dir: str) -> pd.DataFrame:
    """A17 grouped scale path: per-event_type HyperLogLog approximate
    distinct-user counts (functions/sketch.py approx_distinct_grouped)
    — constant-size register partials per (batch, group), merged by
    elementwise max; the full sketch is replicated per group in the
    DuckDB oracle so even the approximation is hash-checked."""
    from ..functions.sketch import approx_distinct_grouped

    ds = table(sf_dir, "events", columns=["event_type", "user_id"])
    est = approx_distinct_grouped(ds, "event_type", "user_id")
    return pd.DataFrame({
        "event_type": list(est),
        "approx_users": [int(round(v)) for v in est.values()],
    })


_WEEK_US = 7 * 24 * 3600 * 1_000_000


def user_retention(sf_dir: str) -> pd.DataFrame:
    """Cohort retention matrix (training-data-adjacent analytics op):
    users cohorted by the week of their FIRST event; for every
    (cohort_week, week_offset) cell, the count of distinct cohort
    users active that week.

    ONE shuffle: the ``__part`` user co-location pass. Because every
    user's rows land in one partition, the per-partition kernel
    computes first-seen, offsets, AND the distinct-user count exactly,
    emitting tiny (cohort, offset, partial_count) rows; a grouped sum
    merges them. Weeks are exact integer divisions of microsecond
    timestamps (epoch_us in the SQL twin), so no float-boundary
    drift."""
    ds = table(sf_dir, "events", columns=["user_id", "ts"])

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy().astype(np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        week = ts // _WEEK_US
        df = pd.DataFrame({"u": uid, "w": week})
        first = df.groupby("u", sort=False)["w"].transform("min")
        cells = pd.DataFrame({
            "cohort_week": first, "week_offset": df["w"] - first, "u": uid,
        }).drop_duplicates()
        out = (
            cells.groupby(["cohort_week", "week_offset"], as_index=False)
            .agg(part_users=("u", "size"))
        )
        out["part_users"] = out["part_users"].astype(np.int64)
        return out

    parts = _grouped_parts(
        ds, "user_id", per_part, n_parts=_table_parts(sf_dir, "events", "user_id")
    )
    out = grouped_sums(parts, ["cohort_week", "week_offset"], ["part_users"])
    res = pd.DataFrame({
        "cohort_week": out["cohort_week"].astype(np.int64),
        "week_offset": out["week_offset"].astype(np.int64),
        "n_users": out["part_users_total"].astype(np.int64),
    })
    return res


BULK_QTY = 48


def parts_never_bulk_ordered(sf_dir: str) -> pd.DataFrame:
    """J1 at large×large scale: parts with NO bulk lineitem
    (quantity >= BULK_QTY), via the shuffled anti join
    (util.hash_anti_semi_join) — the right side is filtered and
    key-deduplicated map-side, so the all-to-all moves part rows plus
    distinct bulk part keys only; no side is broadcast."""
    from .util import hash_anti_semi_join

    part = table(sf_dir, "part", columns=["p_partkey", "p_name"])
    li = table(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"])

    def bulk_keys(t: pa.Table) -> pa.Table:
        q = t.column("l_quantity").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(q >= BULK_QTY)).select(["l_partkey"])

    bulk = li.map_batches(bulk_keys, batch_format="pyarrow")
    from .util import ensure_columns

    out = ensure_columns(
        hash_anti_semi_join(
            part, bulk, "p_partkey", "l_partkey",
            n_parts=_table_parts(sf_dir, "part", "p_partkey", rows_per_part=25_000),
        ).to_pandas(),
        {"p_partkey": np.int64, "p_name": object},
    )
    return out.sort_values("p_partkey", kind="stable").reset_index(drop=True)


# ----------------------------------------------- composed multi-join
# pipelines (TPC-H Q3/Q10 shapes): several joins in ONE streaming
# pipeline, each join picked by side size — broadcast-under-cap for
# dimension-sized sides, hash co-group for fact×fact, and name/label
# attachment deferred to AFTER the top-k so the wide string columns
# only ever touch k rows.

SHIP_CUTOFF_S = 896_659_200  # 1998-06-01 UTC, epoch seconds

# Q10 final-sum crossover: when the MEASURED per-(join-partition,
# customer) partial row count (up to n_parts × n_cust — customer
# cardinality alone under-sizes it) stays under this cap, the narrow
# int rows collect to the driver (~50 MB at the cap) instead of paying
# a second all-to-all; above it the narrow hash co-group + per-block
# top-k takes over. Same split discipline as DUP_BROADCAST_CAP /
# SEG_BROADCAST_CAP.
Q10_DRIVER_CAP = 2_000_000
SEG_BROADCAST_CAP = 5_000_000  # same 40 MB/worker budget as NATION_BROADCAST_CAP


def _epoch_s(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """int64 epoch seconds (floor) of a timestamp column."""
    us = col.cast(pa.timestamp("us")).to_numpy(zero_copy_only=False).astype("datetime64[us]")
    return np.floor_divide(us.astype(np.int64), 1_000_000)


def shipping_priority(
    sf_dir: str,
    segment: str = "BUILDING",
    k: int = 10,
    broadcast_cap: int = SEG_BROADCAST_CAP,
) -> pd.DataFrame:
    """Q3 shape: BUILDING customers' orders placed before the cutoff,
    revenue from their lineitems shipped after it, top-k orders.

    Join plan (every step streams): (1) segment customers reduce to a
    KEY SET — broadcast `pc.is_in` under SEG_BROADCAST_CAP, hash
    semi-join above it (util.hash_anti_semi_join, the J2 scale path);
    (2) orders×lineitem is fact×fact → co-grouped hash_join on
    orderkey; (3) per-order revenue is a distributed groupby whose
    output stays a Dataset (one row per qualifying order never
    collects); (4) distributed sort + limit(k). Revenue is exact
    integer centi-cents: cents(extendedprice) × (100 − discount_pct),
    so the SQL twin matches bit-for-bit."""
    from .util import hash_anti_semi_join, hash_join, local_topk

    cust = table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    n_cust = _footer_rows(sf_dir, "customer", "c_custkey")
    if n_cust is None:
        n_cust = cust.count()
    orders = table(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )

    def project_orders(batch: pa.Table) -> pa.Table:
        d = _epoch_s(batch.column("o_orderdate"))
        keep = pa.array(d < SHIP_CUTOFF_S)
        t = pa.table({
            "o_orderkey": batch.column("o_orderkey"),
            "o_custkey": batch.column("o_custkey"),
            "o_date_s": pa.array(d, pa.int64()),
            "o_orderpriority": batch.column("o_orderpriority"),
        })
        return t.filter(keep)

    o_proj = orders.map_batches(project_orders, batch_format="pyarrow", batch_size=65536)

    def seg_filter(batch: pa.Table) -> pa.Table:
        return pa.table({"ck": batch.column("c_custkey").filter(
            pc.equal(batch.column("c_mktsegment"), segment)
        )})

    seg_keys_ds = cust.map_batches(seg_filter, batch_format="pyarrow")
    if n_cust > scale_cap("SEG_BROADCAST", broadcast_cap):
        o_f = hash_anti_semi_join(o_proj, seg_keys_ds, "o_custkey", "ck", semi=True)
    else:
        blocks = [b for b in ray.get(seg_keys_ds.to_arrow_refs()) if b.num_columns]
        keys = (
            pa.concat_tables(blocks).column("ck").combine_chunks()
            if blocks else pa.array([], pa.int64())  # 0-row customer table
        )
        keys_ref = ray.put(keys)

        def keep_seg(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.is_in(batch.column("o_custkey"), value_set=ray.get(keys_ref)))

        o_f = o_proj.map_batches(keep_seg, batch_format="pyarrow")

    line = table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def project_line(batch: pa.Table) -> pa.Table:
        ship = _epoch_s(batch.column("l_shipdate"))
        price_c = cents(batch.column("l_extendedprice").to_numpy(zero_copy_only=False))
        disc_pct = cents(batch.column("l_discount").to_numpy(zero_copy_only=False) * 100.0) // 100
        t = pa.table({
            "l_orderkey": batch.column("l_orderkey"),
            "rev_cc": pa.array(price_c * (100 - disc_pct), pa.int64()),
        })
        return t.filter(pa.array(ship > SHIP_CUTOFF_S))

    l_proj = line.map_batches(project_line, batch_format="pyarrow", batch_size=65536)

    # per-order aggregate runs INSIDE the join partition (group key ==
    # join key, so each partition holds every row of its orders —
    # exact, zero extra shuffle); top-k is per-block local top-k + one
    # tiny driver merge (util.local_topk) instead of a global sort
    def per_order(j: pa.Table) -> pa.Table:
        out = j.group_by("l_orderkey").aggregate(
            [("rev_cc", "sum"), ("o_date_s", "min"), ("o_orderpriority", "min")]
        )
        out = out.select(
            ["l_orderkey", "rev_cc_sum", "o_date_s_min", "o_orderpriority_min"]
        )
        return out.rename_columns(
            ["l_orderkey", "revenue_cc", "o_date_s", "o_orderpriority"]
        )

    per = hash_join(
        l_proj,
        o_f.map_batches(lambda t: t.drop_columns(["o_custkey"]), batch_format="pyarrow"),
        "l_orderkey", "o_orderkey", post=per_order,
        n_parts=_table_parts(sf_dir, "lineitem", "l_orderkey", rows_per_part=25_000),
        # post-UDF inputs are zero-BLOCK on a 0-row table; the explicit
        # projection schemas keep the join answerable (empty contract)
        l_schema=pa.schema([("l_orderkey", pa.int64()), ("rev_cc", pa.int64())]),
        r_schema=pa.schema([("o_orderkey", pa.int64()), ("o_date_s", pa.int64()),
                            ("o_orderpriority", pa.string())]),
    )

    top = local_topk(
        per, ["revenue_cc", "o_date_s", "l_orderkey"], [True, False, False], k
    ).to_pandas()
    for c in ("l_orderkey", "revenue_cc", "o_date_s"):
        top[c] = top[c].astype(np.int64)
    return top[["l_orderkey", "revenue_cc", "o_date_s", "o_orderpriority"]]


def returned_item_revenue(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Q10 shape: customers ranked by revenue of RETURNED lineitems.

    Join plan: lineitem(returnflag='R') projects to (orderkey, exact
    centi-cent revenue) map-side; fact×fact hash_join onto orders'
    (orderkey, custkey); distributed per-customer sum stays a Dataset;
    distributed sort + limit(k); and only THEN are the k winners'
    names/nations attached — the string side is a filtered `is_in`
    read of exactly k customer rows, so no wide column ever shuffles
    and no corpus-fraction broadcast exists on the hot path."""
    from .util import hash_grouped_sum, hash_join, local_topk

    line = table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )

    def project_line(batch: pa.Table) -> pa.Table:
        price_c = cents(batch.column("l_extendedprice").to_numpy(zero_copy_only=False))
        disc_pct = cents(batch.column("l_discount").to_numpy(zero_copy_only=False) * 100.0) // 100
        t = pa.table({
            "l_orderkey": batch.column("l_orderkey"),
            "rev_cc": pa.array(price_c * (100 - disc_pct), pa.int64()),
        })
        return t.filter(pc.equal(batch.column("l_returnflag"), "R"))

    l_proj = line.map_batches(project_line, batch_format="pyarrow", batch_size=65536)
    o_proj = table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    # the join partition pre-aggregates per customer (partial sums —
    # the aggregate key differs from the join key, so the partials
    # still need one merge on o_custkey). Below the cardinality cap
    # (customer count from the parquet footer) the ≤ n_parts×n_cust
    # narrow partial rows merge on the DRIVER (final_sum discipline —
    # saves the second all-to-all entirely); above it, one narrow hash
    # co-group + per-block top-k.
    def cust_partials(j: pa.Table) -> pa.Table:
        out = j.group_by("o_custkey").aggregate([("rev_cc", "sum"), ([], "count_all")])
        out = out.select(["o_custkey", "rev_cc_sum", "count_all"])
        return out.rename_columns(["o_custkey", "rev_cc_partial", "n_partial"])

    partials = hash_join(
        l_proj, o_proj, "l_orderkey", "o_orderkey", post=cust_partials,
        n_parts=_table_parts(sf_dir, "lineitem", "l_orderkey", rows_per_part=25_000),
        l_schema=pa.schema([("l_orderkey", pa.int64()), ("rev_cc", pa.int64())]),
    )
    # branch on the ACTUAL partial row count (one narrow row per
    # (join partition, customer) — up to n_parts × n_cust, so customer
    # cardinality alone under-sizes the collect); the materialize also
    # lets whichever branch runs reuse the executed join instead of
    # re-running it
    partials = partials.materialize()
    if partials.count() <= scale_cap("Q10_DRIVER", Q10_DRIVER_CAP):
        # narrow partials collect straight to the driver — no second
        # all-to-all at all
        from .util import ensure_columns

        pdf = ensure_columns(partials.to_pandas(),
                             {"o_custkey": np.int64, "rev_cc_partial": np.int64,
                              "n_partial": np.int64})
        per = (
            pdf.groupby("o_custkey", sort=False)["rev_cc_partial"].sum()
            .rename("revenue_cc").reset_index()
        )
        top = (
            per.sort_values(["revenue_cc", "o_custkey"], ascending=[False, True])
            .head(k)[["o_custkey", "revenue_cc"]].reset_index(drop=True)
        )
    else:
        per_cust = hash_grouped_sum(partials, ["o_custkey"], "rev_cc_partial", "revenue_cc")
        top = local_topk(
            per_cust, ["revenue_cc", "o_custkey"], [True, False], k
        ).to_pandas()
    top["o_custkey"] = top["o_custkey"].astype(np.int64)
    top["revenue_cc"] = top["revenue_cc"].astype(np.int64)

    # name attach AFTER top-k: k-row pruned read, tiny driver merge
    from .util import ensure_columns

    winners = pa.array(top["o_custkey"].to_numpy(), pa.int64())
    cust = ensure_columns(
        table(
            sf_dir, "customer", columns=["c_custkey", "c_name", "c_nationkey"]
        ).map_batches(
            lambda t: t.filter(pc.is_in(t.column("c_custkey"), value_set=winners)),
            batch_format="pyarrow",
        ).to_pandas(),
        {"c_custkey": np.int64, "c_name": object, "c_nationkey": np.int64},
    )
    nation = ensure_columns(
        table(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas(),
        {"n_nationkey": np.int64, "n_name": object},
    )
    out = top.merge(cust, left_on="o_custkey", right_on="c_custkey").merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    )
    out = out.rename(columns={"o_custkey": "c_custkey_out"})
    res = pd.DataFrame({
        "c_custkey": out["c_custkey_out"].astype(np.int64),
        "c_name": out["c_name"],
        "n_name": out["n_name"],
        "revenue_cc": out["revenue_cc"].astype(np.int64),
    })
    return res.sort_values(["revenue_cc", "c_custkey"], ascending=[False, True]).reset_index(drop=True)


HOP_S = 900
HOP_WINDOW_S = 3600


def hopping_window_stats(
    sf_dir: str, window_s: int = HOP_WINDOW_S, hop_s: int = HOP_S
) -> pd.DataFrame:
    """HOPPING-window aggregate (§2.9: the overlapping-window sibling
    of ``windowed_event_stats``'s tumbling windows): per (event_type,
    window_start) over sliding windows of ``window_s`` advancing every
    ``hop_s`` — each event belongs to window_s/hop_s windows.

    The replication happens MAP-SIDE inside the batch (np.repeat of
    the narrow projected columns, never the raw row), and the map-side
    combiner collapses it before the one narrow shuffle — the
    all-to-all carries per-(type, window) partials, not the xN row
    expansion."""
    assert window_s % hop_s == 0
    fan = window_s // hop_s
    ds = table(sf_dir, "events", columns=["event_type", "ts", "value"])

    def add_windows(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        base = ts // (hop_s * 1_000_000)
        ks = np.arange(fan, dtype=np.int64)
        ws = ((base[:, None] - ks[None, :]) * hop_s).reshape(-1)
        v = cents(batch.column("value").to_numpy(zero_copy_only=False))
        et = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
        return pa.table({
            "event_type": pa.array(np.repeat(et, fan)),
            "window_start_s": pa.array(ws, pa.int64()),
            "value_c": pa.array(np.repeat(v, fan), pa.int64()),
        })

    rows = ds.map_batches(add_windows, batch_format="pyarrow", batch_size=65536)
    out = grouped_sums(rows, ["event_type", "window_start_s"], ["value_c"])
    out = out.rename(columns={"value_c_total": "value_cents", "n_total": "n_events"})
    out["n_events"] = out["n_events"].astype(np.int64)
    out["value_cents"] = out["value_cents"].astype(np.int64)
    return out[["event_type", "window_start_s", "n_events", "value_cents"]]


WEIGHTED_K = 50


def weighted_sample_docs(sf_dir: str, k: int = WEIGHTED_K) -> pd.DataFrame:
    """Deterministic WEIGHTED sampling without replacement
    (Efraimidis–Spirakis A-Res, the public construction): doc i gets
    priority u_i^(1/w_i) with u_i = fnv1a64(doc_id)/2^64 and weight
    w_i = n_chars; the k highest priorities are the sample, so longer
    documents are proportionally more likely, yet the result is a pure
    function of the ids (order/partition/batch independent — same
    min-wise-hash discipline as ``deterministic_sample``).

    Per batch: one vectorized hash + log, LOCAL top-k partial (≤ k
    rows leave each batch), tiny driver merge. Ordering happens on
    log(u)/w, monotone in u^(1/w); the SQL twin computes the same
    double expression."""
    from ..kernels.text import fnv1a_64_ints

    ds = table(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.float64)
        u = fnv1a_64_ints(ids).astype(np.float64) / 18446744073709551616.0
        with np.errstate(divide="ignore"):
            key = np.log(u) / w
        kk = min(k, ids.size)
        top = np.argpartition(-key, kk - 1)[:kk] if ids.size > kk else np.arange(ids.size)
        return pa.table({
            "doc_id": pa.array(ids[top], pa.int64()),
            "n_chars": pa.array(w[top].astype(np.int64), pa.int64()),
            "key": pa.array(key[top], pa.float64()),
        })

    from .util import ensure_columns

    parts = ensure_columns(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=8192).to_pandas(),
        {"doc_id": np.int64, "n_chars": np.int64, "key": np.float64},
    )
    parts = parts.sort_values(["key", "doc_id"], ascending=[False, True], kind="stable")
    out = parts.head(k).reset_index(drop=True)
    return out[["doc_id", "n_chars"]].astype(np.int64)
