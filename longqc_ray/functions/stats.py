"""Distributed order statistics: NXX (N50), histograms.

`get_N50`/`get_NXX` in the reference sort the whole length vector
descending and scan the cumulative sum (/root/reference/
lq_utils.py:33-53) — fine for 10^4 sampled reads, not for 10^12 rows.
The scale path here is a 2-pass exact histogram refinement
(SURVEY.md §2.5 A2), arranged so the UPSTREAM pipeline executes
exactly once:

1. the projected column is materialized as narrow Arrow blocks (the
   only re-readable state; at full scale this spills to the object
   store, which is exactly what a shuffle of the same column would
   hold anyway);
2. ONE fused aggregate computes min+max+count;
3. per-batch weighted-histogram partials are merged by a small
   grouped sum;
4. all crossing bins are refined with ONE combined filtered collect
   (~n_crossing_bins * n/n_bins rows), never a global sort.

Float hygiene: the top histogram edge is ``np.nextafter(hi, inf)``
(not ``hi + 1e-9``, a no-op once |hi| >= ~2e9), so max-valued rows
fall inside the last half-open bin for BOTH np.histogram and the
``pc.less`` refinement filter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def weighted_histogram(
    ds: rd.Dataset, col: str, lo: float, hi: float, n_bins: int = 4096
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(bin_edges, count_per_bin, value_sum_per_bin) — an exact
    mergeable sketch expressed as ONE custom ``AggregateFn`` whose
    accumulator is the fixed-size (cnt, wsum) bin-vector pair (~64 KiB):
    per-block numpy histograms combine inside tasks and merge pairwise,
    so there is NO per-bin groupby shuffle at all (the previous shape
    paid an AllToAll sort of n_blocks×n_bins partial rows). ``hi`` must
    already be an exclusive upper edge (strictly greater than the
    column max)."""
    from ray.data.aggregate import AggregateFn

    edges = np.linspace(lo, hi, n_bins + 1)

    # accumulators that cross task boundaries round-trip through Arrow
    # and come back as Python LISTS — coerce before every `+`, else
    # list concatenation silently corrupts the merge
    def _pair(a) -> tuple[np.ndarray, np.ndarray]:
        return (np.asarray(a[0], dtype=np.int64), np.asarray(a[1], dtype=np.float64))

    def acc_block(a, block) -> tuple[np.ndarray, np.ndarray]:
        if isinstance(block, pa.Table):
            v = block.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        else:  # pandas block
            v = block[col].to_numpy().astype(np.float64)
        cnt, _ = np.histogram(v, bins=edges)
        wsum, _ = np.histogram(v, bins=edges, weights=v)
        a = _pair(a)
        return (a[0] + cnt, a[1] + wsum)

    fn = AggregateFn(
        init=lambda k: (np.zeros(n_bins, dtype=np.int64), np.zeros(n_bins)),
        merge=lambda a, b: (_pair(a)[0] + _pair(b)[0], _pair(a)[1] + _pair(b)[1]),
        accumulate_block=acc_block,
        name="whist",
    )
    # the result round-trips through an Arrow block → arrays come back
    # as Python lists; coerce to numpy
    res = ds.select_columns([col]).aggregate(fn)["whist"]
    return edges, np.asarray(res[0], dtype=np.int64), np.asarray(res[1], dtype=np.float64)


def _narrow_stats(ds: rd.Dataset, col: str) -> tuple[rd.Dataset, float, float, int]:
    """Project to the single needed column, materialize ONCE, and run
    one fused Min+Max+Count aggregate over the materialized blocks.
    Every later pass (histogram, refinement collect) re-reads these
    narrow blocks instead of re-executing the upstream pipeline."""
    from ray.data.aggregate import Count, Max, Min

    stats = ds.select_columns([col]).materialize()
    agg = stats.aggregate(Min(col), Max(col), Count())
    n = int(agg["count()"])
    if n == 0:
        return stats, float("nan"), float("nan"), 0
    return stats, float(agg[f"min({col})"]), float(agg[f"max({col})"]), n


def _collect_bins(
    stats: rd.Dataset, col: str, edges: np.ndarray, bins: list[int]
) -> dict[int, np.ndarray]:
    """ONE filtered collect for ALL crossing bins: the filter is the
    union of the bins' half-open intervals; rows are re-bucketed
    driver-side (the collect is ~len(bins) * n/n_bins rows)."""
    import pyarrow.compute as pc

    intervals = [(float(edges[b]), float(edges[b + 1])) for b in bins]

    def flt(t: pa.Table, intervals=tuple(intervals)) -> pa.Table:
        v = t.column(col)
        m = None
        for blo, bhi in intervals:
            c = pc.and_(pc.greater_equal(v, blo), pc.less(v, bhi))
            m = c if m is None else pc.or_(m, c)
        return t.filter(m)

    vals = (
        stats.map_batches(flt, batch_format="pyarrow").to_pandas()[col].values.astype(np.float64)
    )
    out: dict[int, np.ndarray] = {}
    for b, (blo, bhi) in zip(bins, intervals):
        out[b] = np.sort(vals[(vals >= blo) & (vals < bhi)])
    return out


def nxx(
    ds: rd.Dataset,
    col: str,
    frac: float = 0.5,
    n_bins: int = 4096,
    prior_stats: tuple[float, float, int] | None = None,
) -> float:
    """Exact NXX: smallest value v such that the sum of all values >= v
    is >= frac * total (the reference's N50 definition, lq_utils.py:33-53).

    ``prior_stats`` = (min, max, count) lets a caller that already
    knows the column range (e.g. from parquet footer statistics —
    ``util.parquet_column_stats``) skip the min/max/count execution.
    """
    if prior_stats is not None:
        lo, hi, n = prior_stats
        stats = ds.select_columns([col]).materialize()
    else:
        stats, lo, hi, n = _narrow_stats(ds, col)
    if n == 0:
        return float("nan")
    if lo == hi:
        return lo
    edges, cnt, wsum = weighted_histogram(
        stats, col, lo, float(np.nextafter(hi, np.inf)), n_bins
    )
    total = wsum.sum()
    target = frac * total
    # cumulative from the top bin down
    cum_above = np.concatenate([np.cumsum(wsum[::-1])[::-1][1:], [0.0]])
    # first bin (from top) where cum including this bin crosses target
    crossing = None
    for b in range(len(cnt) - 1, -1, -1):
        if cum_above[b] + wsum[b] >= target:
            crossing = b
            break
    if crossing is None:
        return lo
    vals = _collect_bins(stats, col, edges, [crossing])[crossing][::-1]
    cum = cum_above[crossing] + np.cumsum(vals)
    idx = int(np.searchsorted(cum, target))
    idx = min(idx, len(vals) - 1)
    return float(vals[idx])


def quantile_disc(ds: rd.Dataset, col: str, qs: list[float], n_bins: int = 4096) -> list[float]:
    """Exact discrete quantiles at 10^12-row scale: for each q, the
    value at 0-based ascending index ceil(q*n)-1 — DuckDB
    ``quantile_disc`` / numpy ``inverted_cdf`` semantics, verified
    empirically (tests/test_functions.py).

    Same single-upstream-execution shape as ``nxx`` (SURVEY.md §2.5
    A2): fused min/max/count over the materialized narrow column, one
    histogram pass, then ONE combined filtered collect covering every
    distinct crossing bin.
    """
    stats, lo, hi, n = _narrow_stats(ds, col)
    if n == 0:
        return [float("nan")] * len(qs)
    if lo == hi:
        return [lo] * len(qs)
    edges, cnt, _ = weighted_histogram(
        stats, col, lo, float(np.nextafter(hi, np.inf)), n_bins
    )
    cumcnt = np.cumsum(cnt)
    # 0-based target rank per q; group targets by crossing bin
    ranks = [min(max(int(np.ceil(q * n)) - 1, 0), n - 1) for q in qs]
    bins = sorted({int(np.searchsorted(cumcnt, r + 1)) for r in ranks})
    bin_vals = _collect_bins(stats, col, edges, bins)
    out = []
    for r in ranks:
        b = int(np.searchsorted(cumcnt, r + 1))
        below = int(cumcnt[b - 1]) if b > 0 else 0
        out.append(float(bin_vals[b][r - below]))
    return out


def nxx_exact_local(values: np.ndarray, frac: float = 0.5) -> float:
    """Reference-faithful local twin (sort desc + cumsum scan), used by
    tests to pin ``nxx`` — mirrors lq_utils.py:33-53."""
    a = np.sort(np.asarray(values, dtype=np.float64))[::-1]
    cum = np.cumsum(a)
    idx = int(np.searchsorted(cum, frac * cum[-1]))
    return float(a[min(idx, len(a) - 1)])


# group count above which the dense histogram accumulator (n_groups ×
# n_bins int64 — 10k × 1024 = 80 MB PER accumulator copy) stops being
# shippable per block and grouped_quantile_disc switches to the
# hash-partitioned exact path (all rows of a key co-located, one
# lexsort per partition). Same measured-crossover discipline as
# DUP_BROADCAST_CAP / LP_MIN_PAIRS.
GQ_DENSE_MAX_GROUPS = 10_000


def _np_lerp(vlo: np.ndarray, vhi: np.ndarray, t: np.ndarray) -> np.ndarray:
    """numpy's ``_lerp`` exactly (the t >= 0.5 branch flips to
    ``b - diff*(1-t)`` for symmetry/stability), so the "cont" quantile
    method below is BIT-EQUAL to ``np.quantile(..., method='linear')``
    — pinned in tests."""
    vlo = np.asarray(vlo, dtype=np.float64)
    vhi = np.asarray(vhi, dtype=np.float64)
    t = np.asarray(t, dtype=np.float64)
    diff = vhi - vlo
    return np.where(t >= 0.5, vhi - diff * (1.0 - t), vlo + diff * t)


def _grouped_quantile_partitioned(
    stats: rd.Dataset,
    key: str,
    col: str,
    qs: list[float],
    n_parts: int = 64,
    method: str = "disc",
) -> tuple[dict, dict]:
    """High-cardinality fallback: hash-partition by ``key`` (co-group),
    then per partition ONE factorize + lexsort answers every group's
    quantiles exactly — per-partition memory is O(partition rows), not
    O(n_groups × n_bins). Shuffles only the narrow (key, col)
    projection; the driver sees one result row per group (the dict
    return is O(n_groups) by contract either way)."""
    import pandas as pd
    import pyarrow as pa

    from ..pipelines.util import _part_hash

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__part", pa.array(_part_hash(t, key, n_parts), pa.int64())
        )

    qs_arr = np.asarray(qs, dtype=np.float64)

    def per_part(g: pa.Table) -> pa.Table:
        kv = np.asarray(g.column(key).to_pylist(), dtype=object)
        # NATIVE dtype throughout: an int64 column cast to float64
        # would mis-order values ≥ 2^53 in the lexsort and accumulate
        # float sums where the dense path (Ray Sum) returns exact ints
        # — the two paths must agree bit-for-bit across the
        # max_dense_groups switch (pinned in tests)
        v = g.column(col).to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(kv)
        order = np.lexsort((v, codes))
        c2, v2 = codes[order], v[order]
        starts = np.nonzero(np.concatenate([[True], c2[1:] != c2[:-1]]))[0]
        counts = np.diff(np.append(starts, c2.size))
        sums = np.add.reduceat(v2, starts)
        data: dict = {
            "k": pa.array(uniq[c2[starts]].tolist()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
            "s": pa.array(sums),
        }
        for j, q in enumerate(qs_arr):
            if method == "cont":
                # all rows of a group are in this partition, so the
                # linear-interpolated quantile is exact here: two
                # order statistics + numpy's own lerp
                h = q * (counts - 1).astype(np.float64)
                lo = np.floor(h).astype(np.int64)
                hi = np.minimum(lo + 1, counts - 1)
                data[f"q{j}"] = pa.array(
                    _np_lerp(v2[starts + lo], v2[starts + hi], h - lo),
                    pa.float64(),
                )
            else:
                r = np.clip(np.ceil(q * counts).astype(np.int64) - 1, 0, counts - 1)
                data[f"q{j}"] = pa.array(v2[starts + r])
        return pa.table(data)

    rows = (
        stats.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(per_part, batch_format="pyarrow")
        .to_pandas()
    )
    out: dict = {}
    gstats: dict = {}
    for _, row in rows.iterrows():
        out[row["k"]] = [float(row[f"q{j}"]) for j in range(len(qs))]
        # keep the sum in its NATIVE dtype: the dense path (Ray Sum)
        # returns exact int64 sums for int columns, and a float() here
        # would lose exactness past 2^53 — the paths must agree
        # bit-for-bit across the max_dense_groups switch
        s = row["s"]
        s = int(s) if isinstance(s, (int, np.integer)) else float(s)
        gstats[row["k"]] = (int(row["n"]), s)
    return out, gstats


def grouped_quantile_disc(
    ds: rd.Dataset,
    key: str,
    col: str,
    qs: list[float],
    n_bins: int = 1024,
    with_stats: bool = False,
    max_dense_groups: int = GQ_DENSE_MAX_GROUPS,
    method: str = "disc",
    prematerialized: bool = False,
) -> dict | tuple[dict, dict]:
    """Per-GROUP exact discrete quantiles, same scale shape as
    ``quantile_disc`` (A2/A13 grouped): materialize the narrow
    (key, col) projection once, ONE fused per-group min/max/count,
    ONE histogram aggregate whose accumulator is a fixed
    (n_groups × n_bins) count matrix with PER-GROUP edges, then ONE
    combined filtered collect for every (group, crossing-bin) pair.

    The dense matrix is for bounded-cardinality keys (n_groups ×
    n_bins × 8 bytes per accumulator copy); above ``max_dense_groups``
    the call switches to ``_grouped_quantile_partitioned`` (hash
    co-group + per-partition lexsort — exact, O(partition) memory;
    equality with the dense path pinned in tests). Returns
    {group_value: [quantile per q]}; with ``with_stats`` also a second
    dict {group_value: (count, sum)} from the same fused per-group
    aggregate, so callers needing count/mean alongside the quantiles
    (e.g. the A13 binned profile) pay no extra pass.

    ``method="disc"`` (default) returns exact discrete order
    statistics at rank ceil(q*n)-1 (DuckDB ``quantile_disc``);
    ``method="cont"`` returns linear-interpolated quantiles BIT-EQUAL
    to ``np.quantile(..., method='linear')`` — it fetches the two
    bracketing order statistics through the same refinement collect
    and applies numpy's own lerp (``_np_lerp``)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import AggregateFn, Count, Max, Min, Sum

    # ``prematerialized``: the caller already materialized a narrow
    # projection containing (key, col) — re-materializing here would
    # hold a second near-identical object-store copy; the lazy
    # select_columns re-runs only the (cheap) projection per consumer
    stats = ds.select_columns([key, col])
    if not prematerialized:
        stats = stats.materialize()
    g = stats.groupby(key).aggregate(Min(col), Max(col), Count(), Sum(col)).to_pandas()
    if g.empty:  # empty input: zero groups, zero quantiles
        return ({}, {}) if with_stats else {}
    from ..pipelines.util import scale_cap

    if len(g) > scale_cap("GQ_DENSE_MAX_GROUPS", max_dense_groups):
        out, gstats = _grouped_quantile_partitioned(stats, key, col, qs, method=method)
        return (out, gstats) if with_stats else out
    keys = g[key].tolist()
    n_keys = len(keys)
    kidx = {k: i for i, k in enumerate(keys)}
    los = g[f"min({col})"].to_numpy().astype(np.float64)
    his = g[f"max({col})"].to_numpy().astype(np.float64)
    ns = g["count()"].to_numpy().astype(np.int64)
    sums = g[f"sum({col})"].to_numpy()
    gstats = {k: (int(ns[i]), sums[i]) for i, k in enumerate(keys)}
    flat = los == his  # degenerate groups: answer is lo for every q

    def _done(res: dict):
        return (res, gstats) if with_stats else res

    if bool(flat.all()):
        # every group degenerate (min==max): all answers come from the
        # per-group min — skip the histogram AND the refinement collect
        # (an empty refinement interval list would otherwise build a
        # None filter mask).
        return _done({k: [float(los[i])] * len(qs) for i, k in enumerate(keys)})
    # per-group bin edges; degenerate groups get dummy [0,1) edges and
    # are excluded from the histogram and the refinement entirely
    lo_e = np.where(flat, 0.0, los)
    hi_e = np.where(flat, 1.0, np.nextafter(his, np.inf))
    edges = np.linspace(lo_e, hi_e, n_bins + 1, axis=1)  # (n_keys, n_bins+1)

    def _mat(a) -> np.ndarray:
        return np.asarray(a, dtype=np.int64).reshape(n_keys, n_bins)

    def acc_block(a, block) -> np.ndarray:
        m = _mat(a).copy()
        if isinstance(block, pa.Table):
            kv = block.column(key).to_pylist()
            v = block.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        else:
            kv = block[key].tolist()
            v = block[col].to_numpy().astype(np.float64)
        import pandas as pd

        codes, uniq = pd.factorize(np.asarray(kv, dtype=object))
        for j, k in enumerate(uniq):
            i = kidx.get(k)
            if i is None or flat[i]:
                continue
            cnt, _ = np.histogram(v[codes == j], bins=edges[i])
            m[i] += cnt
        return m

    agg = AggregateFn(
        init=lambda _: np.zeros(n_keys * n_bins, dtype=np.int64),
        accumulate_block=acc_block,
        merge=lambda a, b: _mat(a) + _mat(b),
        name="gq_hist",
    )
    mat = _mat(stats.aggregate(agg)["gq_hist"])

    # (group, q) -> target rank(s) -> crossing bin(s); batch ALL
    # refinement intervals into one filtered collect. "disc" needs one
    # rank per (group, q); "cont" needs the two bracketing order
    # statistics lo=floor(h), hi=min(lo+1, n-1) at h = q*(n-1), plus
    # the interpolation weight t = h - lo.
    cum = np.cumsum(mat, axis=1)
    need: dict[int, set[int]] = {}
    ranks: dict[tuple[int, int], tuple[int, int, float]] = {}
    for i in range(n_keys):
        if flat[i]:
            continue
        for j, q in enumerate(qs):
            if method == "cont":
                h = q * (int(ns[i]) - 1)
                lo = int(np.floor(h))
                hi = min(lo + 1, int(ns[i]) - 1)
                ranks[(i, j)] = (lo, hi, float(h - lo))
            else:
                r = min(max(int(np.ceil(q * ns[i])) - 1, 0), int(ns[i]) - 1)
                ranks[(i, j)] = (r, r, 0.0)
            for r in set(ranks[(i, j)][:2]):
                b = int(np.searchsorted(cum[i], r + 1))
                need.setdefault(i, set()).add(b)

    intervals = [
        (keys[i], float(edges[i][b]), float(edges[i][b + 1]), i, b)
        for i in sorted(need)
        for b in sorted(need[i])
    ]

    def flt(t: pa.Table) -> pa.Table:
        tk, tv = t.column(key), t.column(col)
        m = None
        for k, blo, bhi, _, _ in intervals:
            c = pc.and_(pc.equal(tk, k),
                        pc.and_(pc.greater_equal(tv, blo), pc.less(tv, bhi)))
            m = c if m is None else pc.or_(m, c)
        return t.filter(m)

    coll = stats.map_batches(flt, batch_format="pyarrow").to_pandas()
    kcol = coll[key].to_numpy(dtype=object)
    vcol = coll[col].to_numpy().astype(np.float64)
    bin_vals: dict[tuple[int, int], np.ndarray] = {}
    for k, blo, bhi, i, b in intervals:
        bin_vals[(i, b)] = np.sort(vcol[(kcol == k) & (vcol >= blo) & (vcol < bhi)])

    out: dict = {}
    for i, k in enumerate(keys):
        if flat[i]:
            out[k] = [float(los[i])] * len(qs)
            continue
        def _at(r: int) -> float:
            b = int(np.searchsorted(cum[i], r + 1))
            below = int(cum[i][b - 1]) if b > 0 else 0
            return float(bin_vals[(i, b)][r - below])

        vals = []
        for j in range(len(qs)):
            lo, hi, t = ranks[(i, j)]
            if method == "cont":
                vals.append(float(_np_lerp(_at(lo), _at(hi), t)))
            else:
                vals.append(_at(lo))
        out[k] = vals
    return _done(out)
