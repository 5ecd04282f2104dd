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
    """(bin_edges, count_per_bin, value_sum_per_bin) — exact partials
    computed per batch, merged by a tiny grouped sum (mergeable-sketch
    pattern). ``hi`` must already be an exclusive upper edge
    (strictly greater than the column max)."""
    edges = np.linspace(lo, hi, n_bins + 1)

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        cnt, _ = np.histogram(v, bins=edges)
        wsum, _ = np.histogram(v, bins=edges, weights=v)
        return pa.table(
            {
                "bin": pa.array(np.arange(n_bins), pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
                "wsum": pa.array(wsum, pa.float64()),
            }
        )

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    )
    from ray.data.aggregate import Sum

    agg = parts.groupby("bin").aggregate(Sum("cnt", alias_name="cnt"), Sum("wsum", alias_name="wsum")).to_pandas()
    cnt = np.zeros(n_bins, dtype=np.int64)
    wsum = np.zeros(n_bins)
    cnt[agg["bin"].values] = agg["cnt"].values
    wsum[agg["bin"].values] = agg["wsum"].values
    return edges, cnt, wsum


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


def nxx(ds: rd.Dataset, col: str, frac: float = 0.5, n_bins: int = 4096) -> float:
    """Exact NXX: smallest value v such that the sum of all values >= v
    is >= frac * total (the reference's N50 definition, lq_utils.py:33-53).
    """
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
