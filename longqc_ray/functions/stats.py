"""Distributed order statistics: NXX (N50), histograms.

`get_N50`/`get_NXX` in the reference sort the whole length vector
descending and scan the cumulative sum (/root/reference/
lq_utils.py:33-53) — fine for 10^4 sampled reads, not for 10^12 rows.
The scale path here is a 2-pass exact histogram refinement
(SURVEY.md §2.5 A2): pass 1 aggregates min/max/total; pass 2 builds a
weighted histogram (per-batch partials, merged on the driver — tiny);
the crossing bin is then refined exactly with a filtered collect of
only that bin's rows (~n/n_bins rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def weighted_histogram(
    ds: rd.Dataset, col: str, lo: float, hi: float, n_bins: int = 4096
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(bin_edges, count_per_bin, value_sum_per_bin) — exact partials
    computed per batch, merged driver-side (mergeable-sketch pattern)."""
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


def nxx(ds: rd.Dataset, col: str, frac: float = 0.5, n_bins: int = 4096) -> float:
    """Exact NXX: smallest value v such that the sum of all values >= v
    is >= frac * total (the reference's N50 definition, lq_utils.py:33-53).
    """
    stats = ds.select_columns([col])
    lo = float(stats.min(col))
    hi = float(stats.max(col))
    if lo == hi:
        return lo
    edges, cnt, wsum = weighted_histogram(stats, col, lo, hi + 1e-9, n_bins)
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
    # exact refinement: collect only the crossing bin's rows
    blo, bhi = edges[crossing], edges[crossing + 1]
    import pyarrow.compute as pc

    vals = np.sort(
        stats.map_batches(
            lambda t: t.filter(
                pc.and_(pc.greater_equal(t.column(col), blo), pc.less(t.column(col), bhi))
            ),
            batch_format="pyarrow",
        )
        .to_pandas()[col]
        .values
    )[::-1]
    cum = cum_above[crossing] + np.cumsum(vals.astype(np.float64))
    idx = int(np.searchsorted(cum, target))
    idx = min(idx, len(vals) - 1)
    return float(vals[idx])


def quantile_disc(ds: rd.Dataset, col: str, qs: list[float], n_bins: int = 4096) -> list[float]:
    """Exact discrete quantiles at 10^12-row scale: for each q, the
    value at 0-based ascending index ceil(q*n)-1 — DuckDB
    ``quantile_disc`` / numpy ``inverted_cdf`` semantics, verified
    empirically (tests/test_functions.py).

    Same 2-pass shape as ``nxx`` (SURVEY.md §2.5 A2): pass 1 histogram
    partials merged driver-side; pass 2 one filtered collect per
    DISTINCT crossing bin (~n/n_bins rows each), never a global sort.
    """
    stats = ds.select_columns([col])
    n = stats.count()
    if n == 0:
        return [float("nan")] * len(qs)
    lo = float(stats.min(col))
    hi = float(stats.max(col))
    if lo == hi:
        return [lo] * len(qs)
    edges, cnt, _ = weighted_histogram(stats, col, lo, hi + 1e-9, n_bins)
    cumcnt = np.cumsum(cnt)
    # 0-based target rank per q; group targets by crossing bin
    ranks = [min(max(int(np.ceil(q * n)) - 1, 0), n - 1) for q in qs]
    bins = {int(np.searchsorted(cumcnt, r + 1)) for r in ranks}
    import pyarrow.compute as pc

    bin_vals: dict[int, np.ndarray] = {}
    for b in bins:
        blo, bhi = edges[b], edges[b + 1]
        vals = (
            stats.map_batches(
                lambda t, blo=blo, bhi=bhi: t.filter(
                    pc.and_(pc.greater_equal(t.column(col), blo), pc.less(t.column(col), bhi))
                ),
                batch_format="pyarrow",
            )
            .to_pandas()[col]
            .values
        )
        bin_vals[b] = np.sort(vals)
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
