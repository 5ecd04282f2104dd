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

import hashlib
import os

import numpy as np
import pyarrow as pa
import ray.data as rd


def table(sf_dir: str, name: str, columns: list[str] | None = None) -> rd.Dataset:
    """Column-pruned parquet read of one driver table."""
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


WIDE_BLOCK_BYTES = 16 * 2**20  # ~16 MiB blocks for wide binary rows


def read_wide_parquet(files: list[str], columns: list[str] | None = None) -> rd.Dataset:
    """Parquet read tuned for WIDE rows (multi-KB binary payloads).

    Ray's default read planning hands out ~128 MiB blocks; for
    payload-heavy tables that serializes long single-block copies and
    starves the downstream actor pool (measured 9× on the 60k-clip
    bench: 326 → 2990 clips/s). Target ~16 MiB blocks instead by
    asking for ceil(total_bytes / 16 MiB) read tasks — at cluster
    scale this is the same rule, derived from dataset size, not node
    count."""
    total = sum(os.path.getsize(f) for f in files)
    n_blocks = max(len(files), int(np.ceil(total / WIDE_BLOCK_BYTES)))
    return rd.read_parquet(files, columns=columns, override_num_blocks=n_blocks)


def md5_hex(values: list[str]) -> list[str]:
    return [hashlib.md5(v.encode("utf-8", "replace")).hexdigest() for v in values]


def cents(x: np.ndarray) -> np.ndarray:
    """Per-row money → exact int64 cents; both engines round the same
    double, so downstream integer sums match exactly in any order.

    Half-away-from-zero (DuckDB ``round`` semantics), NOT numpy's
    banker's rounding — x.5 cents occur for real (price×(1−disc))."""
    v = np.asarray(x, dtype=np.float64) * 100.0
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)


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


def final_sum(ds: rd.Dataset, keys: list[str], sum_cols: list[str]) -> "pd.DataFrame":  # noqa: F821
    """Final aggregate over the tiny partials; returns pandas (small)."""
    from ray.data.aggregate import Sum

    aggs = [Sum(f"{c}_partial", alias_name=f"{c}_total") for c in sum_cols]
    aggs.append(Sum("n_partial", alias_name="n_total"))
    return ds.groupby(keys).aggregate(*aggs).to_pandas()


def grouped_sums(
    ds: rd.Dataset, keys: list[str], sum_cols: list[str], batch_size: int = 8192
) -> "pd.DataFrame":  # noqa: F821
    """map_batches partial groupby → final groupby (the only shuffle)."""
    parts = ds.map_batches(
        preagg_sum(keys, sum_cols), batch_format="pyarrow", batch_size=batch_size
    )
    return final_sum(parts, keys, sum_cols)
