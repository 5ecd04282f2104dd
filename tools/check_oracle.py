"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry and, where an ``oracle_sql()`` twin
exists, compares against DuckDB on the same parquet tables:
row count + schema (sorted column names) + order-insensitive values
(rows sorted by all columns; floats compared exactly after a
round-trip through float64).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            continue
        if np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype(np.float64)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, ours: pd.DataFrame, theirs: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ours.columns) != sorted(theirs.columns):
        problems.append(f"schema: ray={sorted(ours.columns)} sql={sorted(theirs.columns)}")
        return problems
    if len(ours) != len(theirs):
        problems.append(f"rowcount: ray={len(ours)} sql={len(theirs)}")
        return problems
    a, b = canon(ours), canon(theirs)
    for c in a.columns:
        if str(a[c].dtype) != str(b[c].dtype):
            problems.append(f"dtype[{c}]: ray={a[c].dtype} sql={b[c].dtype}")
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(a[c].dtype, np.floating):
            neq = ~(np.isclose(av, bv, rtol=0, atol=0) | (np.isnan(av) & np.isnan(bv)))
            exact = (av == bv) | (np.isnan(av) & np.isnan(bv))
            if not exact.all():
                i = int(np.nonzero(~exact)[0][0])
                problems.append(
                    f"values[{c}]: {int((~exact).sum())} differ; first row {i}: "
                    f"ray={av[i]!r} sql={bv[i]!r} (neq-strict={int(neq.sum())})"
                )
        else:
            eq = av == bv
            if not np.asarray(eq).all():
                i = int(np.nonzero(~np.asarray(eq))[0][0])
                problems.append(
                    f"values[{c}]: {int((~np.asarray(eq)).sum())} differ; first row {i}: "
                    f"ray={av[i]!r} sql={bv[i]!r}"
                )
    return problems


def run_checks(sf_dir: str, only: set[str] | None = None, verbose: bool = True) -> dict[str, list[str]]:
    """Run all query/oracle pairs; returns {name: problem list} (empty
    list = pass / rows-only ok). Assumes Ray is already initialised."""
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    results: dict[str, list[str]] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ours = to_pandas(fn(sf_dir))
        except Exception:
            results[name] = [f"query raised:\n{traceback.format_exc()}"]
            if verbose:
                print(f"FAIL {name}: {results[name][0]}")
            continue
        dt = time.time() - t0
        if name not in sqls:
            results[name] = []
            if verbose:
                print(f"ok   {name}: rows={len(ours)} cols={sorted(ours.columns)} ({dt:.1f}s, rows-only)")
            continue
        try:
            theirs = con.sql(sqls[name]).df()
        except Exception:
            results[name] = [f"oracle SQL raised:\n{traceback.format_exc()}"]
            if verbose:
                print(f"FAIL {name}: {results[name][0]}")
            continue
        problems = compare(name, ours, theirs)
        results[name] = problems
        if verbose:
            if problems:
                print(f"FAIL {name} ({dt:.1f}s):")
                for p in problems:
                    print(f"     {p}")
            else:
                print(f"PASS {name}: rows={len(ours)} ({dt:.1f}s)")
    return results


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    results = run_checks(sf_dir, only or None)
    ray.shutdown()
    return 1 if any(v for v in results.values()) else 0


if __name__ == "__main__":
    sys.exit(main())
