"""Deterministic sampling.

The reference's reservoir (lq_utils.py:371-411) reseeds
``np.random.seed(7)`` per chunk, so its output depends on chunk
boundaries (= the -m memory setting) — a portability bug we do NOT
replicate (SURVEY.md §7.3 item 1). The engine's canonical sampler is
**min-wise / bottom-k hash sampling**: per-row priority =
FNV-1a(key)/2^64; the sample is the n rows with the smallest
priorities. That is order-independent, chunk-independent,
deterministic, and trivially distributed (per-batch partial bottom-k →
tiny driver merge), and it honors exclusion lists the way the
reference's ``elist`` does (lq_utils.py:393-395).

``reservoir_reference`` is the faithful local twin of the reference
algorithm for parity tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..kernels.text import fnv1a_64_strs


def hash_priority(keys: list[str]) -> np.ndarray:
    """uint64 priority per key — batch-vectorized FNV-1a via the
    length-aware padded-matrix kernel (bit-equal to the old per-row
    ``fnv1a_64(k.encode())`` loop, which cost O(len) Python byte ops
    per key on EVERY full-input pass of ``bottomk_sample``)."""
    return fnv1a_64_strs(keys)


def bottomk_sample(
    ds: rd.Dataset,
    key_col: str,
    n: int,
    exclude: frozenset[str] | set[str] | None = None,
) -> pa.Table:
    """Deterministic n-row sample: bottom-k rows by hash priority.

    Per-batch partial bottom-k (map_batches) then one small driver
    merge — no shuffle, no order dependence. ``exclude`` is the
    broadcast anti-join key set (J2 in SURVEY.md §2.4).
    """
    excl = frozenset(exclude or ())
    excl_arr = pa.array(sorted(excl)) if excl else None

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..kernels.text import fnv1a_64_arrow

        col = batch.column(key_col)
        # hash straight off the Arrow value buffer (bit-equal to the
        # old per-row fnv1a_64(k.encode()) loop, which ran over the
        # FULL input on every qc_summary call — measured 6-7× when the
        # same kernel replaced the partition hasher's per-row loop)
        prio = fnv1a_64_arrow(col)
        mask = np.ones(len(col), dtype=bool)
        if excl_arr is not None:
            mask = np.invert(
                pc.is_in(col, value_set=excl_arr).to_numpy(zero_copy_only=False)
            )
        idx = np.nonzero(mask)[0]
        if idx.size > n:
            sel = idx[np.argsort(prio[idx], kind="stable")[:n]]
        else:
            sel = idx
        out = batch.take(pa.array(np.sort(sel)))
        return out.append_column("__prio", pa.array(prio[np.sort(sel)], pa.uint64()))

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536).to_pandas()
    if not parts.shape[1]:
        # zero input rows anywhere: Ray loses the schema through the
        # empty map_batches boundary, so the collected frame comes back
        # column-less. The INPUT dataset's schema is exactly the output
        # contract (bottom-k keeps input columns; __prio was dropped),
        # and fetching it over a 0-row plan is cheap — so recover the
        # typed empty here instead of pushing a pre-branch onto every
        # caller. pa.table({}) only if even the input schema is gone.
        try:
            sch = ds.schema()
            return pa.schema(list(zip(sch.names, sch.types))).empty_table()
        except Exception:
            return pa.table({})
    parts = parts.sort_values(["__prio", key_col], kind="stable").head(n)
    return pa.Table.from_pandas(parts.drop(columns="__prio"), preserve_index=False)


def reservoir_reference(
    rows: list, n: int, exclude: set[str] | None = None, chunk_size: int = 1000
) -> list:
    """Faithful twin of the reference reservoir (lq_utils.py:371-411):
    per-chunk ``np.random.seed(7)``, slot rule d=int(h[k]*n_seen),
    overwrite when d<n; honors the exclusion list. Local-only; kept to
    document/pin the reference's chunk-boundary dependence."""
    exclude = exclude or set()
    s: list = []
    cum = 0
    for lo in range(0, len(rows), chunk_size):
        chunk = rows[lo : lo + chunk_size]
        np.random.seed(7)
        h = np.random.uniform(size=len(chunk) + 1)
        for k, row in enumerate(chunk):
            if row[0] in exclude:
                continue
            if cum < n:
                s.append(row)
                cum += 1
                continue
            cum += 1
            d = int(h[k] * cum)
            if d < n:
                s[d] = row
    return s
