"""Mergeable cardinality sketch: HyperLogLog (Flajolet et al. 2007,
public algorithm; the bias-correction constants are the published
alpha_m values).

The exact count-distinct in ``relational.user_occupancy`` shuffles
every (key) pair; at 10^12 rows an exact distinct is an all-to-all
over the full key set. The HLL register array is a CONSTANT-size
(2^p bytes) commutative-merge partial — per-batch registers reduce
with elementwise max, so the shuffle carries 2^p bytes per block no
matter the data size (the same mergeable-partial pattern as
functions/stats.weighted_histogram).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..kernels.text import fnv1a_64_strs

DEFAULT_P = 12  # 4096 registers → ~1.6% standard error


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(hashes: np.ndarray, p: int = DEFAULT_P) -> np.ndarray:
    """(2^p,) uint8 register array from uint64 hashes — vectorized:
    bucket = top p bits, rank = 1 + leading-zero count of the
    remaining 64-p bits (clamped)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if hashes.size == 0:
        return regs
    h = hashes.astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | ((np.uint64(1) << np.uint64(p)) - np.uint64(1))
    # rank = 1 + leading-zero count of `rest` (low p bits forced to 1,
    # so rest > 0 and the rank caps at 64-p+1). EXACT integer
    # bit-length via 6-step binary reduction — float log2 rounds a
    # value just below 2^k up to 2^k for >=2^53, off-by-one rank (and
    # it makes the DuckDB oracle twin, which uses bin()-length,
    # implementation-identical rather than libm-dependent).
    bl = np.zeros(rest.shape, dtype=np.uint8)
    cur = rest.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = cur >= (np.uint64(1) << np.uint64(s))
        bl[big] += np.uint8(s)
        cur[big] >>= np.uint64(s)
    bl += cur.astype(np.uint8)  # the final surviving bit
    rank = np.uint8(65) - bl
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimate with the small-range (linear counting)
    correction; the large-range correction is unnecessary with 64-bit
    hashes."""
    m = regs.size
    est = _alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int((regs == 0).sum())
        if zeros:
            return m * np.log(m / zeros)
    return float(est)


def _mix64(h: np.ndarray) -> np.ndarray:
    """MurmurHash3 fmix64 finalizer (public): FNV-1a's HIGH bits do
    not avalanche for short inputs, and HLL takes its bucket index
    from the top p bits — without this mix, small integer keys land in
    a handful of buckets and the estimate collapses."""
    with np.errstate(over="ignore"):
        h = h ^ (h >> np.uint64(33))
        h = h * np.uint64(0xFF51AFD7ED558CCD)
        h = h ^ (h >> np.uint64(33))
        h = h * np.uint64(0xC4CEB9FE1A85EC53)
        h = h ^ (h >> np.uint64(33))
    return h


def _hash_column(t: pa.Table, col: str) -> np.ndarray:
    """uint64 per value: length-aware FNV-1a over the string form +
    fmix64 finalizer. Length-aware matters: the padded-width kernel
    would hash the same value differently in batches with different
    max widths, splitting one distinct value into several."""
    vals = t.column(col).to_pylist()
    if not vals:
        return np.empty(0, dtype=np.uint64)
    return _mix64(fnv1a_64_strs([str(v) for v in vals]))


def approx_distinct(ds: rd.Dataset, col: str, p: int = DEFAULT_P) -> float:
    """Distributed approximate count-distinct: per-batch register
    partials (rows → one (m,) array each) merged by elementwise max —
    block output is CONSTANT size, the driver merge is O(blocks·m)."""

    def partial(t: pa.Table) -> pa.Table:
        regs = hll_registers(_hash_column(t, col), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).to_pandas()
    from ..pipelines.util import ensure_columns

    parts = ensure_columns(parts, {"regs": object})  # 0-row input: no partials
    merged = np.zeros(1 << p, dtype=np.uint8)
    for b in parts["regs"]:
        merged = hll_merge(merged, np.frombuffer(b, dtype=np.uint8))
    return hll_estimate(merged)


def approx_distinct_grouped(
    ds: rd.Dataset, key: str, col: str, p: int = DEFAULT_P
) -> dict:
    """Per-GROUP approximate count-distinct: each batch emits one
    (key, registers) row per group present in the batch — block output
    is O(groups_in_batch), the driver merge is elementwise max per
    group. For bounded-cardinality keys; at large key cardinality the
    same partials feed a (key) groupby with a register-max aggregate
    instead of the driver merge."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        kv = np.asarray(t.column(key).to_pylist(), dtype=object)
        codes, uniq = pd.factorize(kv)
        h = _hash_column(t, col)
        ks, rs = [], []
        for j, kval in enumerate(uniq):
            ks.append(kval)
            rs.append(hll_registers(h[codes == j], p).tobytes())
        return pa.table({
            key: pa.array(ks, pa.string()),
            "regs": pa.array(rs, pa.binary()),
        })

    parts = ds.select_columns([key, col]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).to_pandas()
    from ..pipelines.util import ensure_columns

    parts = ensure_columns(parts, {key: object, "regs": object})
    out: dict = {}
    for kval, grp in parts.groupby(key, sort=True):
        merged = np.zeros(1 << p, dtype=np.uint8)
        for b in grp["regs"]:
            merged = hll_merge(merged, np.frombuffer(b, dtype=np.uint8))
        out[kval] = hll_estimate(merged)
    return out
