"""Format-sniffing ingest — the S1/S2 analogue of LongQC's
``guess_format`` (/root/reference/lq_utils.py:89-134: magic bytes +
first-line heuristics dispatching BAM/SAM/FASTQ/FASTA/fast5 readers).

Here the container set is {parquet, csv, json-lines}: magic bytes
first (``PAR1``), then content heuristics, then extension; the result
dispatches to the matching ``ray.data.read_*`` (column-pruned where
the format supports it). Unknown → ValueError, the reference's −1
path (lq_utils.py:131-134).
"""

from __future__ import annotations

import glob
import os

import ray.data as rd

FORMAT_PARQUET = "parquet"
FORMAT_CSV = "csv"
FORMAT_JSONL = "jsonl"


def guess_format(path: str) -> str:
    """Sniff one file's container format from magic bytes + first line."""
    with open(path, "rb") as f:
        head = f.read(4096)
    if head[:4] == b"PAR1":
        return FORMAT_PARQUET
    first = head.split(b"\n", 1)[0].strip()
    if first.startswith(b"{") and first.endswith(b"}"):
        return FORMAT_JSONL
    if b"," in first:
        return FORMAT_CSV
    ext = os.path.splitext(path)[1].lower()
    if ext in (".csv",):
        return FORMAT_CSV
    if ext in (".json", ".jsonl", ".ndjson"):
        return FORMAT_JSONL
    if ext in (".parquet", ".pq"):
        return FORMAT_PARQUET
    raise ValueError(f"unknown container format: {path}")


def read_auto(path_or_glob: str, columns: list[str] | None = None) -> rd.Dataset:
    """Dispatching reader. All files of one dataset must agree on the
    sniffed format (the reference rejects mixed inputs the same way)."""
    paths = sorted(glob.glob(path_or_glob)) if any(c in path_or_glob for c in "*?[") else [path_or_glob]
    if not paths:
        raise FileNotFoundError(path_or_glob)
    fmts = {guess_format(p) for p in paths}
    if len(fmts) != 1:
        raise ValueError(f"mixed container formats {fmts} under {path_or_glob}")
    fmt = fmts.pop()
    if fmt == FORMAT_PARQUET:
        return rd.read_parquet(paths, columns=columns)
    if fmt == FORMAT_CSV:
        ds = rd.read_csv(paths)
    else:
        ds = rd.read_json(paths)
    if columns:
        ds = ds.select_columns(columns)
    return ds
