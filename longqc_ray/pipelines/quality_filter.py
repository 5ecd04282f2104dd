"""Flagship pipeline: the LongQC sampleqc chunk-loop re-expressed as a
single streaming Ray Data pass (SURVEY.md §3.1 mapping).

    read_parquet (clips shards, column-pruned)
      → map_batches(compute_features)        stateless tasks; payload dropped here
      → map_batches(ModelScorer, ...)        actor pool, broadcast models
      → map_batches(apply_rules)             vectorized rule cascade
      → [exact dedup by clip_id]             the only shuffle, post-filter
      → write_parquet per input shard-group  (resume unit, lineage manifest)

Scale notes (100 TB design):
- the payload never crosses more than one stage; blocks stay Arrow.
- ``batch_size`` for the feature stage is small because rows are wide
  (audio payloads); the scorer stage re-batches larger since rows are
  narrow by then.
- dedup shuffles only rows that *survived* the filter, and only the
  (clip_id, hash) projection would be needed at true scale; here the
  surviving row set is shuffled directly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..config import DEFAULT_CONFIG, FilterConfig
from ..stages.features import compute_features
from ..stages.rules import apply_rules
from ..state.scorers import ModelScorer, put_model_refs

# wide-row stage: keep decoded PCM per in-flight batch bounded
FEATURE_BATCH_SIZE = 64
SCORER_BATCH_SIZE = 1024


def label_clips(
    ds: rd.Dataset,
    config: FilterConfig = DEFAULT_CONFIG,
    scorer_concurrency=(2, 8),
    model_refs: dict | None = None,
) -> rd.Dataset:
    """All rows in, all rows out + stat/label columns (no dedup)."""
    refs = model_refs if model_refs is not None else put_model_refs()
    ds = ds.map_batches(
        compute_features,
        fn_kwargs={"config": config},
        batch_format="pyarrow",
        batch_size=FEATURE_BATCH_SIZE,
        zero_copy_batch=True,
    )
    ds = ds.map_batches(
        ModelScorer,
        fn_constructor_kwargs=refs,
        batch_format="pyarrow",
        batch_size=SCORER_BATCH_SIZE,
        concurrency=scorer_concurrency,
        num_cpus=1,
    )
    ds = ds.map_batches(
        apply_rules,
        fn_kwargs={"config": config},
        batch_format="pyarrow",
        batch_size=SCORER_BATCH_SIZE,
        zero_copy_batch=True,
    )
    return ds


def dedup_first(ds: rd.Dataset, key: str = "clip_id", n_parts: int = 64) -> rd.Dataset:
    """Exact dedup by key (hash-partition + per-partition first —
    SURVEY.md §2.7; duplicates here are identical rows so any-wins ≡
    first-wins).

    Partitioning is by hash(key) % n_parts, NOT by the key itself:
    ``map_groups`` over millions of tiny single-row groups pays a
    python/pandas overhead per group, while ``n_parts`` bounded
    partitions each dedup vectorized (measured ~50× on the 20k-row
    bench). All copies of one key land in one partition, so the
    result is identical; n_parts scales with the cluster."""
    import zlib

    import pandas as pd

    def add_part(t: pa.Table) -> pa.Table:
        keys = t.column(key).to_pylist()
        part = np.array([zlib.crc32(k.encode()) % n_parts for k in keys], dtype=np.int64)
        return t.append_column("__part", pa.array(part, pa.int64()))

    def dd(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=[key]).drop(columns="__part")

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(dd, batch_format="pandas")
    )


def filter_clips(
    ds: rd.Dataset,
    config: FilterConfig = DEFAULT_CONFIG,
    dedup: bool = True,
    **kwargs,
) -> rd.Dataset:
    """Labeled → kept rows only (scrubbed transcript included)."""
    labeled = label_clips(ds, config, **kwargs)
    kept = labeled.map_batches(
        lambda t: t.filter(t.column("keep")), batch_format="pyarrow"
    )
    if dedup:
        kept = dedup_first(kept)
    return kept
