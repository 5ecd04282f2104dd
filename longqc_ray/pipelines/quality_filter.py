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
import ray
import ray.data as rd

from ..config import DEFAULT_CONFIG, FilterConfig
from ..stages.features import compute_features
from ..stages.rules import apply_rules
from ..state.scorers import ModelScorer, put_model_refs
from .util import scale_cap

# Wide-row stage batch: 512 rows ≈ 18 MB payload per batch (the
# decode loop holds only ONE row's PCM transiently, so batch memory is
# the Arrow payload itself); 64-row batches measured 2.4× slower from
# per-task overhead alone. The scorer stage re-batches larger — rows
# are narrow by then and its kernels amortize over the whole batch.
FEATURE_BATCH_SIZE = 512
SCORER_BATCH_SIZE = 2048


class _ScoreAndRule(ModelScorer):
    """Scorer actor that also evaluates the rule cascade in the same
    call. Ray Data fuses the upstream feature TASK stage into the
    actor pool anyway (task→actor fusion); folding the rules in too
    makes the whole per-row pipeline ONE fused stage, so sizing the
    actor pool = sizing the pipeline — no second stage competes for
    cores and the narrow intermediate never crosses the object
    store."""

    def __init__(
        self, config: FilterConfig = DEFAULT_CONFIG, keep_only: bool = False, **refs
    ):
        super().__init__(**refs)
        self._config = config
        self._keep_only = keep_only

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = apply_rules(super().__call__(batch), config=self._config)
        if self._keep_only:
            out = out.filter(out.column("keep"))
        return out


def label_clips(
    ds: rd.Dataset,
    config: FilterConfig = DEFAULT_CONFIG,
    scorer_concurrency=(2, 8),
    model_refs: dict | None = None,
    keep_only: bool = False,
) -> rd.Dataset:
    """All rows in, all rows out + stat/label columns (no dedup).

    ``keep_only=True`` drops non-keep rows inside the same fused actor
    stage (used by ``filter_clips``) so no post-actor task stage
    competes with the pool for cores.

    Sizing a FIXED pool (int ``scorer_concurrency``): leave at least
    1.5 CPUs per node un-pooled when the input is a task-based read
    (parquet/lance scan). Ray places the pool's actors eagerly and
    never evicts them, so a pool that fills the node starves the
    1-CPU read tasks and the pipeline deadlocks at startup (observed
    at cpus=4 with a 3-actor pool + the 0.5-CPU dedup actor: the read
    task stayed backpressured forever against 3 idle actors). The
    autoscaling tuple form starts at ``min_size`` and only grows on
    backlog, which in practice leaves the read headroom."""
    from ray.data import ActorPoolStrategy

    from ..config import extraction_config

    refs = model_refs if model_refs is not None else put_model_refs()
    # in cohort mode the feature stage runs once with the permissive
    # union of both cohorts' sanity bounds (config.extraction_config);
    # only the rule thresholds differ per cohort
    feat_config = extraction_config(config)
    ds = ds.map_batches(
        compute_features,
        fn_kwargs={"config": feat_config},
        batch_format="pyarrow",
        batch_size=FEATURE_BATCH_SIZE,
        zero_copy_batch=True,
    )
    # max_tasks_in_flight_per_actor=4: the executor's default queue
    # depth starves a fixed pool whose task times vary (measured 12.6k
    # → 26.6k rows/s at 30 actors on the 240k-row scaling workload);
    # 4 keeps each actor's input queue non-empty without hoarding
    # blocks on one worker
    if isinstance(scorer_concurrency, int):
        compute = ActorPoolStrategy(
            size=scorer_concurrency, max_tasks_in_flight_per_actor=4
        )
    else:
        compute = ActorPoolStrategy(
            min_size=scorer_concurrency[0],
            max_size=scorer_concurrency[1],
            max_tasks_in_flight_per_actor=4,
        )
    ds = ds.map_batches(
        _ScoreAndRule,
        fn_constructor_kwargs={**refs, "config": config, "keep_only": keep_only},
        batch_format="pyarrow",
        batch_size=SCORER_BATCH_SIZE,
        compute=compute,
        num_cpus=1,
    )
    return ds


def dedup_shuffle(ds: rd.Dataset, key: str = "clip_id", n_parts: int = 64) -> rd.Dataset:
    """Exact dedup by key via full hash-partition + per-partition
    first (SURVEY.md §2.7; duplicates here are identical rows so
    any-wins ≡ first-wins).

    Partitioning is by hash(key) % n_parts, NOT by the key itself:
    ``map_groups`` over millions of tiny single-row groups pays a
    python/pandas overhead per group, while ``n_parts`` bounded
    partitions each dedup vectorized (measured ~50× on the 20k-row
    bench). All copies of one key land in one partition, so the
    result is identical; n_parts scales with the cluster. This is the
    dense-duplicate path — it shuffles EVERY (wide) row."""
    import pandas as pd

    from ..kernels.text import fnv1a_64_arrow

    def add_part(t: pa.Table) -> pa.Table:
        # vectorized FNV straight off the Arrow value buffer — the
        # per-row crc32 loop this replaces was O(rows) Python on the
        # hot shuffle path (measured 7.7× on 1M keys incl. its
        # to_pylist)
        part = (fnv1a_64_arrow(t.column(key)) % np.uint64(n_parts)).astype(np.int64)
        return t.append_column("__part", pa.array(part, pa.int64()))

    def dd(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=[key]).drop(columns="__part")

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(dd, batch_format="pandas")
    )


# above this many distinct duplicated keys the broadcast set stops
# being "small-side" and the dense shuffle path takes over
DUP_BROADCAST_CAP = 2_000_000


# below this many rows the per-batch partial counts merge on the
# driver (tiny vectorized value_counts); above it the merge is a
# grouped-sum shuffle — same strategy split as broadcast vs shuffle
# joins, and both produce identical dup sets
DUP_SCAN_DRIVER_CAP = 50_000_000


def find_dup_keys(ds: rd.Dataset, key: str = "clip_id") -> "pa.Array":
    """NARROW dup-key scan: per-batch partial counts over just the key
    column, merged either driver-side (small inputs) or by one small
    grouped-sum shuffle. This is the only shuffle the rare-dup dedup
    path can ever need, and it carries key+int columns only — never
    the wide rows."""
    import pyarrow.compute as pc

    def key_counts(t: pa.Table) -> pa.Table:
        out = t.select([key]).group_by([key]).aggregate([([], "count_all")])
        return out.rename_columns([key, "n"])

    # Materialize the NARROW partials once: the upstream key scan then
    # executes exactly once (previously ds.count() ran the full scan
    # and to_pandas() re-ran it), and count() on the materialized
    # partials is metadata-free. The driver/shuffle branch caps the
    # PARTIAL row count — the actual driver-merge collect size — which
    # is ≤ input rows, so the cap semantics only tighten.
    partials = ds.map_batches(key_counts, batch_format="pyarrow").materialize()
    if partials.count() <= scale_cap("DUP_SCAN_DRIVER", DUP_SCAN_DRIVER_CAP):
        merged = partials.to_pandas()
        totals = merged.groupby(key, sort=False)["n"].sum()
        dups = totals.index[totals.to_numpy() > 1]
        return pa.array(sorted(dups), pa.string())
    from .util import hash_grouped_sum

    totals = hash_grouped_sum(partials, [key], "n", "n")
    dup = totals.map_batches(
        lambda t: t.filter(pc.greater(t.column("n"), 1)).select([key]),
        batch_format="pyarrow",
    ).to_pandas()
    return pa.array(sorted(dup[key]), pa.string())


@ray.remote(num_cpus=0)
class _ClaimSet:
    """First-wins claim registry for DUPLICATED keys only (rare side).

    Grants are idempotent per (key, batch_token): a retried task
    re-claims its own keys and gets the same grants, so Ray task
    retries never drop rows. Memory is bounded by the dup-key count
    (≤ DUP_BROADCAST_CAP) divided across the shard set."""

    def __init__(self):
        self._granted: dict = {}

    def claim(self, keys: list, token: int) -> list:
        out = []
        for k in keys:
            t = self._granted.setdefault(k, token)
            out.append(t == token)
        return out


# One claim shard serves ~comfortably 10k claims/s; dup keys are rare,
# so a handful of shards keeps the registry off any single node's
# critical path at cluster scale while costing nothing locally.
CLAIM_SHARDS = 4


class _ClaimRouter:
    """Key-range-sharded claim registry: hash(key) picks the shard, so
    shard state is disjoint and grants stay exactly-once per key. All
    shards are asked concurrently (one round trip, not one per key)."""

    def __init__(self, n_shards: int = CLAIM_SHARDS):
        self._shards = [_ClaimSet.remote() for _ in range(n_shards)]
        self._n = n_shards

    def claim(self, keys: list, token: int) -> list:
        import zlib

        by_shard: dict[int, list] = {}
        slot: list[tuple[int, int]] = []
        for k in keys:
            s = zlib.crc32(str(k).encode()) % self._n
            lst = by_shard.setdefault(s, [])
            slot.append((s, len(lst)))
            lst.append(k)
        futs = {s: self._shards[s].claim.remote(ks, token) for s, ks in by_shard.items()}
        res = {s: r for s, r in zip(futs, ray.get(list(futs.values())))}
        return [res[s][i] for s, i in slot]


class _DedupStage:
    """Single-pass dedup stage: rows with non-duplicated keys stream
    through untouched; rows with keys in the broadcast dup set ask the
    claim actor which copy wins. Only dup-key ids ever cross to the
    actor — the wide row data never shuffles."""

    def __init__(self, key: str, dup_ref, claim_router):
        import pyarrow.compute as pc  # noqa: F401

        self._key = key
        self._dups = ray.get(dup_ref)
        self._router = claim_router

    def __call__(self, t: pa.Table) -> pa.Table:
        import hashlib

        import pyarrow.compute as pc

        mask = pc.is_in(t.column(self._key), value_set=self._dups)
        if not pc.any(mask).as_py():
            return t
        # within-batch first-wins, then global claim for the rest
        keys = t.column(self._key).to_pylist()
        dup_flags = mask.to_numpy(zero_copy_only=False)
        seen: set = set()
        keep = np.ones(len(keys), dtype=bool)
        ask: dict = {}
        for i, (k, d) in enumerate(zip(keys, dup_flags)):
            if not d:
                continue
            if k in seen:
                keep[i] = False
            else:
                seen.add(k)
                ask[k] = i
        # Token = 64-bit hash of the batch's FULL ordered key list, not
        # just the ask set: two different batches each holding one copy
        # of the same dup key have identical ask sets, but their full
        # key lists differ (non-duplicated clip_ids are globally
        # unique), so they get distinct tokens while a task retry of
        # the SAME batch reproduces its token exactly. blake2b-64
        # instead of crc32 so millions of batches don't birthday-collide.
        # Residual caveat: two batches identical row-for-row (every row
        # a dup copy, same order) are indistinguishable from a retry —
        # impossible once a batch contains any unique key.
        token = int.from_bytes(
            hashlib.blake2b("\x00".join(keys).encode(), digest_size=8).digest(),
            "big",
        )
        granted = self._router.claim(list(ask), token)
        for k, ok in zip(ask, granted):
            if not ok:
                keep[ask[k]] = False
        return t.filter(pa.array(keep))


def dedup_first(
    ds: rd.Dataset,
    key: str = "clip_id",
    n_parts: int = 64,
    dup_keys: "pa.Array | None" = None,
) -> rd.Dataset:
    """Exact dedup by key, optimized for the realistic case where
    duplicate keys are RARE (the 100 TB case):

    1. a NARROW scan (``find_dup_keys``, key column only) finds keys
       seen more than once — callers that already know the input key
       column (the flagship: clip_id straight off parquet) pass
       ``dup_keys`` so the derived pipeline is never re-executed;
    2. no dup keys → the dataset passes through untouched (zero
       shuffle, zero extra stages — the common case);
    3. else the small dup-key set broadcasts and a single-pass
       ``map_batches`` stage keeps the first copy of each dup key via
       an idempotent claim actor — clean rows never pay anything.

    Falls back to ``dedup_shuffle`` (full wide hash-partition) when
    the dup-key set exceeds DUP_BROADCAST_CAP. Output rows are
    identical on every path (duplicates are identical copies, so
    first-wins content is deterministic)."""
    dups = dup_keys if dup_keys is not None else find_dup_keys(ds, key)
    if len(dups) == 0:
        return ds
    if len(dups) > DUP_BROADCAST_CAP:
        return dedup_shuffle(ds, key=key, n_parts=n_parts)
    dup_ref = ray.put(dups)
    claim_router = _ClaimRouter()
    return ds.map_batches(
        _DedupStage,
        fn_constructor_kwargs={
            "key": key, "dup_ref": dup_ref, "claim_router": claim_router,
        },
        batch_format="pyarrow",
        concurrency=(1, n_parts),
        num_cpus=0.5,
    )


def filter_clips(
    ds: rd.Dataset,
    config: FilterConfig = DEFAULT_CONFIG,
    dedup: bool = True,
    **kwargs,
) -> rd.Dataset:
    """Labeled → kept rows only (scrubbed transcript included).

    Dedup runs in rare-dup mode: the dup-key scan reads ONLY the
    clip_id column of the raw input (column-pruned, payload never
    touched), so the feature/scorer pipeline executes exactly once."""
    kept = label_clips(ds, config, keep_only=True, **kwargs)
    if dedup:
        dup_keys = find_dup_keys(ds.select_columns(["clip_id"]))
        kept = dedup_first(kept, dup_keys=dup_keys)
    return kept
