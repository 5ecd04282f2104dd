"""Per-partition lineage + exact resume-from-checkpoint.

The reference has NO checkpoint/resume (crash ⇒ full rerun, partial
temp files left behind — cleanup only at exit, longQC.py:845-865).
At 10^12-clip scale that is untenable, so the north rule makes resume
a first-class requirement: every input shard-group is one unit of
work; finishing a unit appends a manifest record (rows in/out,
drop-reason histogram, order-insensitive content hash, wall time);
resuming skips units already in the manifest. Output files are
written to a temp dir and renamed into place so a crash mid-write
never yields a half-partition that looks done.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..config import DEFAULT_CONFIG, DROP_REASONS, FilterConfig
from .. import fixtures  # noqa: F401  (not used directly; doc link)
from ..pipelines.quality_filter import dedup_first, label_clips


# Manifest hash-scheme version. v1 was a per-row Python double-crc32
# loop (O(kept rows) Python on every unit); v2 composes
# "clip_id|keep|scrubbed" as ONE Arrow column and hashes it with the
# vectorized FNV-1a buffer kernel. Every manifest record carries the
# scheme name so a verifier recomputing content_hash_xor knows which
# kernel produced it — hashes from different schemes are never
# comparable silently. Resume-by-unit-name is scheme-independent (the
# written parquet is valid either way; pinned in test_resume).
HASH_SCHEME = "fnv1a64-v2"


def _content_hash_column(batch: pa.Table) -> pa.Table:
    """Order-insensitive per-row hash: xor-reducible uint64 over
    (clip_id, keep, scrubbed_transcript) — one composed string column
    (pc.binary_join_element_wise) hashed straight off its Arrow value
    buffer (kernels/text.fnv1a_64_arrow), no per-row Python."""
    return _hash_composed(
        batch,
        batch.column("clip_id").cast(pa.string()),
        batch.column("keep").cast(pa.int8()).cast(pa.string()),
        batch.column("scrubbed_transcript"),
    )


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest.jsonl")


def completed_units(out_dir: str) -> set[str]:
    return set(completed_unit_files(out_dir))


def completed_unit_files(out_dir: str) -> dict[str, list[str]]:
    """unit -> recorded shard basenames, from the manifest. The file
    list is the unit's identity: resume validates it so a run with a
    different ``shards_per_unit`` (or a changed shard list) cannot
    silently skip a unit that covers DIFFERENT input."""
    path = manifest_path(out_dir)
    done: dict[str, list[str]] = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rec = json.loads(line)
                    done[rec["unit"]] = rec["files"]
    return done


def _resolve_units(input_dir: str, shards_per_unit: int) -> list[tuple[str, list[str]]]:
    shards = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    if not shards:
        raise FileNotFoundError(f"no parquet shards under {input_dir}")
    return [
        (f"unit-{u:05d}", shards[u * shards_per_unit : (u + 1) * shards_per_unit])
        for u in range((len(shards) + shards_per_unit - 1) // shards_per_unit)
    ]


def run_units_resumable(
    input_dir: str,
    out_dir: str,
    process_unit,
    shards_per_unit: int = 4,
    max_units: int | None = None,
    summary_key: str = "rows_out",
) -> dict:
    """The shared resumable-export driver — unit partitioning, manifest
    skip/validate, tmp-write + rename publish, manifest append — with
    the per-unit pipeline injected as ``process_unit(files, tmp_dir)
    -> manifest fields`` (must contain ``summary_key``; a raise inside
    it aborts the run BEFORE any manifest row, so a corrupt shard is
    redone on resume — pinned in test_resume).

    Resume safety: a completed unit's recorded shard basenames must
    equal the grouping this run derives; a mismatch (different
    ``shards_per_unit``, renamed/added shards) raises instead of
    silently skipping a unit that covers different input.

    Returns {units_run, units_skipped, <summary_key>}."""
    units = _resolve_units(input_dir, shards_per_unit)
    os.makedirs(out_dir, exist_ok=True)
    done = completed_unit_files(out_dir)

    ran = 0
    skipped = 0
    total = 0
    for unit, files in units:
        expected = [os.path.basename(p) for p in files]
        if unit in done:
            if done[unit] != expected:
                raise ValueError(
                    f"manifest records {unit} over shards {done[unit]} but this "
                    f"run groups it as {expected} — resume with the same "
                    f"shards_per_unit and shard list as the original run"
                )
            skipped += 1
            continue
        if max_units is not None and ran >= max_units:
            break
        t0 = time.time()
        tmp = os.path.join(out_dir, f".tmp-{unit}")
        final = os.path.join(out_dir, "parts", unit)
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        fields = process_unit(files, tmp)
        os.makedirs(tmp, exist_ok=True)  # 0-row unit: empty dir is legal
        os.makedirs(os.path.dirname(final), exist_ok=True)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        with open(manifest_path(out_dir), "a") as f:
            f.write(json.dumps(
                {"unit": unit, "files": expected, **fields,
                 "wall_s": round(time.time() - t0, 3)}
            ) + "\n")
        ran += 1
        total += fields[summary_key]
    return {"units_run": ran, "units_skipped": skipped, summary_key: total}


def run_filter_resumable(
    input_dir: str,
    out_dir: str,
    config: FilterConfig = DEFAULT_CONFIG,
    shards_per_unit: int = 4,
    model_refs: dict | None = None,
    max_units: int | None = None,
) -> dict:
    """Run the flagship filter over ``input_dir/*.parquet`` with
    per-unit lineage; skips units already recorded in the manifest.

    ``max_units`` exists for the kill-and-resume test: process only
    that many pending units, then stop (simulating a crash between
    units).

    Returns a summary dict {units_run, units_skipped, rows_out}.
    """
    from ..state.scorers import put_model_refs

    refs = model_refs if model_refs is not None else put_model_refs()

    def process_unit(files: list[str], tmp: str) -> dict:
        import pyarrow.parquet as pq

        from ..pipelines.util import read_wide_parquet

        ds = read_wide_parquet(files)
        # one unit is bounded by shards_per_unit, so materializing its
        # *labeled* (payload-free) rows is bounded too — this lets the
        # write, the histogram and the hash consume one execution
        # instead of re-running the pipeline per consumer
        labeled = label_clips(ds, config, model_refs=refs).materialize()
        rows_in = labeled.count()
        kept = labeled.map_batches(
            lambda t: t.filter(t.column("keep")), batch_format="pyarrow"
        )
        kept = dedup_first(kept)
        kept = kept.map_batches(_content_hash_column, batch_format="pyarrow")
        kept.write_parquet(tmp)

        # small driver-side reductions for the manifest (the written
        # unit is the post-filter minority — cheap to re-read)
        written = (
            pq.read_table(tmp, columns=["row_hash"])
            if glob.glob(os.path.join(tmp, "*.parquet"))
            else pa.table({"row_hash": pa.array([], pa.uint64())})
        )
        xor_hash = int(np.bitwise_xor.reduce(
            written.column("row_hash").to_numpy().astype(np.uint64), initial=np.uint64(0)
        ))
        # drop-reason histogram over ALL labeled rows of the unit
        reasons = labeled.groupby("drop_reason").count().to_pandas()
        hist = {
            r: int(c)
            for r, c in zip(reasons["drop_reason"], reasons["count()"])
            if r in DROP_REASONS
        }
        return {
            "rows_in": rows_in,
            "rows_out": written.num_rows,
            "drop_reasons": hist,
            "content_hash_xor": xor_hash,
            "hash_scheme": HASH_SCHEME,
        }

    return run_units_resumable(
        input_dir, out_dir, process_unit,
        shards_per_unit=shards_per_unit, max_units=max_units,
        summary_key="rows_out",
    )


def _hash_composed(batch: pa.Table, *cols) -> pa.Table:
    """Append the order-insensitive ``row_hash`` column: the given
    (already string-cast) arrays composed with "|" and hashed straight
    off the Arrow value buffer (``fnv1a_64_arrow``) — the ONE
    compose-and-FNV helper behind every manifest hash scheme. Each
    scheme keeps its own cast list (cast rules are part of the scheme:
    e.g. the flagship casts keep via int8 → "0"/"1", which a generic
    to-string cast would silently change to "true"/"false")."""
    import pyarrow.compute as pc

    from ..kernels.text import fnv1a_64_arrow

    composed = pc.binary_join_element_wise(*cols, "|")
    h = fnv1a_64_arrow(composed)
    return batch.append_column("row_hash", pa.array(h, pa.uint64()))


def _payload_export_unit(
    files: list[str],
    tmp: str,
    transform,
    hash_column,
    dur_col: str,
    rows_key: str,
    ms_key: str,
    scheme: str,
) -> dict:
    """The shared payload-export unit body (segments + augmentation):
    read the shard group → ``transform(ds)`` (payload-emitting, no
    shuffle) → ``hash_column`` → write to ``tmp``; manifest reductions
    re-read ONLY the narrow (row_hash, dur) columns of the written
    unit. Publish/skip/manifest: ``run_units_resumable``."""
    import pyarrow.parquet as pq

    from ..pipelines.util import read_wide_parquet

    ds = read_wide_parquet(files)
    clips_in = ds.count()
    out = transform(ds).map_batches(hash_column, batch_format="pyarrow")
    out.write_parquet(tmp)

    narrow = (
        pq.read_table(tmp, columns=["row_hash", dur_col])
        if glob.glob(os.path.join(tmp, "*.parquet"))
        else pa.table({"row_hash": pa.array([], pa.uint64()),
                       dur_col: pa.array([], pa.float64())})
    )
    rows_out = narrow.num_rows
    xor_hash = int(np.bitwise_xor.reduce(
        narrow.column("row_hash").to_numpy().astype(np.uint64), initial=np.uint64(0)
    ))
    total_ms = float(np.sum(narrow.column(dur_col).to_numpy())) if rows_out else 0.0
    return {
        "clips_in": clips_in,
        rows_key: rows_out,
        ms_key: round(total_ms, 3),
        "content_hash_xor": xor_hash,
        "hash_scheme": scheme,
    }


SEG_HASH_SCHEME = "seg-fnv1a64-v1"


def _segment_hash_column(batch: pa.Table) -> pa.Table:
    """Order-insensitive per-segment hash: xor-reducible uint64 over
    (clip_id, seg_idx, start_sample, end_sample) via ``_hash_composed``.
    The payload bytes are deliberately NOT hashed: they are a pure
    function of (parent payload, bounds) (byte-slice, pinned in
    test_round5b), so bounds identity ⇒ payload identity, and hashing
    the narrow columns keeps the manifest pass payload-free."""
    return _hash_composed(
        batch,
        batch.column("clip_id").cast(pa.string()),
        batch.column("seg_idx").cast(pa.string()),
        batch.column("start_sample").cast(pa.string()),
        batch.column("end_sample").cast(pa.string()),
    )


def run_segments_resumable(
    input_dir: str,
    out_dir: str,
    shards_per_unit: int = 4,
    max_units: int | None = None,
    **seg_kwargs,
) -> dict:
    """Resumable VAD-segmentation EXPORT — the second consumer of the
    lineage surface (proving resume-from-checkpoint is an engine
    capability, not a flagship one-off): every input shard-group is
    one unit; each finished unit appends a manifest record (clips in,
    segments out, total segment duration, order-insensitive content
    hash, wall time) and lands its payload-carrying parquet partition
    via the same tmp-write + rename publish, so a crash mid-write
    never yields a half-partition that looks done. Resuming skips
    units already in the manifest (same ``completed_units`` contract
    as the flagship filter; kill-and-resume pinned in tests).

    Per unit: read the shard group → ``segment_clips_over(...,
    emit_payload=True)`` (one streaming map_batches, byte-slice
    payloads, no shuffle) → hash column → write. The manifest
    reductions re-read only the NARROW columns of the written unit.
    Unit partitioning / skip / publish: ``run_units_resumable``."""
    from ..pipelines.multimodal import segment_clips_over

    def process_unit(files: list[str], tmp: str) -> dict:
        return _payload_export_unit(
            files, tmp,
            transform=lambda ds: segment_clips_over(ds, emit_payload=True, **seg_kwargs),
            hash_column=_segment_hash_column,
            dur_col="seg_dur_ms", rows_key="segments_out",
            ms_key="total_segment_ms", scheme=SEG_HASH_SCHEME,
        )

    return run_units_resumable(
        input_dir, out_dir, process_unit,
        shards_per_unit=shards_per_unit, max_units=max_units,
        summary_key="segments_out",
    )


AUG_HASH_SCHEME = "aug-fnv1a64-v1"


def _augment_hash_column(batch: pa.Table) -> pa.Table:
    """Order-insensitive per-row hash over (clip_id, variant,
    aug_dur_ms) — same composed-column + Arrow-buffer FNV discipline
    as the other manifest hashes. The augmented payload is
    deliberately NOT hashed: it is a pure deterministic function of
    (parent payload, variant) — the noise stream is seeded by
    FNV(clip_id|variant), pinned byte-deterministic in test_round5b —
    so row identity ⇒ payload identity and the manifest pass stays
    payload-free."""
    return _hash_composed(
        batch,
        batch.column("clip_id").cast(pa.string()),
        batch.column("variant"),
        batch.column("aug_dur_ms").cast(pa.string()),
    )


def run_augment_resumable(
    input_dir: str,
    out_dir: str,
    shards_per_unit: int = 4,
    max_units: int | None = None,
    **aug_kwargs,
) -> dict:
    """Resumable augmentation EXPORT — the third consumer of the
    shared lineage surface (``run_units_resumable``): per shard-group
    unit → ``augment_clips_over(..., emit_payload=True)`` (one
    streaming map_batches, per-row-seeded deterministic variants, no
    shuffle) → hash column → tmp-write + rename publish + manifest
    record (clips_in / rows_out / total augmented ms / hash / wall).
    Determinism of the augmentation makes the export exactly
    resumable: a redone unit reproduces byte-identical payloads."""
    from ..pipelines.multimodal import augment_clips_over

    def process_unit(files: list[str], tmp: str) -> dict:
        return _payload_export_unit(
            files, tmp,
            transform=lambda ds: augment_clips_over(ds, emit_payload=True, **aug_kwargs),
            hash_column=_augment_hash_column,
            dur_col="aug_dur_ms", rows_key="rows_out",
            ms_key="total_augmented_ms", scheme=AUG_HASH_SCHEME,
        )

    return run_units_resumable(
        input_dir, out_dir, process_unit,
        shards_per_unit=shards_per_unit, max_units=max_units,
        summary_key="rows_out",
    )
