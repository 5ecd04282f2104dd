"""Kill-and-resume: interrupted run + resume == fresh full run.

BASELINE.md §2 resume gate: per-partition lineage manifest, atomic
partition rename, skip-if-done. The 'kill' is simulated by max_units.
"""

import glob
import json
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from longqc_ray.sources.lineage import (
    completed_units,
    manifest_path,
    run_filter_resumable,
)


def _read_all(out_dir):
    files = sorted(glob.glob(os.path.join(out_dir, "parts", "*", "*.parquet")))
    df = pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)
    return df.sort_values("clip_id").reset_index(drop=True)


@pytest.fixture(scope="module")
def clips_dir(tiny_fixture_dir):
    return os.path.join(tiny_fixture_dir, "clips")


def test_interrupt_then_resume_equals_fresh(clips_dir, tmp_path_factory):
    fresh_dir = str(tmp_path_factory.mktemp("fresh"))
    resum_dir = str(tmp_path_factory.mktemp("resumed"))

    full = run_filter_resumable(clips_dir, fresh_dir, shards_per_unit=1)
    assert full["units_run"] == 4  # tiny fixture has 4 shards

    # simulated crash after 2 units
    part = run_filter_resumable(clips_dir, resum_dir, shards_per_unit=1, max_units=2)
    assert part["units_run"] == 2
    assert len(completed_units(resum_dir)) == 2

    # resume: skips the 2 finished units, runs the rest
    rest = run_filter_resumable(clips_dir, resum_dir, shards_per_unit=1)
    assert rest["units_skipped"] == 2
    assert rest["units_run"] == 2

    a = _read_all(fresh_dir)
    b = _read_all(resum_dir)
    assert a["clip_id"].tolist() == b["clip_id"].tolist()
    assert a["scrubbed_transcript"].tolist() == b["scrubbed_transcript"].tolist()

    # manifests carry matching content hashes per unit
    def hashes(d):
        with open(manifest_path(d)) as f:
            return {
                j["unit"]: j["content_hash_xor"]
                for j in (json.loads(line) for line in f if line.strip())
            }

    assert hashes(fresh_dir) == hashes(resum_dir)


def test_rerun_is_noop(clips_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("noop"))
    run_filter_resumable(clips_dir, out, shards_per_unit=2)
    again = run_filter_resumable(clips_dir, out, shards_per_unit=2)
    assert again["units_run"] == 0
    assert again["units_skipped"] == 2


def test_segment_export_interrupt_then_resume_equals_fresh(clips_dir, tmp_path_factory):
    """The SECOND lineage consumer (VAD segment export) honors the same
    contract: interrupted run + resume == fresh full run, manifest
    hashes recomputable from the written narrow columns."""
    import numpy as np

    from longqc_ray.sources.lineage import SEG_HASH_SCHEME, run_segments_resumable

    fresh = str(tmp_path_factory.mktemp("seg_fresh"))
    killed = str(tmp_path_factory.mktemp("seg_killed"))

    run_segments_resumable(clips_dir, fresh, shards_per_unit=2)
    r1 = run_segments_resumable(clips_dir, killed, shards_per_unit=2, max_units=1)
    assert r1["units_run"] == 1
    r2 = run_segments_resumable(clips_dir, killed, shards_per_unit=2)
    assert r2["units_skipped"] == 1 and r2["units_run"] >= 1

    def read_all(out):
        files = sorted(glob.glob(os.path.join(out, "parts", "*", "*.parquet")))
        df = pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)
        return df.sort_values(["clip_id", "seg_idx"]).reset_index(drop=True)

    a, b = read_all(fresh), read_all(killed)
    assert len(a) == len(b) > 0
    pd.testing.assert_frame_equal(a, b)
    # manifest: per-unit xor hash recomputes from the written rows
    for line in open(manifest_path(fresh)):
        rec = json.loads(line)
        assert rec["hash_scheme"] == SEG_HASH_SCHEME
        part = os.path.join(fresh, "parts", rec["unit"])
        fs = glob.glob(os.path.join(part, "*.parquet"))
        hashes = (
            pd.concat([pq.read_table(f, columns=["row_hash"]).to_pandas() for f in fs])
            ["row_hash"].to_numpy().astype(np.uint64)
            if fs else np.array([], dtype=np.uint64)
        )
        assert rec["segments_out"] == hashes.size
        assert rec["content_hash_xor"] == int(
            np.bitwise_xor.reduce(hashes, initial=np.uint64(0))
        )
    # third run is a no-op
    r3 = run_segments_resumable(clips_dir, killed, shards_per_unit=2)
    assert r3 == {"units_run": 0, "units_skipped": 2, "segments_out": 0}


def test_corrupt_shard_fails_loudly_and_resume_redoes_only_it(clips_dir, tmp_path_factory):
    """A corrupt input shard must abort ITS unit with an exception —
    no manifest row, no published partition — while units already
    manifested stay done; after the shard is repaired, resume runs
    only the failed unit and the final output equals a fresh run."""
    import shutil

    from longqc_ray.sources.lineage import run_segments_resumable

    work = str(tmp_path_factory.mktemp("corrupt_in"))
    out = str(tmp_path_factory.mktemp("corrupt_out"))
    shards = sorted(glob.glob(os.path.join(clips_dir, "*.parquet")))
    for s in shards:
        shutil.copy(s, work)
    names = sorted(os.listdir(work))
    # corrupt a shard of the SECOND unit (shards_per_unit=2)
    victim = os.path.join(work, names[2])
    with open(victim, "wb") as f:
        f.write(b"not a parquet file")
    with pytest.raises(Exception):
        run_segments_resumable(work, out, shards_per_unit=2)
    done = completed_units(out)
    assert "unit-00001" not in done  # failed unit left no manifest row
    assert not os.path.exists(os.path.join(out, "parts", "unit-00001"))
    # repair and resume: only the failed/remaining units run
    shutil.copy(os.path.join(clips_dir, names[2]), victim)
    r = run_segments_resumable(work, out, shards_per_unit=2)
    assert r["units_skipped"] == len(done) >= 1
    # equals a fresh full run
    fresh = str(tmp_path_factory.mktemp("corrupt_fresh"))
    run_segments_resumable(clips_dir, fresh, shards_per_unit=2)

    def read_all(o):
        fs = sorted(glob.glob(os.path.join(o, "parts", "*", "*.parquet")))
        df = pd.concat([pq.read_table(f).to_pandas() for f in fs], ignore_index=True)
        return df.sort_values(["clip_id", "seg_idx"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(read_all(out), read_all(fresh))


def test_resume_rejects_changed_unit_grouping(clips_dir, tmp_path_factory):
    """A resume with a different shards_per_unit would silently skip
    units covering DIFFERENT shards — the manifest's recorded file
    list is the unit's identity and a mismatch must raise."""
    import pytest

    out = str(tmp_path_factory.mktemp("regroup"))
    run_filter_resumable(clips_dir, out, shards_per_unit=1, max_units=1)
    with pytest.raises(ValueError, match="shards_per_unit"):
        run_filter_resumable(clips_dir, out, shards_per_unit=2)
    # same grouping still resumes cleanly
    s = run_filter_resumable(clips_dir, out, shards_per_unit=1)
    assert s["units_skipped"] == 1 and s["units_run"] >= 1


def test_augment_export_interrupt_then_resume_equals_fresh(clips_dir, tmp_path_factory):
    """Kill-and-resume for the augmentation export: interrupted run +
    resume produces the same manifest totals and byte-identical unit
    hashes as one uninterrupted run (augmentation is per-row seeded,
    so redone units reproduce exactly)."""
    import json as _json

    from longqc_ray.sources.lineage import manifest_path, run_augment_resumable

    fresh = str(tmp_path_factory.mktemp("aug_fresh"))
    full = run_augment_resumable(clips_dir, fresh, shards_per_unit=1)
    assert full["units_run"] >= 3 and full["rows_out"] > 0

    part_dir = str(tmp_path_factory.mktemp("aug_resume"))
    part = run_augment_resumable(clips_dir, part_dir, shards_per_unit=1, max_units=2)
    assert part["units_run"] == 2
    rest = run_augment_resumable(clips_dir, part_dir, shards_per_unit=1)
    assert rest["units_skipped"] == 2
    assert part["rows_out"] + rest["rows_out"] == full["rows_out"]

    def unit_hashes(d):
        return {
            r["unit"]: (r["content_hash_xor"], r["rows_out"], r["hash_scheme"])
            for r in map(_json.loads, open(manifest_path(d)))
        }

    assert unit_hashes(fresh) == unit_hashes(part_dir)
