"""Flagship exact-dedup engine paths: narrow dup scan (driver-merge vs
grouped-sum switchover), rare-dup claim protocol (sharded router,
retry idempotence, distinct-batch disambiguation), dense fallback."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from longqc_ray.pipelines import quality_filter as qf


def _clip_table(ids):
    return pa.table({
        "clip_id": pa.array(list(ids), pa.string()),
        "x": pa.array(np.arange(len(ids)), pa.int64()),
    })


def _ds(ids, blocks=4):
    return rd.from_arrow(_clip_table(ids)).repartition(blocks)


IDS = [f"c{i:04d}" for i in range(200)] + ["c0007", "c0019", "c0019"]


def test_find_dup_keys_driver_and_shuffle_paths_agree(monkeypatch):
    want = ["c0007", "c0019"]
    got_driver = qf.find_dup_keys(_ds(IDS))
    assert got_driver.to_pylist() == want
    # force the grouped-sum shuffle branch at the cap boundary
    monkeypatch.setattr(qf, "DUP_SCAN_DRIVER_CAP", 0)
    got_shuffle = qf.find_dup_keys(_ds(IDS))
    assert got_shuffle.to_pylist() == want


def test_dedup_first_rare_and_dense_paths_agree(monkeypatch):
    out = qf.dedup_first(_ds(IDS, blocks=8)).to_pandas()
    assert sorted(out["clip_id"]) == sorted(set(IDS))
    # dense fallback (hash-partition shuffle) — same surviving key set
    monkeypatch.setattr(qf, "DUP_BROADCAST_CAP", 0)
    out2 = qf.dedup_first(_ds(IDS, blocks=8)).to_pandas()
    assert sorted(out2["clip_id"]) == sorted(set(IDS))


def test_claim_router_sharded_exactly_once():
    import ray

    r = qf._ClaimRouter(n_shards=3)
    keys = [f"k{i}" for i in range(40)]
    granted = r.claim(keys, token=111)
    assert all(granted)  # first claimant wins everywhere
    # same token (task retry): grants reproduce exactly
    assert r.claim(keys, token=111) == granted
    # different token (different batch): all denied
    assert not any(r.claim(keys, token=222))


def test_distinct_batches_same_ask_set_claim_once():
    """Regression (round-1 advice): two DIFFERENT batches each holding
    one copy of the same dup key must not both win — the token is the
    full ordered key list, which differs via the unique keys."""
    dup_ref = __import__("ray").put(pa.array(["d"], pa.string()))
    router = qf._ClaimRouter(n_shards=2)
    stage = qf._DedupStage("clip_id", dup_ref, router)
    t1 = _clip_table(["d", "a1"])
    t2 = _clip_table(["d", "b2"])
    kept1 = stage(t1).column("clip_id").to_pylist()
    kept2 = stage(t2).column("clip_id").to_pylist()
    assert ("d" in kept1) != ("d" in kept2), (kept1, kept2)
    assert "a1" in kept1 and "b2" in kept2
    # task retry of the first batch reproduces its grant exactly
    kept1_retry = stage(t1).column("clip_id").to_pylist()
    assert kept1_retry == kept1
