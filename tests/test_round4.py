"""Round-4 pins: 128-bit content fingerprint, Arrow-buffer FNV
hashing, bigram broadcast/join crossover, grouped-quantile
high-cardinality fallback, large_binary payload offsets, LSH hot-
bucket cap, S7 sidecar ingest, and the reservoir parity harness
(SURVEY §7.3.1)."""

import logging
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


# ---------------------------------------------------------- fingerprints

def _fnv_py(data: bytes, basis: int, prime: int) -> int:
    h = basis
    for b in data:
        h ^= b
        h = (h * prime) & 0xFFFFFFFFFFFFFFFF
    return h


def test_content_fp128_two_independent_folds():
    from longqc_ray.kernels.text import FNV2_BASIS, FNV2_PRIME, content_fp128

    texts = ["hello", "", "a" * 300, "hello", "héllo", "x\ty"]
    h1, h2 = content_fp128(texts)
    for i, t in enumerate(texts):
        b = t.encode("utf-8", "replace")
        assert int(h1[i]) == _fnv_py(b, 0xCBF29CE484222325, 0x100000001B3)
        assert int(h2[i]) == _fnv_py(b, int(FNV2_BASIS), int(FNV2_PRIME))
    # identical text -> identical pair; distinct text -> distinct pair
    assert (h1[0], h2[0]) == (h1[3], h2[3])
    assert (h1[0], h2[0]) != (h1[1], h2[1])


def test_fnv1a_64_arrow_matches_strs_and_large_string():
    from longqc_ray.kernels.text import fnv1a_64_arrow, fnv1a_64_strs

    vals = ["", "a", "abc" * 50, "clip_000042", "héllo wörld"]
    expect = fnv1a_64_strs(vals)
    for typ in (pa.string(), pa.large_string()):
        col = pa.array(vals, typ)
        got = fnv1a_64_arrow(col)
        assert (got == expect).all(), typ
    # sliced array (non-zero offset) must hash the same values
    col = pa.array(["pad1", "pad2"] + vals).slice(2)
    assert (fnv1a_64_arrow(col) == expect).all()
    # chunk-boundary invariance via the chunk parameter
    assert (fnv1a_64_arrow(pa.array(vals * 100), chunk=7)
            == np.tile(expect, 100)).all()


def test_part_hash_string_batch_invariance():
    from longqc_ray.pipelines.util import _part_hash

    t_small = pa.table({"k": ["aa", "bb"]})
    t_big = pa.table({"k": ["aa", "a-much-longer-key-widening-the-batch", "bb"]})
    a = _part_hash(t_small, "k", 64)
    b = _part_hash(t_big, "k", 64)
    assert a[0] == b[0] and a[1] == b[2]  # same key -> same partition


# ---------------------------------------------------------- bigram crossover

def test_bigram_collocations_join_path_equals_broadcast(ray_session):
    from longqc_ray.pipelines.text_analysis import bigram_collocations

    broad = bigram_collocations(SF001, min_count=2)
    joined = bigram_collocations(SF001, min_count=2, broadcast_cap=0)
    pd.testing.assert_frame_equal(broad, joined)
    assert len(broad) > 0


# ---------------------------------------------------------- grouped quantiles

def test_grouped_quantile_partitioned_equals_dense(ray_session):
    from longqc_ray.functions.stats import grouped_quantile_disc

    rng = np.random.default_rng(11)
    n = 20_000
    df = pd.DataFrame({
        "k": rng.integers(0, 400, n),
        "v": np.round(rng.normal(size=n), 6),
    })
    ds = rd.from_pandas(df)
    qs = [0.25, 0.5, 0.95]
    dense, dstats = grouped_quantile_disc(
        ds, "k", "v", qs, with_stats=True, max_dense_groups=10**9
    )
    part, pstats = grouped_quantile_disc(
        ds, "k", "v", qs, with_stats=True, max_dense_groups=10
    )
    assert set(dense) == set(part)
    for k in dense:
        assert dense[k] == part[k], k
        assert dstats[k][0] == pstats[k][0]
        assert abs(dstats[k][1] - pstats[k][1]) < 1e-9
    # exactness vs pandas quantile_disc semantics (inverted_cdf)
    g = df.groupby("k")["v"]
    for k in list(dense)[:20]:
        v = np.sort(g.get_group(k).to_numpy())
        for q, got in zip(qs, part[k]):
            r = min(max(int(np.ceil(q * v.size)) - 1, 0), v.size - 1)
            assert got == v[r]


# ---------------------------------------------------------- payload offsets

def test_payload_arrays_large_binary_offsets():
    from longqc_ray.pipelines.multimodal import _payload_arrays

    payloads = [b"\x00\x01\x02", b"", b"\xff" * 10]
    base = {
        "clip_id": pa.array(["a", "b", "c"]),
        "codec": pa.array(["pcm16", "pcm16", "mulaw"]),
    }
    small = pa.table({**base, "bytes": pa.array(payloads, pa.binary())})
    big = pa.table({**base, "bytes": pa.array(payloads, pa.large_binary())})
    ids_s, cod_s, offs_s, data_s = _payload_arrays(small)
    ids_b, cod_b, offs_b, data_b = _payload_arrays(big)
    assert (offs_s == offs_b).all()
    assert bytes(data_s[offs_s[2]:offs_s[3]]) == payloads[2]
    assert bytes(data_b[offs_b[2]:offs_b[3]]) == payloads[2]
    with pytest.raises(TypeError):
        _payload_arrays(pa.table({**base, "bytes": pa.array(["not", "binary", "col"])}))


# ---------------------------------------------------------- LSH bucket cap

def test_lsh_bucket_cap_warns_and_truncates(caplog):
    from longqc_ray.pipelines.similarity import _cap_bucket_ids

    ids = np.arange(10, dtype=np.int64)
    with caplog.at_level(logging.WARNING, logger="longqc_ray.pipelines.similarity"):
        out = _cap_bucket_ids(ids, 4)
    assert (out == ids[:4]).all()
    assert any("bucket truncated" in r.message for r in caplog.records)
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="longqc_ray.pipelines.similarity"):
        out = _cap_bucket_ids(ids, 64)
    assert out is ids and not caplog.records


def test_lsh_capped_pairs_subset_of_uncapped(ray_session):
    from longqc_ray.pipelines.similarity import embedding_near_dups_lsh

    full = embedding_near_dups_lsh(SF001, tau=0.3)
    capped = embedding_near_dups_lsh(SF001, tau=0.3, bucket_cap=3)
    fs = set(map(tuple, full[["a_id", "b_id"]].to_numpy()))
    cs = set(map(tuple, capped[["a_id", "b_id"]].to_numpy()))
    assert cs <= fs


# ---------------------------------------------------------- S7 sidecar

def _write_sidecars(tmp_path):
    xml = tmp_path / "run42.sts.xml"
    xml.write_text(
        """<RunStats run="run42">
  <ProdDist>
    <BinLabels><BinLabel>Empty</BinLabel><BinLabel>Productive</BinLabel><BinLabel>Other</BinLabel></BinLabels>
    <BinCounts><BinCount>10</BinCount><BinCount>85</BinCount><BinCount>5</BinCount></BinCounts>
  </ProdDist>
</RunStats>"""
    )
    csvf = tmp_path / "run42.sts.csv"
    csvf.write_text(
        "Channel,HQRegionStart,HQRegionEnd,ReadScore\n"
        "0,100,1100,0.80\n1,0,500,0.90\n2,50,250,0.70\n"
    )
    return str(xml), str(csvf)


def test_sidecar_parsers(tmp_path):
    from longqc_ray.sources.sidecar import load_run_metadata

    xml, csvf = _write_sidecars(tmp_path)
    mx = load_run_metadata(xml)
    assert mx["run_id"] == "run42"
    assert (mx["run_n_empty"], mx["run_n_productive"], mx["run_n_other"]) == (10, 85, 5)
    assert mx["run_productive_frac"] == 85 / 100
    mc = load_run_metadata(csvf)
    assert mc["run_n_channels"] == 3
    assert abs(mc["run_mean_read_score"] - 0.8) < 1e-12
    assert mc["run_total_hq_len"] == 1000 + 500 + 200
    with pytest.raises(ValueError):
        load_run_metadata(str(tmp_path / "nope.bin"))


def test_qc_summary_merges_sidecar(ray_session, tiny_fixture_dir, tmp_path):
    from longqc_ray.pipelines.qc_summary import qc_summary
    from longqc_ray.pipelines.quality_filter import label_clips

    xml, _ = _write_sidecars(tmp_path)
    ds = rd.read_parquet(os.path.join(tiny_fixture_dir, "clips"))
    rep = qc_summary(label_clips(ds), sidecar=xml)
    assert rep["run_n_productive"] == 85
    assert rep["run_productive_frac"] == 0.85
    assert rep["n_clips"] > 0  # engine scalars still present


# ---------------------------------------------------------- reservoir parity

def test_reservoir_parity_harness(ray_session, tiny_fixture_dir):
    """SURVEY §7.3.1 parity harness: the literal chunk-reseeded
    Algorithm-R (functions/sampling.reservoir_reference, the faithful
    lq_utils.py:371-411 twin) run beside the engine's order-canonical
    bottom-k on the SAME key universe.

    Documents (a) WHY the deviation: the reference selection CHANGES
    with chunk boundaries (same data, different chunking -> different
    sample), while bottom-k is invariant; (b) the measured selection
    overlap between the two uniform samplers sits in the
    hypergeometric band E=k²/n ± 6σ. Overlap recorded in COVERAGE.md."""
    import pyarrow.parquet as pq

    from longqc_ray.functions.sampling import bottomk_sample, reservoir_reference

    cids = sorted(set(
        pq.read_table(
            os.path.join(tiny_fixture_dir, "clips"), columns=["clip_id"]
        ).column("clip_id").to_pylist()
    ))  # the fixture plants duplicate clip_ids; sample the id universe
    n, k = len(cids), 100
    rows = [(c,) for c in cids]

    ref_a = {r[0] for r in reservoir_reference(rows, k, chunk_size=128)}
    ref_b = {r[0] for r in reservoir_reference(rows, k, chunk_size=200)}
    assert len(ref_a) == len(ref_b) == k
    # chunk-boundary DEPENDENCE of the literal reference algorithm —
    # the documented reason the engine uses order-canonical bottom-k
    assert ref_a != ref_b

    ds = rd.from_arrow(pa.table({"clip_id": pa.array(cids)}))
    eng = set(bottomk_sample(ds, "clip_id", k).column("clip_id").to_pylist())
    assert len(eng) == k
    # overlap with the reference sampler ~ Hypergeometric(n, k, k)
    mean = k * k / n
    sd = np.sqrt(k * (k / n) * (1 - k / n) * ((n - k) / max(n - 1, 1)))
    ov = len(eng & ref_a)
    assert abs(ov - mean) <= 6 * sd + 1, (
        f"overlap {ov} outside E={mean:.1f} ± {6 * sd:.1f}"
    )


# ------------------------------------------------- round-4 perf utilities

def test_read_parallelism_policy():
    """Block count follows data size: 1 block for tiny dims, CPU-bounded
    for bench tables, bytes/32MiB-dominated at scale."""
    from longqc_ray.pipelines.util import read_parallelism

    assert read_parallelism(2_000) == 1                 # nation-sized
    assert read_parallelism(600 << 10) <= 32            # documents-sized
    assert read_parallelism(600 << 10) >= 4
    # 1 TiB → ~32k blocks of ~32 MiB, CPU floor irrelevant
    assert read_parallelism(1 << 40) == (1 << 40) // (32 << 20)


def test_parquet_ts_bounds_matches_aggregate(tmp_path):
    import pyarrow.parquet as pq

    from longqc_ray.pipelines.util import parquet_ts_bounds

    ts = pa.array(
        np.array([10, 99, 5, 42], dtype="datetime64[us]"), pa.timestamp("us")
    )
    pq.write_table(pa.table({"ts": ts}), str(tmp_path / "t.parquet"))
    b = parquet_ts_bounds(str(tmp_path), "t", "ts")
    assert b == (5, 99)
    assert parquet_ts_bounds(str(tmp_path), "t", "nope") is None


def test_local_topk_total_order_and_empty(ray_session):
    from longqc_ray.pipelines.util import local_topk

    rng = np.random.default_rng(7)
    v = rng.integers(0, 50, size=5000)
    k_ = np.arange(5000, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"v": pa.array(v, pa.int64()),
                                 "id": pa.array(k_, pa.int64())})).repartition(9)
    got = local_topk(ds, ["v", "id"], [True, False], 37).to_pandas()
    exp = (pd.DataFrame({"v": v, "id": k_})
           .sort_values(["v", "id"], ascending=[False, True]).head(37)
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["v", "id"]], exp)
    # empty input keeps the schema (zero-column-block guard)
    empty = rd.from_arrow(pa.table({"v": pa.array([], pa.int64()),
                                    "id": pa.array([], pa.int64())}))
    out = local_topk(empty, ["v", "id"], [True, False], 5)
    assert out.num_rows == 0 and set(out.column_names) == {"v", "id"}


def test_hash_grouped_agg_matches_pandas(ray_session):
    from longqc_ray.pipelines.util import hash_grouped_agg

    rng = np.random.default_rng(11)
    key = rng.integers(0, 200, size=20000).astype(np.int64)
    val = rng.integers(-1000, 1000, size=20000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": pa.array(key), "v": pa.array(val)})).repartition(7)
    got = (
        hash_grouped_agg(ds, keys=["k"], mins={"v": "vmin"},
                         sums={"v": "vsum"}, count_alias="n")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    exp = (pd.DataFrame({"k": key, "v": val}).groupby("k")
           .agg(vmin=("v", "min"), vsum=("v", "sum"), n=("v", "size"))
           .reset_index())
    for c in ("k", "vmin", "vsum", "n"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    # same column in mins and sums without aliases must fail loudly
    import pytest as _pt
    with _pt.raises(ValueError):
        hash_grouped_agg(ds, keys=["k"], mins=("v",), sums=("v",))


def test_q10_driver_and_shuffle_paths_equal(ray_session, monkeypatch):
    """returned_item_revenue: the driver-merge branch (customer count
    under Q10_DRIVER_CAP) and the hash-co-group + local_topk scale
    branch must produce identical top-k."""
    from longqc_ray.pipelines import relational

    a = relational.returned_item_revenue(SF001)
    monkeypatch.setattr(relational, "Q10_DRIVER_CAP", -1)
    b = relational.returned_item_revenue(SF001)
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


# -------------------------------------------- code-review regression pins

def test_fnv_arrow_long_outlier_and_sorted_chunking():
    """One long value among many short ones must not blow the padded
    matrix up to rows × max_len (length-sorted cell-budget chunking);
    hashes stay bit-equal to the reference under any chunking."""
    from longqc_ray.kernels.text import fnv1a_64_arrow, fnv1a_64_strs

    vals = ["x" * 3, "", "abc"] * 50 + ["L" * 200_000] + ["tail"] * 7
    expect = fnv1a_64_strs(vals)
    for chunk in (4, 65536):
        got = fnv1a_64_arrow(pa.array(vals), chunk=chunk)
        assert (got == expect).all(), chunk


def test_ascii_class_counts_large_string():
    from longqc_ray.kernels.text import ascii_class_counts

    vals = ["abc 123 don't", "héllo wörld 9", ""]
    small = ascii_class_counts(pa.array(vals, pa.string()))
    large = ascii_class_counts(pa.array(vals, pa.large_string()))
    for k in small:
        assert (small[k] == large[k]).all(), k


def test_asof_int_on_column_above_2_53(ray_session):
    """Integer as-of on-columns ≥ 2^53 must keep exact int ordering
    (the nullable-int float64 round-trip would collapse neighbors)."""
    from longqc_ray.pipelines.util import asof_merge_tagged

    base = 2**53
    # two right rows 1 apart just below the left time; float64 would
    # make base+2 and base+3 indistinguishable (both round to base+2)
    lt = [base + 4, base + 10]
    rt = [base + 2, base + 3]
    t = pa.table({
        "lid": pa.array([1, 2, None, None], pa.int64()),
        "rid": pa.array([None, None, 10, 11], pa.int64()),
        "k": pa.array([1, 1, 1, 1], pa.int64()),
        "t": pa.array(lt + [None, None], pa.int64()),
        "rt": pa.array([None, None] + rt, pa.int64()),
        "__part": pa.array([0, 0, 0, 0], pa.int64()),
        "__side": pa.array(["l", "l", "r", "r"]),
    })
    out = asof_merge_tagged(
        rd.from_arrow(t),
        l_cols=["lid", "k", "t"], r_cols=["rid", "k", "rt"],
        by="k", left_on="t", right_on="rt",
    ).to_pandas()
    # both left rows must match the LATEST right row (base+3), which
    # float64 ordering could miss
    m = {int(r["t"]): int(r["rt"]) for _, r in out.iterrows()}
    assert m == {base + 4: base + 3, base + 10: base + 3}
