"""Round-3 regression pins: vectorized FNV sampling hash, the
broadcast↔shuffle crossover equivalence for the J1/J2 joins, and the
degenerate-group guard in grouped_quantile_disc."""

import os
import sys

import numpy as np
import pyarrow as pa
import ray.data as rd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


def test_fnv1a_64_ints_matches_scalar():
    """Vectorized decimal-int FNV == byte-wise scalar FNV, including
    0, negatives, and 19-digit values (padded-matrix edge widths)."""
    from longqc_ray.kernels.text import fnv1a_64, fnv1a_64_ints

    ids = np.array(
        [0, 1, 9, 10, 101, -1, -987654321, 2**62, -(2**62), 1234567890123456789],
        dtype=np.int64,
    )
    got = fnv1a_64_ints(ids)
    want = np.array([fnv1a_64(str(int(i)).encode()) for i in ids], dtype=np.uint64)
    assert (got == want).all()


def test_anti_semi_crossover_branches_identical(monkeypatch):
    """control_anti_join / sample_semi_join: the shuffled large-scale
    branch (cap forced to -1) returns exactly the broadcast branch's
    rows, with identical dtypes (no float64 widening of int columns)."""
    import pandas as pd

    from longqc_ray.pipelines import relational

    def canon(ds):
        df = ds.to_pandas()
        return df.sort_values(sorted(df.columns), kind="stable").reset_index(drop=True)[
            sorted(df.columns)
        ]

    for fn in (relational.control_anti_join, relational.sample_semi_join):
        monkeypatch.setattr(relational, "FILTER_KEYS_BROADCAST_CAP", 5_000_000)
        small = canon(fn(SF_DIR))
        monkeypatch.setattr(relational, "FILTER_KEYS_BROADCAST_CAP", -1)
        big = canon(fn(SF_DIR))
        pd.testing.assert_frame_equal(small, big)
        assert all(not str(t).startswith("float") or c.endswith("frac")
                   for c, t in big.dtypes.items() if c.endswith("_id") or c.endswith("id"))


def test_grouped_quantile_disc_all_degenerate():
    """ADVICE repro: every group min==max — must return per-group
    constants, not crash on an empty refinement interval list."""
    from longqc_ray.functions.stats import grouped_quantile_disc

    ds = rd.from_arrow(pa.table({
        "k": ["a"] * 7 + ["b"] * 3,
        "v": [10] * 7 + [5] * 3,
    }))
    got = grouped_quantile_disc(ds, "k", "v", [0.1, 0.5, 0.99])
    assert got == {"a": [10.0, 10.0, 10.0], "b": [5.0, 5.0, 5.0]}

    got2, stats = grouped_quantile_disc(ds, "k", "v", [0.5], with_stats=True)
    assert got2 == {"a": [10.0], "b": [5.0]}
    assert stats["a"][0] == 7 and int(stats["a"][1]) == 70
    assert stats["b"][0] == 3 and int(stats["b"][1]) == 15


def test_file_attributes_footer_map(tmp_path):
    """S8 analogue: per-file footer attribute rows — counts match the
    written tables, schema fingerprints equal iff schemas equal."""
    import pyarrow.parquet as pq

    from longqc_ray.sources.ingest import file_attributes

    a = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
    b = pa.table({"x": pa.array([4, 5], pa.int64())})
    c = pa.table({"y": pa.array(["z"], pa.string())})
    pq.write_table(a, tmp_path / "a.parquet")
    pq.write_table(b, tmp_path / "b.parquet")
    pq.write_table(c, tmp_path / "c.parquet")

    out = file_attributes(str(tmp_path)).to_pandas().sort_values("path").reset_index(drop=True)
    assert len(out) == 3
    assert out["n_rows"].tolist() == [3, 2, 1]
    assert out["n_columns"].tolist() == [1, 1, 1]
    fps = out["schema_fp"].tolist()
    assert fps[0] == fps[1] and fps[0] != fps[2]
    assert (out["file_bytes"] > 0).all()

    # glob + single-file forms agree with the dir form
    one = file_attributes(str(tmp_path / "a.parquet")).to_pandas()
    assert one["n_rows"].tolist() == [3]


def test_repetition_mask_batch_bit_equal():
    """Whole-batch SDUST kernel == per-doc kernel on adversarial texts
    (empty/tiny/unicode/repetitive/long) across parameter sets."""
    from longqc_ray.kernels.text import repetition_mask, repetition_mask_batch

    rng = np.random.default_rng(17)
    alpha = np.array(list("abcdefgh "))
    texts = ["", "a", "abc", "aaaa" * 50, "x" * 63, "y" * 64, "z" * 65,
             "héllo wörld ✓ " * 9]
    texts += ["".join(rng.choice(alpha, size=rng.integers(0, 300))) for _ in range(80)]
    texts += ["".join(rng.choice(alpha, size=8)) * rng.integers(2, 25) for _ in range(20)]
    for k, w, th in [(3, 64, 1.5), (2, 32, 1.0)]:
        mfb, mcb, ncb = repetition_mask_batch(texts, k, w, th)
        for i, t in enumerate(texts):
            assert repetition_mask(t, k, w, th) == (mfb[i], mcb[i], ncb[i]), (i, k, w)


def test_connected_components_lp_matches_union_find():
    """Distributed min-label propagation == driver union-find on a
    planted graph with chains (pointer-jump path), cliques, and
    singleton-free node sets."""
    import pandas as pd

    from longqc_ray.pipelines.dedup import (
        _connected_components,
        connected_components_lp,
    )

    rng = np.random.default_rng(23)
    edges = []
    # long chain 100..120 (exercises pointer jumping)
    edges += [(i, i + 1) for i in range(100, 112)]
    # clique on {5, 9, 13, 17}
    cl = [5, 9, 13, 17]
    edges += [(a, b) for i, a in enumerate(cl) for b in cl[i + 1:]]
    # random sparse pairs
    for _ in range(15):
        a, b = rng.integers(200, 260, size=2)
        if a != b:
            edges.append((int(min(a, b)), int(max(a, b))))
    df = pd.DataFrame(edges, columns=["a", "b"])

    want = _connected_components(df)
    got = connected_components_lp(rd.from_arrow(pa.table({
        "a": pa.array(df["a"], pa.int64()),
        "b": pa.array(df["b"], pa.int64()),
    }))).to_pandas()
    got_map = dict(zip(got["node"].astype(int), got["label"].astype(int)))
    assert got_map == want


def test_dedup_minhash_distributed_components_identical():
    """components='distributed' (label propagation) must emit the
    exact same verdict table as the driver union-find path."""
    from longqc_ray.pipelines.dedup import dedup_minhash

    sf = "/root/testdata/sf0.001"
    a = dedup_minhash(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        dedup_minhash(sf, components="distributed")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b)
    assert (~a["keep"]).sum() > 0  # planted dups actually exercised
