"""Similarity-search tests: brute-force exactness vs a local numpy
oracle, LSH recall vs brute force, near-dup pair detection on planted
clusters."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def emb_dir(tmp_path_factory):
    """Synthetic embeddings with planted structure: 8 gaussian clusters
    + a few exact near-duplicate vectors."""
    rng = np.random.default_rng(77)
    d, n_clusters, per = 32, 8, 40
    centers = rng.standard_normal((n_clusters, d)) * 3.0
    vecs, labels = [], []
    for c in range(n_clusters):
        vecs.append(centers[c] + rng.standard_normal((per, d)) * 0.5)
        labels += [c] * per
    m = np.concatenate(vecs)
    # planted near-dups of vectors 0..4: tiny perturbation → cos ≈ 1
    dups = m[:5] + rng.standard_normal((5, d)) * 1e-3
    m = np.concatenate([m, dups])
    labels += labels[:5]
    tbl = pa.table({
        "vec_id": pa.array(np.arange(m.shape[0]), pa.int64()),
        "embedding": pa.array([row.astype(np.float32).tolist() for row in m],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    p = tmp_path_factory.mktemp("emb")
    pq.write_table(tbl, p / "embeddings.parquet")
    return str(p), m.astype(np.float64)


def _local_topk(m, k=5, n_q=10):
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn[:n_q] @ mn.T
    out = {}
    for q in range(n_q):
        s = sims[q].copy()
        order = sorted(range(len(s)), key=lambda i: (-s[i], i))
        out[q] = [i for i in order if i != q][:k]
    return out


def test_ann_topk_matches_numpy_oracle(emb_dir):
    from longqc_ray.pipelines.similarity import ann_topk

    path, m = emb_dir
    got = ann_topk(path)
    oracle = _local_topk(m)
    for q, grp in got.groupby("query_id"):
        assert grp.sort_values("rank")["neighbor_id"].tolist() == oracle[int(q)]


def test_ann_lsh_recall(emb_dir):
    from longqc_ray.pipelines.similarity import ann_lsh, ann_topk

    path, _ = emb_dir
    exact = ann_topk(path)
    approx = ann_lsh(path)
    hits = 0
    total = 0
    for q, grp in exact.groupby("query_id"):
        e = set(grp["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        hits += len(e & a)
        total += len(e)
    assert hits / total >= 0.6, f"LSH recall too low: {hits}/{total}"


def test_embedding_near_dups_finds_planted(emb_dir):
    from longqc_ray.pipelines.similarity import embedding_near_dups

    path, m = emb_dir
    # stride=1: all vectors on the left side (small corpus)
    pairs = embedding_near_dups(path, tau=0.999, stride=1)
    got = set(zip(pairs["a_id"].astype(int), pairs["b_id"].astype(int)))
    n = m.shape[0]
    for i in range(5):  # planted dup of vector i is vector n-5+i
        assert (i, n - 5 + i) in got, f"missing planted near-dup pair ({i}, {n-5+i})"


def test_ann_ivf_recall(emb_dir):
    """IVF with 4-of-16 cell probing must keep recall@5 high on the
    clustered fixture (same bar as LSH)."""
    from longqc_ray.pipelines.similarity import ann_ivf, ann_topk

    path, _ = emb_dir
    exact = ann_topk(path)
    approx = ann_ivf(path)
    hits = tot = 0
    for q, grp in exact.groupby("query_id"):
        truth = set(grp["neighbor_id"])
        got = set(approx[approx["query_id"] == q]["neighbor_id"])
        hits += len(truth & got)
        tot += len(truth)
    assert hits / tot >= 0.9, f"IVF recall {hits}/{tot}"


def test_ivf_kmeans_deterministic(emb_dir):
    from longqc_ray.pipelines.similarity import _kmeans_cosine

    path, m = emb_dir
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    c1 = _kmeans_cosine(mn, 16)
    c2 = _kmeans_cosine(mn.copy(), 16)
    assert np.array_equal(c1, c2)


def test_embedding_clusters_align_with_planted(emb_dir):
    """k-means clusters must be pure w.r.t. the planted gaussian
    clusters (each k-means cell dominated by one true label)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from longqc_ray.pipelines.similarity import embedding_clusters

    path, _ = emb_dir
    got = embedding_clusters(path)
    labels = pq.read_table(f"{path}/embeddings.parquet").to_pandas()[["vec_id", "label"]]
    df = got.merge(labels, on="vec_id")
    purity = (
        df.groupby("cluster")["label"]
        .agg(lambda s: s.value_counts().iloc[0] / len(s))
        .min()
    )
    assert purity >= 0.9, f"min cluster purity {purity}"
    # determinism
    again = embedding_clusters(path)
    assert got["cluster"].tolist() == again["cluster"].tolist()


def test_ann_pruned_layout_matches_stream_and_prunes_io(emb_dir):
    """Round-3 pin: the bucket/cell-partitioned layouts return exactly
    the streaming variants' rows, and the pruned read touches only the
    probed partitions (I/O proportional to probe count, not corpus)."""
    import glob
    import os

    import pandas as pd

    from longqc_ray.pipelines import similarity as sim

    path, _ = emb_dir

    def canon(df):
        return df.sort_values(["query_id", "rank"], kind="stable").reset_index(drop=True)

    for fn in (sim.ann_lsh, sim.ann_ivf):
        pruned = canon(fn(path, layout="pruned"))
        stream = canon(fn(path, layout="stream"))
        pd.testing.assert_frame_equal(pruned, stream)

    # I/O pruning evidence on the LSH layout: probed partitions ⊊ all
    q_ids, q_mat = sim._query_matrix(path, sim.N_QUERIES)
    planes = sim._hyperplanes(q_mat.shape[1])
    probe = set(sim._probe_buckets(sim._bucket_of(q_mat, planes), 2))
    root = sim._lsh_layout(path, q_mat.shape[1])
    all_parts = {p for p in os.listdir(root) if p.startswith("bucket=")}
    probed_existing = {f"bucket={b}" for b in probe} & all_parts
    assert probed_existing, "probe set must hit some partitions"
    cand = sim._read_partitions(root, "bucket", sorted(probe))
    touched = {os.path.basename(os.path.dirname(f)) for f in cand.input_files()}
    assert touched == probed_existing
    # the probe covers ≤ (1 + 8 + 28)/256 of bucket space per query; on
    # this corpus some buckets must exist outside the probe set
    assert len(all_parts - touched) > 0
